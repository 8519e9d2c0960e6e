"""JSONL (newline-delimited JSON) source/sink.

The reference ingests TSV text lines (S1); a training-data pipeline's
wire format is JSONL — one JSON document per line, malformed lines
expected and skipped (the S1 skip semantics, ``manipulate_2d.cpp:182-189``,
applied to JSON). Spark's native json reader handles both sides:

* ``read_jsonl`` — schema optional (inference costs an extra pass at
  scale: always pass one on real data); ``drop_malformed=True`` maps to
  DROPMALFORMED mode so broken lines vanish instead of nulling out.
* ``write_jsonl`` — one JSON object per line via the native writer
  (whole-stage codegen ``to_json``; splittable output, one file per
  partition).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

__all__ = ["read_jsonl", "write_jsonl"]


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: str | None = None,
    drop_malformed: bool = True,
) -> DataFrame:
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    mode = "DROPMALFORMED" if drop_malformed else "PERMISSIVE"
    return reader.option("mode", mode).json(path)


def write_jsonl(df: DataFrame, path: str, n_files: int | None = None) -> None:
    if n_files is not None:
        df = df.repartition(n_files)
    df.write.mode("overwrite").json(path)
