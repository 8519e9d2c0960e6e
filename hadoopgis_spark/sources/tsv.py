"""Tab-separated spatial datasets — the reference's native format.

Reference records are TSV lines with a 1-based geometry field index
(``-i/--shpidx``, ``/root/reference/src/progparams/resque_params_2d.hpp:313-329``);
non-geometry fields are opaque strings carried through
(``resque_datastructs_2d.hpp:97``). ``read_tsv`` maps that model onto a
DataFrame: ``f1..fn`` string columns with the geometry column renamed to
``geom`` — schema-on-read, no inference surprises, splittable scans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["read_tsv", "write_tsv"]


def read_tsv(
    spark: SparkSession,
    path: str,
    geom_idx: int | None = None,
    n_fields: int | None = None,
    schema: T.StructType | None = None,
) -> DataFrame:
    """Read a reference-style TSV dataset.

    ``geom_idx`` is the 1-based geometry field index (the reference's
    ``-i``); that column is aliased ``geom``. Without ``schema`` or
    ``n_fields`` the width is sniffed from one line (all columns string,
    exactly like the reference's untyped model).
    """
    if schema is not None:
        df = spark.read.option("sep", "\t").schema(schema).csv(path)
    else:
        if n_fields is None:
            first = spark.read.text(path).limit(1).collect()
            if not first:
                raise ValueError(f"empty TSV dataset: {path}")
            n_fields = len(first[0].value.split("\t"))
        fields = [T.StructField(f"f{i}", T.StringType()) for i in range(1, n_fields + 1)]
        df = spark.read.option("sep", "\t").schema(T.StructType(fields)).csv(path)
    if geom_idx is not None:
        cols = df.columns
        if not (1 <= geom_idx <= len(cols)):
            raise ValueError(f"geom_idx {geom_idx} out of range 1..{len(cols)}")
        df = df.withColumnRenamed(cols[geom_idx - 1], "geom")
    return df


def write_tsv(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Write reference-compatible TSV (strings, tab separator)."""
    out = df.select([F.col(c).cast("string").alias(c) for c in df.columns])
    out.write.option("sep", "\t").mode(mode).csv(path)
