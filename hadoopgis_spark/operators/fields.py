"""The reference's ``-f`` output-field grammar (P1).

``resque`` selects and orders output columns with specs like
``1:1,2:3,tileid,area2,jaccard`` — ``<side>:<field>`` picks the n-th
user column of join side 1/2, bare names pick computed stats
(parse: ``/root/reference/src/progparams/resque_params_2d.hpp:70-160``;
emit: ``src/resque/resque_2d.cpp:52-123,438-490``).

``select_fields`` applies the same grammar to a ``spatial_join`` result,
so reference invocations translate 1:1::

    j = spatial_join(a, b, "st_intersects", stats=["area2", "jaccard"])
    out = select_fields(j, "1:1,2:3,area2,jaccard", a.columns, b.columns)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hadoopgis_spark.operators.spatial_join import STAT_FIELDS

__all__ = ["select_fields"]


def select_fields(
    joined: DataFrame,
    spec: str,
    a_columns: list[str],
    b_columns: list[str],
    suffixes: tuple[str, str] = ("_1", "_2"),
) -> DataFrame:
    """Project a join result with a reference ``-f`` spec."""
    sfx = {1: suffixes[0], 2: suffixes[1]}
    side_cols = {1: a_columns, 2: b_columns}
    out = []
    for raw in spec.split(","):
        item = raw.strip()
        if not item:
            continue
        if ":" in item:
            side_s, idx_s = item.split(":", 1)
            try:
                side, idx = int(side_s), int(idx_s)
            except ValueError:
                raise ValueError(f"bad field spec {item!r} (want side:index)") from None
            if side not in (1, 2):
                raise ValueError(f"join side must be 1 or 2 in {item!r}")
            cols = side_cols[side]
            if not (1 <= idx <= len(cols)):
                raise ValueError(f"field index {idx} out of range 1..{len(cols)} in {item!r}")
            name = f"{cols[idx - 1]}{sfx[side]}"
            out.append(F.col(name).alias(f"{side}_{idx}"))
        elif item == "tileid":
            out.append(F.col("tile_id").alias("tileid"))
        elif item in STAT_FIELDS:
            out.append(F.col(item))
        else:
            raise ValueError(
                f"unknown output field {item!r}; want side:index, tileid, or one of {STAT_FIELDS}"
            )
    if not out:
        raise ValueError("empty field spec")
    return joined.select(*out)
