"""Vector (embedding) column functions — pure Column expressions.

Embedding columns are ``array<float>`` (TESTDATA ``embeddings.embedding``).
All math is done in double precision via ``F.aggregate``/``F.zip_with``
so results match a SQL oracle computing in doubles.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["dot", "norm", "cosine", "l2_distance"]


def _c(v) -> Column:
    return v if isinstance(v, Column) else F.col(v)


def _d(v) -> Column:
    return _c(v).cast("array<double>")


def dot(a, b) -> Column:
    return F.aggregate(
        F.zip_with(_d(a), _d(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a, b) -> Column:
    den = norm(a) * norm(b)
    return F.when(den > 0, dot(a, b) / den).otherwise(F.lit(0.0))


def l2_distance(a, b) -> Column:
    return F.sqrt(
        F.aggregate(
            F.zip_with(_d(a), _d(b), lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
