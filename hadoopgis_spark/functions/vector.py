"""Vector (embedding) column functions — pure Column expressions.

Embedding columns are ``array<float>`` (TESTDATA ``embeddings.embedding``).
All math is done in double precision via ``F.aggregate``/``F.zip_with``
so results match a SQL oracle computing in doubles.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["dot", "norm", "cosine", "cosine_from", "l2_distance"]


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


def cosine_from(dot_col, norm_a, norm_b) -> Column:
    """Cosine from a precomputed dot and per-side norms — identical
    arithmetic to :func:`cosine` (``den = norm_a * norm_b``, 0 when the
    denominator is 0), but the norms arrive as plain column references.

    Use this in candidate-rank stages: the folds behind :func:`norm`
    are higher-order functions (CodegenFallback — no codegen CSE, see
    CLAUDE.md), so ``cosine`` re-evaluates BOTH norms per candidate
    PAIR; precomputing them once per row on each side before the join
    makes the per-pair work a single dot."""
    den = norm_a * norm_b
    return F.when(den > 0, dot_col / den).otherwise(F.lit(0.0))


def l2_distance(a, b) -> Column:
    return F.sqrt(
        F.aggregate(
            F.zip_with(_d(a), _d(b), lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
