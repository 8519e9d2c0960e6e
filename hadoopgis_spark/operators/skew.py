"""Skew-proof equi-join via deterministic key salting.

AQE's skew-join handling splits oversized SHUFFLE partitions at
runtime, but it cannot help when a single JOIN KEY's rows exceed one
task (a hot customer, a null-ish default key, a celebrity node): every
row of that key still hashes to one reducer. The classic fix is
salting — split each left key's rows across ``n_salt`` sub-keys and
replicate the right side's matching rows once per sub-key, so the hot
key becomes ``n_salt`` independently-schedulable tasks.

Correctness is exact: each left row carries ONE salt value, each right
row is present under EVERY salt value, so every (left, right) key match
pairs up exactly once — the result is the same multiset as the plain
join. Cost: the right side shuffles ``n_salt``× its size — use the
SMALLER side as ``right`` and keep ``n_salt`` to the hot key's actual
split factor.

The salt is md5-derived from a caller-named uniformly-distributed
column (cross-engine deterministic, like every hash in this engine) —
NOT ``rand()``, so retried tasks and re-runs salt identically and the
operator composes with the oracle harness.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hadoopgis_spark.functions.text import md5_hash32

__all__ = ["salted_join"]


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    *,
    salt_col: str,
    n_salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``left`` ⋈ ``right`` on ``on`` with the left side
    salted by ``pmod(md5(salt_col), n_salt)`` and the right side
    replicated across all ``n_salt`` salt values.

    ``salt_col`` must be a left-side column whose values spread rows of
    the SAME join key across salts (a row id / event id — uniformity
    affects balance only, never correctness). ``how`` supports the
    outer shapes where salting is sound: ``inner`` and ``left`` (each
    left row exists under exactly one salt, so left-outer semantics are
    preserved; right-outer would see each unmatched right row n_salt
    times and is refused).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, not {how!r}")
    keys = [on] if isinstance(on, str) else list(on)
    overlap = set(left.columns) & set(right.columns) - set(keys)
    if overlap:
        raise ValueError(
            f"ambiguous non-key columns {sorted(overlap)} — rename before joining")
    # coalesce: md5(NULL) is NULL and a NULL salt would silently unmatch
    # rows whose JOIN KEY is valid but whose salt_col is NULL — they all
    # land in salt 0 instead (balance cost only, never correctness)
    salt = F.coalesce(
        F.pmod(md5_hash32(F.col(salt_col).cast("string")), F.lit(n_salt)),
        F.lit(0),
    )
    l = left.withColumn("__salt", salt)
    r = right.withColumn("__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1))))
    out = l.join(r, keys + ["__salt"], how)
    return out.drop("__salt")
