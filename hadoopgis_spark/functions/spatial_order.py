"""Space-filling-curve ordering as pure Column expressions (O3).

The reference sorts objects by the Hilbert value of their MBB center
inside the hc partitioner (``/root/reference/src/partitionalgo/sfc/
hc_2d.cpp:10-57``, single reducer). Here the same curve is a JVM column
expression, which unlocks the *distributed* uses the reference never
had: ``repartitionByRange(hilbert)`` + ``sortWithinPartitions`` lays
100 TB of spatial data out so that range scans and spatial joins touch
few files (z-order-style clustering, free row-group pruning via the
correlated xmin/ymin stats).

The bit-interleave/rotate loop is statically unrolled over ``bits``
iterations of integer column ops — whole-stage codegen, no UDF.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["hilbert_index", "cluster_spatially", "zorder_index"]


def _c(v) -> Column:
    return v if isinstance(v, Column) else F.col(v) if isinstance(v, str) else F.lit(v)


def hilbert_index(
    x,
    y,
    extent: tuple[float, float, float, float],
    bits: int = 10,
) -> Column:
    """Hilbert curve index of point (x, y) on a 2^bits × 2^bits grid over
    ``extent`` (standard public xy→d algorithm, statically unrolled).

    The reference's precision is 2^20 total cells ≈ 2^10 per axis
    (``hc_2d.cpp:238-242``) — the default matches.
    """
    x0, y0, x1, y1 = extent
    side = 1 << bits
    gx = F.least(
        F.lit(side - 1),
        F.greatest(F.lit(0), F.floor((_c(x) - x0) / max(x1 - x0, 1e-300) * side).cast("long")),
    )
    gy = F.least(
        F.lit(side - 1),
        F.greatest(F.lit(0), F.floor((_c(y) - y0) / max(y1 - y0, 1e-300) * side).cast("long")),
    )
    # fold over the shrinking s sequence with a struct accumulator —
    # an unrolled loop would nest each iteration's gx/gy inside the next
    # (exponential expression tree); the fold keeps the plan O(1)
    s_values = []
    s = side // 2
    while s > 0:
        s_values.append(s)
        s //= 2

    def step(acc, s_col):
        ax, ay, ad = acc.getField("gx"), acc.getField("gy"), acc.getField("d")
        one = F.lit(1).cast("long")
        zero = F.lit(0).cast("long")
        rx = F.when(ax.bitwiseAND(s_col) > 0, one).otherwise(zero)
        ry = F.when(ay.bitwiseAND(s_col) > 0, one).otherwise(zero)
        d2 = ad + s_col * s_col * ((F.lit(3).cast("long") * rx).bitwiseXOR(ry))
        flip = (ry == zero) & (rx == one)
        fx = F.when(flip, s_col - 1 - ax).otherwise(ax)
        fy = F.when(flip, s_col - 1 - ay).otherwise(ay)
        swap = ry == zero
        nx = F.when(swap, fy).otherwise(fx)
        ny = F.when(swap, fx).otherwise(fy)
        return F.struct(nx.alias("gx"), ny.alias("gy"), d2.alias("d"))

    init = F.struct(gx.alias("gx"), gy.alias("gy"), F.lit(0).cast("long").alias("d"))
    acc = F.aggregate(
        F.array(*[F.lit(v).cast("long") for v in s_values]),
        init,
        step,
    )
    return acc.getField("d")


def cluster_spatially(
    df: DataFrame,
    extent: tuple[float, float, float, float],
    n_partitions: int | None = None,
    bits: int = 10,
    x_col: str = "xmin",
    y_col: str = "ymin",
) -> DataFrame:
    """Range-partition + sort a dataset along the Hilbert curve of the
    MBB anchor — write the result with ``.write.parquet`` and every
    partition/row-group holds spatially-adjacent objects (min/max stats
    on xmin/ymin then prune window queries for free)."""
    h = hilbert_index(F.col(x_col), F.col(y_col), extent, bits).alias("_hilbert")
    out = df.withColumn("_hilbert", h)
    n = n_partitions or out.sparkSession.conf.get("spark.sql.shuffle.partitions")
    return (
        out.repartitionByRange(int(n), F.col("_hilbert"))
        .sortWithinPartitions("_hilbert")
        .drop("_hilbert")
    )


def zorder_index(cols, bounds, bits: int = 10) -> Column:
    """Morton (Z-order) index of k numeric columns: each value is
    linearly bucketed onto a 2^bits grid over its ``bounds[i] =
    (lo, hi)``, then the k bucket numbers' bits are interleaved.

    The multi-column generalization of :func:`hilbert_index` (which
    keeps marginally better locality but is 2-D-only): clustering a
    table by this index gives EVERY input column correlated per-file
    min/max stats, so a zonemap manifest prunes selective ranges on any
    single column or conjunction — the standard multi-dimensional
    data-skipping layout (Databricks ZORDER, here over plain parquet).

    Pure integer/double Column arithmetic, statically unrolled to
    ``k * bits`` shift-and-mask terms (flat SUM, no nesting — each term
    is independent) — whole-stage codegen, no UDF. ``bits`` is clamped
    so the result fits a signed 64-bit long.
    """
    k = len(cols)
    if k == 0 or len(bounds) != k:
        raise ValueError("cols and bounds must be non-empty and same length")
    bits = min(bits, 62 // k)
    side = 1 << bits
    terms = []
    for i, (c, (lo, hi)) in enumerate(zip(cols, bounds)):
        # bucket in DOUBLE math (ANSI-safe; monotonicity is all we need)
        q = F.least(
            F.lit(side - 1),
            F.greatest(
                F.lit(0),
                F.floor((_c(c) - float(lo)) / max(float(hi) - float(lo), 1e-300) * side).cast("long"),
            ),
        )
        for b in range(bits):
            terms.append(
                F.shiftleft(F.shiftright(q, b).bitwiseAND(F.lit(1)), b * k + i))
    z = terms[0]
    for t in terms[1:]:
        z = z + t
    return z
