"""The 7 tile-partitioning algorithms.

Each mirrors the splitting strategy (not the code) of the corresponding
reference binary under ``/root/reference/src/partitionalgo/``:

* ``fg``  — fixed grid (``fg/fg_2d.cpp:29-84``)
* ``bsp`` — binary space partition, median split on the wider dimension
  (``bsp/BinarySplitNode.hpp:42-229``); the reference default
  (``progparams/queryprocessor_params_2d.hpp:9-10``)
* ``qt``  — quadtree, equal quadrants (``qt/QuadtreeNode.hpp:46-133``)
* ``str`` — sort-tile-recursive packing (``str/str_2d.cpp:139-189``)
* ``hc``  — Hilbert-curve sort + chunk (``sfc/hc_2d.cpp:10-57,111-225``)
* ``slc`` — single-dimension strips (``slc/slc_2d.cpp:12-116``)
* ``bos`` — boundary-optimized strips: split the dimension with fewer
  straddlers at each cut (``bos/bos_2d.cpp:101-104,192-229``)

Inputs are MBB arrays ``[xmin, ymin, xmax, ymax]`` (float64). All
functions are deterministic.
"""

from __future__ import annotations

import math

import numpy as np

__all__ = [
    "fit_fg",
    "fit_bsp",
    "fit_qt",
    "fit_str",
    "fit_hc",
    "fit_slc",
    "fit_bos",
    "ALGORITHMS",
    "SPACE_PARTITIONERS",
    "MBR_PARTITIONERS",
    "partition_tiles",
    "partition_tiles_two_level",
]

INF = float("inf")


def _extent(mbbs: np.ndarray) -> tuple[float, float, float, float]:
    return (
        float(mbbs[:, 0].min()),
        float(mbbs[:, 1].min()),
        float(mbbs[:, 2].max()),
        float(mbbs[:, 3].max()),
    )


def _centers(mbbs: np.ndarray) -> np.ndarray:
    return np.column_stack(((mbbs[:, 0] + mbbs[:, 2]) / 2.0, (mbbs[:, 1] + mbbs[:, 3]) / 2.0))


# ---------------------------------------------------------------------------
# fg — fixed grid
# ---------------------------------------------------------------------------

def fit_fg(mbbs: np.ndarray, bucket_size: int) -> np.ndarray:
    """Fixed grid aiming at near-square tiles of ~bucket_size objects
    (reference split calculation ``fg_2d.cpp:52-66``)."""
    n = len(mbbs)
    x0, y0, x1, y1 = _extent(mbbs)
    n_tiles = max(1, math.ceil(n / max(1, bucket_size)))
    w = max(x1 - x0, 1e-12)
    h = max(y1 - y0, 1e-12)
    nx = max(1, round(math.sqrt(n_tiles * w / h)))
    ny = max(1, math.ceil(n_tiles / nx))
    xs = np.linspace(x0, x1, nx + 1)
    ys = np.linspace(y0, y1, ny + 1)
    tiles = [
        (xs[i], ys[j], xs[i + 1], ys[j + 1])
        for j in range(ny)
        for i in range(nx)
    ]
    return np.asarray(tiles, dtype=np.float64)


def fg_grid_params(extent: tuple[float, float, float, float], n: int, bucket_size: int):
    """Grid shape for the arithmetic (zero-UDF) fg tile-id fast path."""
    x0, y0, x1, y1 = extent
    n_tiles = max(1, math.ceil(n / max(1, bucket_size)))
    w = max(x1 - x0, 1e-12)
    h = max(y1 - y0, 1e-12)
    nx = max(1, round(math.sqrt(n_tiles * w / h)))
    ny = max(1, math.ceil(n_tiles / nx))
    return nx, ny


# ---------------------------------------------------------------------------
# bsp — binary space partition (reference default)
# ---------------------------------------------------------------------------

def fit_bsp(mbbs: np.ndarray, bucket_size: int, max_depth: int = 40) -> np.ndarray:
    """Recursive median split by object centers on the wider dimension
    (axis choice ``BinarySplitNode.hpp:139-148``, median ``:66-131``).
    Stops when a node holds ≤ bucket_size objects or the split stops
    separating (``:194-201``)."""
    centers = _centers(mbbs)
    x0, y0, x1, y1 = _extent(mbbs)
    out: list[tuple[float, float, float, float]] = []

    def split(idx: np.ndarray, bx0, by0, bx1, by1, depth: int):
        if len(idx) <= bucket_size or depth >= max_depth:
            out.append((bx0, by0, bx1, by1))
            return
        axis = 0 if (bx1 - bx0) >= (by1 - by0) else 1
        vals = centers[idx, axis]
        cut = float(np.median(vals))
        left = idx[vals <= cut]
        right = idx[vals > cut]
        if len(left) == 0 or len(right) == 0:
            out.append((bx0, by0, bx1, by1))
            return
        if axis == 0:
            split(left, bx0, by0, cut, by1, depth + 1)
            split(right, cut, by0, bx1, by1, depth + 1)
        else:
            split(left, bx0, by0, bx1, cut, depth + 1)
            split(right, bx0, cut, bx1, by1, depth + 1)

    split(np.arange(len(mbbs)), x0, y0, x1, y1, 0)
    return np.asarray(out, dtype=np.float64)


# ---------------------------------------------------------------------------
# qt — quadtree
# ---------------------------------------------------------------------------

def fit_qt(mbbs: np.ndarray, bucket_size: int, max_depth: int = 24) -> np.ndarray:
    """Split a node into 4 equal quadrants while it holds > bucket_size
    objects; objects are multicast to every intersecting child exactly as
    the reference does (``QuadtreeNode.hpp:46-133``), with its
    unproductive-split stop (total ≥ 4·(size−1))."""
    x0, y0, x1, y1 = _extent(mbbs)
    out: list[tuple[float, float, float, float]] = []

    def split(idx: np.ndarray, bx0, by0, bx1, by1, depth: int):
        if len(idx) <= bucket_size or depth >= max_depth:
            out.append((bx0, by0, bx1, by1))
            return
        mx, my = (bx0 + bx1) / 2.0, (by0 + by1) / 2.0
        quads = [
            (bx0, by0, mx, my),
            (mx, by0, bx1, my),
            (bx0, my, mx, by1),
            (mx, my, bx1, by1),
        ]
        child_idx = []
        total = 0
        m = mbbs[idx]
        for qx0, qy0, qx1, qy1 in quads:
            mask = (m[:, 0] <= qx1) & (m[:, 2] >= qx0) & (m[:, 1] <= qy1) & (m[:, 3] >= qy0)
            child_idx.append(idx[mask])
            total += int(mask.sum())
        if total >= 4 * max(1, len(idx) - 1):  # split not separating
            out.append((bx0, by0, bx1, by1))
            return
        for (qx0, qy0, qx1, qy1), ci in zip(quads, child_idx):
            if len(ci) == 0:
                out.append((qx0, qy0, qx1, qy1))
            else:
                split(ci, qx0, qy0, qx1, qy1, depth + 1)

    split(np.arange(len(mbbs)), x0, y0, x1, y1, 0)
    return np.asarray(out, dtype=np.float64)


# ---------------------------------------------------------------------------
# str — sort-tile-recursive
# ---------------------------------------------------------------------------

def fit_str(mbbs: np.ndarray, bucket_size: int) -> np.ndarray:
    """STR bulk-load packing: sort by center-x, slice into √(n/b) vertical
    slabs, sort each slab by center-y, cut runs of bucket_size; tile = MBR
    of the run (reference builds an R*-tree with LeafCapacity=bucket and
    emits leaf MBRs, ``str_2d.cpp:139-189``)."""
    n = len(mbbs)
    b = max(1, bucket_size)
    n_leaves = max(1, math.ceil(n / b))
    n_slabs = max(1, math.ceil(math.sqrt(n_leaves)))
    per_slab = math.ceil(n / n_slabs)
    c = _centers(mbbs)
    order_x = np.argsort(c[:, 0], kind="stable")
    tiles = []
    for s in range(n_slabs):
        slab = order_x[s * per_slab : (s + 1) * per_slab]
        if len(slab) == 0:
            continue
        slab = slab[np.argsort(c[slab, 1], kind="stable")]
        for k in range(0, len(slab), b):
            run = slab[k : k + b]
            m = mbbs[run]
            tiles.append((m[:, 0].min(), m[:, 1].min(), m[:, 2].max(), m[:, 3].max()))
    return np.asarray(tiles, dtype=np.float64)


# ---------------------------------------------------------------------------
# hc — Hilbert curve
# ---------------------------------------------------------------------------

def _hilbert_d(order: int, x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Vectorized xy→d Hilbert index (standard public algorithm)."""
    rx = np.zeros_like(x)
    ry = np.zeros_like(y)
    d = np.zeros_like(x, dtype=np.int64)
    x = x.copy()
    y = y.copy()
    s = order // 2
    while s > 0:
        rx = ((x & s) > 0).astype(np.int64)
        ry = ((y & s) > 0).astype(np.int64)
        d += s * s * ((3 * rx) ^ ry)
        # rotate
        swap = ry == 0
        flip = swap & (rx == 1)
        x_f = x.copy()
        x[flip] = s - 1 - x[flip]
        y[flip] = s - 1 - y[flip]
        xs = x.copy()
        x[swap] = y[swap]
        y[swap] = xs[swap]
        s //= 2
    return d


def fit_hc(mbbs: np.ndarray, bucket_size: int, precision_bits: int = 10) -> np.ndarray:
    """Normalize centers to a 2^p grid, sort by Hilbert value, cut runs of
    bucket_size, tile = run MBR (``hc_2d.cpp:111-225``; the reference uses
    2^20 cells total ≈ 2^10 per axis, ``hc_2d.cpp:238-242``)."""
    x0, y0, x1, y1 = _extent(mbbs)
    side = 1 << precision_bits
    c = _centers(mbbs)
    gx = np.clip(((c[:, 0] - x0) / max(x1 - x0, 1e-12) * (side - 1)).astype(np.int64), 0, side - 1)
    gy = np.clip(((c[:, 1] - y0) / max(y1 - y0, 1e-12) * (side - 1)).astype(np.int64), 0, side - 1)
    d = _hilbert_d(side, gx, gy)
    order = np.argsort(d, kind="stable")
    b = max(1, bucket_size)
    tiles = []
    for k in range(0, len(order), b):
        run = order[k : k + b]
        m = mbbs[run]
        tiles.append((m[:, 0].min(), m[:, 1].min(), m[:, 2].max(), m[:, 3].max()))
    return np.asarray(tiles, dtype=np.float64)


# ---------------------------------------------------------------------------
# slc — single-orientation strips
# ---------------------------------------------------------------------------

def fit_slc(mbbs: np.ndarray, bucket_size: int, orientation: int = 0) -> np.ndarray:
    """Sweep one fixed dimension, cut a strip every bucket_size objects
    (``slc_2d.cpp:12-116``). Strip boundary = midpoint between adjacent
    centers; full data extent in the other dimension."""
    x0, y0, x1, y1 = _extent(mbbs)
    c = _centers(mbbs)[:, orientation]
    order = np.argsort(c, kind="stable")
    b = max(1, bucket_size)
    cuts = []
    lo = x0 if orientation == 0 else y0
    hi = x1 if orientation == 0 else y1
    bounds = [lo]
    for k in range(b, len(order), b):
        prev_c = c[order[k - 1]]
        cur_c = c[order[k]]
        bounds.append((prev_c + cur_c) / 2.0)
    bounds.append(hi)
    tiles = []
    for i in range(len(bounds) - 1):
        if orientation == 0:
            tiles.append((bounds[i], y0, bounds[i + 1], y1))
        else:
            tiles.append((x0, bounds[i], x1, bounds[i + 1]))
    return np.asarray(tiles, dtype=np.float64)


# ---------------------------------------------------------------------------
# bos — boundary-optimized strips
# ---------------------------------------------------------------------------

def fit_bos(mbbs: np.ndarray, bucket_size: int) -> np.ndarray:
    """Greedy strip splitting choosing, at each cut, the dimension whose
    candidate split line straddles fewer objects (cost functions
    ``bos_2d.cpp:192-229``, choice ``:101-104``). Recursive slab version:
    each split peels one bucket off the cheaper dimension."""
    b = max(1, bucket_size)
    out: list[tuple[float, float, float, float]] = []

    def peel(idx: np.ndarray, bx0, by0, bx1, by1):
        while True:
            if len(idx) <= b:
                out.append((bx0, by0, bx1, by1))
                return
            m = mbbs[idx]
            cx = (m[:, 0] + m[:, 2]) / 2.0
            cy = (m[:, 1] + m[:, 3]) / 2.0
            ox = np.argsort(cx, kind="stable")
            oy = np.argsort(cy, kind="stable")
            # candidate cut after the first bucket in each dimension
            cut_x = (cx[ox[b - 1]] + cx[ox[min(b, len(ox) - 1)]]) / 2.0
            cut_y = (cy[oy[b - 1]] + cy[oy[min(b, len(oy) - 1)]]) / 2.0
            cost_x = int(((m[:, 0] < cut_x) & (m[:, 2] > cut_x)).sum())
            cost_y = int(((m[:, 1] < cut_y) & (m[:, 3] > cut_y)).sum())
            # if no center survives the cut (duplicate-center data can put
            # every center at/below the cut line), emit the WHOLE remaining
            # slab instead of the cut tile — otherwise the region beyond the
            # cut is covered by no tile and refpoint-dedup joins silently
            # drop pairs whose refpoint lands there
            if cost_x <= cost_y:
                keep = cx > cut_x
                if not keep.any():
                    out.append((bx0, by0, bx1, by1))
                    return
                out.append((bx0, by0, cut_x, by1))
                bx0 = cut_x
            else:
                keep = cy > cut_y
                if not keep.any():
                    out.append((bx0, by0, bx1, by1))
                    return
                out.append((bx0, by0, bx1, cut_y))
                by0 = cut_y
            idx = idx[keep]

    x0, y0, x1, y1 = _extent(mbbs)
    peel(np.arange(len(mbbs)), x0, y0, x1, y1)
    return np.asarray(out, dtype=np.float64)


ALGORITHMS = {
    "fg": fit_fg,
    "bsp": fit_bsp,
    "qt": fit_qt,
    "str": fit_str,
    "hc": fit_hc,
    "slc": fit_slc,
    "bos": fit_bos,
}

# Tiles disjointly cover the extent → joins can use reference-point dedup.
SPACE_PARTITIONERS = {"fg", "bsp", "qt", "slc", "bos"}
# Tiles are data MBRs (may overlap / leave gaps) → joins use distinct dedup.
MBR_PARTITIONERS = {"str", "hc"}


def expand_to_cover(tiles: np.ndarray, extent) -> np.ndarray:
    """Extend tiles flush with the extent boundary out to ±inf so the tile
    set covers the whole plane (objects outside the sampled extent still
    land in a tile — at 100 TB the sample never sees the true extent)."""
    x0, y0, x1, y1 = extent
    t = tiles.copy()
    eps = 1e-9 * max(1.0, abs(x1 - x0), abs(y1 - y0))
    t[np.abs(t[:, 0] - x0) <= eps, 0] = -INF
    t[np.abs(t[:, 1] - y0) <= eps, 1] = -INF
    t[np.abs(t[:, 2] - x1) <= eps, 2] = INF
    t[np.abs(t[:, 3] - y1) <= eps, 3] = INF
    return t


def partition_tiles_two_level(
    mbbs: np.ndarray,
    bucket_size: int,
    algorithm: str = "bsp",
    fine_algorithm: str | None = None,
    rough_factor: int = 16,
    prefix: str | None = None,
    cover_plane: bool = False,
) -> list[tuple[str, float, float, float, float]]:
    """Two-step ("para") partitioning: a coarse pass with
    ``rough_bucket = n/rough_factor`` then a per-coarse-tile fine pass,
    composite tile ids by concatenation — the reference's
    ``--parapartition`` (``query_spjoin.hpp:175-230``; composite ids
    ``fg_2d.cpp:104,122``). Keeps the driver O(sample) while letting the
    coarse pass soak global skew and the fine pass balance locally."""
    if algorithm not in SPACE_PARTITIONERS:
        raise ValueError("two-level partitioning needs a space partitioner for the coarse pass")
    fine_algorithm = fine_algorithm or algorithm
    mbbs = np.asarray(mbbs, dtype=np.float64)
    if len(mbbs) == 0:
        return []
    rough_bucket = max(bucket_size, math.ceil(len(mbbs) / max(1, rough_factor)))
    coarse = ALGORITHMS[algorithm](mbbs, rough_bucket)
    if cover_plane:
        coarse = expand_to_cover(coarse, _extent(mbbs))
    cx = (mbbs[:, 0] + mbbs[:, 2]) / 2.0
    cy = (mbbs[:, 1] + mbbs[:, 3]) / 2.0
    p = prefix or algorithm.upper()
    out: list[tuple[str, float, float, float, float]] = []
    assigned = np.full(len(mbbs), -1, dtype=np.int64)
    for ci, (tx0, ty0, tx1, ty1) in enumerate(coarse):
        mask = (assigned < 0) & (cx >= tx0) & (cx <= tx1) & (cy >= ty0) & (cy <= ty1)
        assigned[mask] = ci
    for ci, (tx0, ty0, tx1, ty1) in enumerate(coarse):
        members = mbbs[assigned == ci]
        if len(members) <= bucket_size:
            out.append((f"{p}{ci}_0", float(tx0), float(ty0), float(tx1), float(ty1)))
            continue
        fine = ALGORITHMS[fine_algorithm](members, bucket_size)
        if fine_algorithm in SPACE_PARTITIONERS:
            # fine tiles cover the member extent; re-anchor to the coarse
            # tile bounds so the union still covers the coarse tile
            fe = _extent(members)
            eps = 1e-9 * max(1.0, abs(fe[2] - fe[0]), abs(fe[3] - fe[1]))
            fine = fine.copy()
            fine[np.abs(fine[:, 0] - fe[0]) <= eps, 0] = tx0
            fine[np.abs(fine[:, 1] - fe[1]) <= eps, 1] = ty0
            fine[np.abs(fine[:, 2] - fe[2]) <= eps, 2] = tx1
            fine[np.abs(fine[:, 3] - fe[3]) <= eps, 3] = ty1
        for fi, t in enumerate(fine):
            out.append((f"{p}{ci}_{fi}", float(t[0]), float(t[1]), float(t[2]), float(t[3])))
    return out


def partition_tiles(
    mbbs: np.ndarray,
    bucket_size: int,
    algorithm: str = "bsp",
    prefix: str | None = None,
    cover_plane: bool = False,
) -> list[tuple[str, float, float, float, float]]:
    """Run a partitioner and return ``(tile_id, xmin, ymin, xmax, ymax)``
    rows shaped like the reference's ``partition.idx``
    (``query_partition.hpp:271-278``; id prefixes like ``fg_2d.cpp:72-80``)."""
    if algorithm not in ALGORITHMS:
        raise ValueError(f"unknown partitioner {algorithm!r}; choose from {sorted(ALGORITHMS)}")
    mbbs = np.asarray(mbbs, dtype=np.float64)
    if mbbs.ndim != 2 or mbbs.shape[1] != 4:
        raise ValueError("mbbs must be an (N, 4) array of [xmin, ymin, xmax, ymax]")
    if len(mbbs) == 0:
        return []
    tiles = ALGORITHMS[algorithm](mbbs, bucket_size)
    if cover_plane and algorithm in SPACE_PARTITIONERS:
        tiles = expand_to_cover(tiles, _extent(mbbs))
    p = (prefix or algorithm.upper())
    return [
        (f"{p}{i}", float(t[0]), float(t[1]), float(t[2]), float(t[3]))
        for i, t in enumerate(tiles)
    ]
