"""Partitioner property tests (no Spark).

Invariants derived from the reference's partitioner contract
(/root/reference/src/partitionalgo/*): tiles from space partitioners
cover the data extent disjointly; every object center falls in ≥1 tile;
per-tile counts stay near bucket_size; output is deterministic.
"""

import numpy as np
import pytest

from hadoopgis_spark.partition import (
    ALGORITHMS,
    SPACE_PARTITIONERS,
    partition_tiles,
)
from hadoopgis_spark.partition.algos import expand_to_cover


def make_mbbs(n=2000, seed=42, extent=1000.0, size=10.0, skew=False):
    rng = np.random.default_rng(seed)
    if skew:
        # 80% of objects clustered in 5% of the space — the scenario the
        # partitioner zoo exists for
        n_hot = int(n * 0.8)
        cx = np.concatenate([
            rng.uniform(0, extent * 0.05, n_hot),
            rng.uniform(0, extent, n - n_hot),
        ])
        cy = np.concatenate([
            rng.uniform(0, extent * 0.05, n_hot),
            rng.uniform(0, extent, n - n_hot),
        ])
    else:
        cx = rng.uniform(0, extent, n)
        cy = rng.uniform(0, extent, n)
    w = rng.uniform(0.1, size, n)
    h = rng.uniform(0.1, size, n)
    return np.column_stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2])


@pytest.mark.parametrize("algo", sorted(ALGORITHMS))
@pytest.mark.parametrize("skew", [False, True])
def test_every_center_lands_in_a_tile(algo, skew):
    mbbs = make_mbbs(skew=skew)
    tiles = partition_tiles(mbbs, bucket_size=100, algorithm=algo)
    assert len(tiles) >= 1
    t = np.asarray([r[1:] for r in tiles])
    cx = (mbbs[:, 0] + mbbs[:, 2]) / 2
    cy = (mbbs[:, 1] + mbbs[:, 3]) / 2
    inside = (
        (cx[:, None] >= t[None, :, 0])
        & (cx[:, None] <= t[None, :, 2])
        & (cy[:, None] >= t[None, :, 1])
        & (cy[:, None] <= t[None, :, 3])
    )
    misses = int((~inside.any(axis=1)).sum())
    if algo in SPACE_PARTITIONERS:
        assert misses == 0, f"{algo}: {misses} centers in no tile"
    else:
        # MBR tiles are built from the objects themselves: every center
        # must still hit at least one tile here (sampling effects only
        # appear when fitting on a subset)
        assert misses == 0


@pytest.mark.parametrize("algo", sorted(SPACE_PARTITIONERS))
def test_space_partition_is_disjoint(algo):
    mbbs = make_mbbs(n=1000)
    tiles = partition_tiles(mbbs, bucket_size=100, algorithm=algo)
    t = np.asarray([r[1:] for r in tiles])
    # random probe points: strictly-interior membership must be unique
    rng = np.random.default_rng(0)
    px = rng.uniform(mbbs[:, 0].min(), mbbs[:, 2].max(), 500)
    py = rng.uniform(mbbs[:, 1].min(), mbbs[:, 3].max(), 500)
    strictly_in = (
        (px[:, None] > t[None, :, 0])
        & (px[:, None] < t[None, :, 2])
        & (py[:, None] > t[None, :, 1])
        & (py[:, None] < t[None, :, 3])
    )
    counts = strictly_in.sum(axis=1)
    assert (counts <= 1).all(), f"{algo}: overlapping tiles"


@pytest.mark.parametrize("algo", sorted(ALGORITHMS))
def test_bucket_bound_roughly_respected(algo):
    mbbs = make_mbbs(n=3000)
    bucket = 150
    tiles = partition_tiles(mbbs, bucket_size=bucket, algorithm=algo)
    t = np.asarray([r[1:] for r in tiles])
    cx = (mbbs[:, 0] + mbbs[:, 2]) / 2
    cy = (mbbs[:, 1] + mbbs[:, 3]) / 2
    # assign each center to first containing tile; count per tile
    inside = (
        (cx[:, None] >= t[None, :, 0])
        & (cx[:, None] <= t[None, :, 2])
        & (cy[:, None] >= t[None, :, 1])
        & (cy[:, None] <= t[None, :, 3])
    )
    first = inside.argmax(axis=1)
    counts = np.bincount(first[inside.any(axis=1)], minlength=len(t))
    # fg sizes tiles for the average; skewless uniform data should stay
    # within a small factor of bucket
    assert counts.max() <= bucket * 4, f"{algo}: max tile {counts.max()}"


@pytest.mark.parametrize("algo", sorted(ALGORITHMS))
def test_deterministic(algo):
    mbbs = make_mbbs(n=500, seed=7)
    a = partition_tiles(mbbs, bucket_size=64, algorithm=algo)
    b = partition_tiles(mbbs, bucket_size=64, algorithm=algo)
    assert a == b


def test_skew_splits_hot_region():
    """Skewed data must produce more tiles in the hot region than fg."""
    mbbs = make_mbbs(n=4000, skew=True)
    fg = partition_tiles(mbbs, 200, "fg")
    bsp = partition_tiles(mbbs, 200, "bsp")
    hot = (0.0, 0.0, 50.0, 50.0)

    def tiles_touching(tiles):
        t = np.asarray([r[1:] for r in tiles])
        m = (t[:, 0] <= hot[2]) & (t[:, 2] >= hot[0]) & (t[:, 1] <= hot[3]) & (t[:, 3] >= hot[1])
        return int(m.sum())

    assert tiles_touching(bsp) > tiles_touching(fg)


def test_expand_to_cover():
    mbbs = make_mbbs(n=200)
    tiles = partition_tiles(mbbs, 50, "bsp", cover_plane=True)
    t = np.asarray([r[1:] for r in tiles])
    assert np.isinf(t[:, 0]).any() and np.isinf(t[:, 2]).any()
    # a far-away point must land in exactly one tile now
    px, py = 1e9, -1e9
    inside = (px >= t[:, 0]) & (px <= t[:, 2]) & (py >= t[:, 1]) & (py <= t[:, 3])
    assert inside.sum() == 1


def test_bos_duplicate_centers_cover_extent():
    """Regression: fit_bos's early-return (no center survives the cut —
    guaranteed by duplicate-center data at the extent's high end) used to
    leave the region beyond the last cut covered by no tile, silently
    dropping refpoint-deduped pairs there."""
    dups = np.tile(np.array([90.0, 90.0, 94.0, 94.0]), (20, 1))
    spread = make_mbbs(n=20, seed=3, extent=80.0, size=4.0)
    mbbs = np.vstack([spread, dups])
    tiles = partition_tiles(mbbs, bucket_size=6, algorithm="bos")
    t = np.asarray([r[1:] for r in tiles])
    x0, y0 = mbbs[:, 0].min(), mbbs[:, 1].min()
    x1, y1 = mbbs[:, 2].max(), mbbs[:, 3].max()
    gx, gy = np.meshgrid(np.linspace(x0, x1, 40), np.linspace(y0, y1, 40))
    px, py = gx.ravel(), gy.ravel()
    inside = (
        (px[:, None] >= t[None, :, 0])
        & (px[:, None] <= t[None, :, 2])
        & (py[:, None] >= t[None, :, 1])
        & (py[:, None] <= t[None, :, 3])
    )
    misses = int((~inside.any(axis=1)).sum())
    assert misses == 0, f"bos left {misses} extent probe points uncovered"


def test_bad_inputs():
    with pytest.raises(ValueError):
        partition_tiles(np.zeros((3, 3)), 10, "fg")
    with pytest.raises(ValueError):
        partition_tiles(make_mbbs(10), 10, "nope")
    assert partition_tiles(np.zeros((0, 4)), 10, "fg") == []


class TestTwoLevel:
    def test_two_level_covers_and_disjoint(self):
        from hadoopgis_spark.partition import partition_tiles_two_level

        mbbs = make_mbbs(n=3000, skew=True)
        tiles = partition_tiles_two_level(mbbs, bucket_size=100, algorithm="bsp", cover_plane=True)
        assert len(tiles) > 10
        assert all("_" in t[0] for t in tiles)  # composite ids
        t = np.asarray([r[1:] for r in tiles])
        cx = (mbbs[:, 0] + mbbs[:, 2]) / 2
        cy = (mbbs[:, 1] + mbbs[:, 3]) / 2
        inside = (
            (cx[:, None] >= t[None, :, 0]) & (cx[:, None] <= t[None, :, 2])
            & (cy[:, None] >= t[None, :, 1]) & (cy[:, None] <= t[None, :, 3])
        )
        assert (~inside.any(axis=1)).sum() == 0
        # strict-interior membership unique (disjoint)
        rng = np.random.default_rng(1)
        px = rng.uniform(0, 1000, 400)
        py = rng.uniform(0, 1000, 400)
        strictly = (
            (px[:, None] > t[None, :, 0]) & (px[:, None] < t[None, :, 2])
            & (py[:, None] > t[None, :, 1]) & (py[:, None] < t[None, :, 3])
        )
        assert (strictly.sum(axis=1) <= 1).all()

    def test_two_level_requires_space_partitioner(self):
        from hadoopgis_spark.partition import partition_tiles_two_level

        with pytest.raises(ValueError):
            partition_tiles_two_level(make_mbbs(100), 10, algorithm="hc")

    def test_join_with_two_level(self, spark=None):
        pass  # covered in test_spatial_join via two_level flag
