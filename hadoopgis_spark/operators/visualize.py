"""Partition visualizer (T4, optional).

Reference: gnuplot PNG of tile boundaries + object points
(``/root/reference/src/visualizer/partition_vis.cpp:22-211``). This
environment ships no matplotlib, so the renderer is gated behind an
import — the data-preparation half (bounded sampling of objects +
tiles) is real and tested either way.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame

__all__ = ["partition_plot_data", "plot_partitions"]


def partition_plot_data(
    assigned: DataFrame, tiles, max_points: int = 10_000
) -> tuple[np.ndarray, np.ndarray]:
    """(points[N,2], tile_boxes[T,4]) ready for any plotting backend;
    points are a bounded sample of MBB centers."""
    n = assigned.count()
    frac = min(1.0, max_points / max(1, n))
    s = assigned.select("xmin", "ymin", "xmax", "ymax")
    if frac < 1.0:
        s = s.sample(fraction=frac, seed=7)
    pdf = s.toPandas()
    pts = np.column_stack(
        [(pdf["xmin"] + pdf["xmax"]) / 2.0, (pdf["ymin"] + pdf["ymax"]) / 2.0]
    )
    boxes = np.asarray([[t[1], t[2], t[3], t[4]] for t in tiles], dtype=np.float64)
    return pts, boxes


def plot_partitions(assigned: DataFrame, tiles, out_path: str, max_points: int = 10_000) -> str:
    """Render tiles + object sample to a PNG. Requires matplotlib."""
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        from matplotlib.patches import Rectangle
    except ImportError as e:
        raise NotImplementedError(
            "matplotlib is not available in this environment; use "
            "partition_plot_data() and render elsewhere"
        ) from e
    pts, boxes = partition_plot_data(assigned, tiles, max_points)
    fig, ax = plt.subplots(figsize=(10, 10))
    finite = boxes[np.isfinite(boxes).all(axis=1)]
    for x0, y0, x1, y1 in finite:
        ax.add_patch(Rectangle((x0, y0), x1 - x0, y1 - y0, fill=False, lw=0.5))
    ax.plot(pts[:, 0], pts[:, 1], ".", ms=1)
    fig.savefig(out_path, dpi=120)
    plt.close(fig)
    return out_path
