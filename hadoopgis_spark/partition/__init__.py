"""Spatial tile partitioners (driver-side, numpy).

The reference ships 7 partitioning algorithms selected by ``-u``
(``/root/reference/src/partitionalgo/``; validation
``src/progparams/queryprocessor_params_2d.hpp:94-121``). They all run in
a single reducer over a (sampled) set of MBBs
(``src/framework/queryprocessor_2d.cpp:287-293``) — the Spark engine
mirrors that information flow: a bounded sample of MBBs is collected to
the driver, the partitioner computes tile boundaries, and the tiles are
broadcast back as a small DataFrame. Sample size is capped, so driver
memory is O(sample), never O(data) — the design survives 100 TB inputs.

Contract: ``fit(mbbs: ndarray[N,4], bucket_size: int) -> ndarray[T,4]``
(tile boundaries, [xmin,ymin,xmax,ymax]); ``partition_tiles`` wraps any
algorithm and returns the tile table with string ids like the
reference's ``partition.idx`` (``src/framework/query_partition.hpp:271-288``).

``SPACE_PARTITIONERS`` produce tiles that disjointly cover the plane
(edge tiles extended to ±inf) — these joins can use zero-shuffle
reference-point dedup. MBR partitioners (str, hc) emit data-MBR tiles
that may overlap/gap, so joins over them fall back to distinct() dedup,
as the reference does for every partitioner
(``src/boundaryhandler/duplicate_remover.cpp:28-42``).
"""

from hadoopgis_spark.partition.algos import (
    ALGORITHMS,
    MBR_PARTITIONERS,
    SPACE_PARTITIONERS,
    fit_bos,
    fit_bsp,
    fit_fg,
    fit_hc,
    fit_qt,
    fit_slc,
    fit_str,
    partition_tiles,
    partition_tiles_two_level,
)

__all__ = [
    "ALGORITHMS",
    "SPACE_PARTITIONERS",
    "MBR_PARTITIONERS",
    "fit_fg",
    "fit_bsp",
    "fit_qt",
    "fit_str",
    "fit_hc",
    "fit_slc",
    "fit_bos",
    "partition_tiles",
    "partition_tiles_two_level",
]
