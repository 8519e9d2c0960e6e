"""Engine operators — the reference's query surface as DataFrame programs.

* :mod:`mbb` — MBB extraction + global space stats (T1/A1)
* :mod:`tile` — tile tables, multicast tile assignment (J6)
* :mod:`spatial_join` — partitioned spatial join (J1/J2/J5 + dedup O4)
* :mod:`knn` — kNN join (J4, ``st_nearest``/``st_nearest2``)
* :mod:`containment` — window queries (J3) with tile pruning
* :mod:`dedup` — exact & near-duplicate detection for document pipelines
* :mod:`similarity` — embedding ANN search
* :mod:`multimodal` — binary-column (image/audio) plumbing
"""

from hadoopgis_spark.operators.mbb import space_extent, with_mbb
from hadoopgis_spark.operators.spatial_join import spatial_join
from hadoopgis_spark.operators.tile import assign_tiles, tiles_dataframe
from hadoopgis_spark.operators.knn import knn_join
from hadoopgis_spark.operators.containment import containment

__all__ = [
    "with_mbb",
    "space_extent",
    "tiles_dataframe",
    "assign_tiles",
    "spatial_join",
    "knn_join",
    "containment",
]
