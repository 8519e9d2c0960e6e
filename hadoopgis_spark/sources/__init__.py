"""Sources & sinks.

* :mod:`tsv` — the reference's native tab-separated format (S1/S2)
* :mod:`loader` — partitioned data loading (§3.2) + metadata (info.cfg)
"""

from hadoopgis_spark.sources.loader import load_partitioned, save_partitioned
from hadoopgis_spark.sources.tsv import read_tsv, write_tsv

__all__ = ["read_tsv", "write_tsv", "save_partitioned", "load_partitioned"]
