"""hadoopgis_spark — a from-scratch PySpark-native spatial analytics engine.

Re-expresses the query surface of StonyBrookDB/hadoopgis (Hadoop-GIS,
VLDB'13) as idiomatic Spark DataFrame programs:

* spatial join / kNN join / containment (window) queries
  (reference: ``src/framework/queryprocessor_2d.cpp``)
* 7 data-driven tile partitioners (``src/partitionalgo/*``)
* geometry predicates & measures (``src/resque/spjoin_2d.hpp``)
* plus large-scale data-pipeline operators (dedup, similarity search,
  text analysis, multimodal plumbing) the reference never had.

Everything relational is DataFrame/Catalyst; geometry refinement is the
only Python hot path and is Arrow-vectorized.
"""

from hadoopgis_spark.session import get_spark

__version__ = "0.1.0"

__all__ = ["get_spark", "__version__"]
