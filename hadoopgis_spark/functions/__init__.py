"""Column-level function surface.

Two tiers, mirroring the engine's filter-refine design
(``/root/reference/src/resque/spjoin_2d.hpp:73-93``):

* **Box tier** (``hadoopgis_spark.functions.boxes``) — pure Column
  expressions over (xmin,ymin,xmax,ymax); JVM-side, whole-stage
  codegen, usable in join conditions, pushed to Parquet scans.
* **Geometry tier** (``hadoopgis_spark.functions.spatial``) — Arrow
  pandas UDFs over WKT for exact predicates/measures; only ever applied
  to MBB-filtered candidates.

Plus text/vector function families for the data-pipeline operators.
"""

from hadoopgis_spark.functions import boxes, spatial, text, vector

__all__ = ["boxes", "spatial", "text", "vector"]
