"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query (WKT spatial join through the full
engine) at sf0.001. ``queries()`` / ``oracle_sql()`` — the operator
inventory of SURVEY.md §2 as runnable queries with DuckDB oracles (see
``hadoopgis_spark/workload.py``).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoopgis_spark.operators import spatial_join
from hadoopgis_spark.workload import REGISTRY


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: exact-WKT spatial join through the whole engine
    (MBB extract → bsp tiles → multicast → tile join → refine →
    reference-point dedup) on triangles derived from sf0.001 tables.
    """
    sf = "/root/testdata/sf0.001"
    l = spark.read.parquet(f"{sf}/lineitem.parquet")
    o = spark.read.parquet(f"{sf}/orders.parquet")

    def tri(xc, yc, sc):
        x = (F.col(xc) % 199) * 5.0
        y = (F.col(yc) % 101) * 9.0
        s = 4.0 + (F.col(sc) % 9)
        wkt = F.concat(
            F.lit("POLYGON (("),
            x, F.lit(" "), y, F.lit(", "),
            x + s, F.lit(" "), y, F.lit(", "),
            x, F.lit(" "), y + s, F.lit(", "),
            x, F.lit(" "), y,
            F.lit("))"),
        )
        return wkt

    a = l.select(
        (F.col("l_orderkey") * 10 + F.col("l_linenumber")).alias("id"),
        tri("l_partkey", "l_suppkey", "l_partkey").alias("geom"),
    )
    b = o.select(
        F.col("o_orderkey").alias("id"),
        tri("o_custkey", "o_orderkey", "o_custkey").alias("geom"),
    )
    j = spatial_join(a, b, "st_intersects", stats=["jaccard", "mindist"])
    return j.select("id_1", "id_2", F.round("jaccard", 6).alias("jaccard_sim"))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: q.fn for name, q in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalent for each query."""
    return {name: q.oracle for name, q in REGISTRY.items() if q.oracle is not None}
