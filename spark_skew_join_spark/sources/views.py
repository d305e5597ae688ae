"""SQL-surface helper: register the fixture tables as temp views so raw
Spark SQL works against the catalog (the reference has no SQL layer; Spark
gives one for free — this is the 20-line adapter).

    register_views(spark, sf_dir)
    spark.sql("SELECT l_returnflag, count(*) FROM lineitem GROUP BY 1")
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from .tables import TABLES, load_table


def register_views(spark: SparkSession, sf_dir: str, suffix: str = "") -> list[str]:
    """Create/replace one temp view per fixture table; returns view names."""
    names = []
    for t in TABLES:
        name = f"{t}{suffix}"
        load_table(spark, sf_dir, t).createOrReplaceTempView(name)
        names.append(name)
    return names
