"""Format round-trip helpers beyond parquet (the reference shipped spark-csv
on its classpath, ``pom.xml:44-48``, though never used in code).

Thin, explicit-schema wrappers: at 100 TB a schema inference pass over CSV
is a full extra scan — always pass the schema. Delta/Iceberg/Hudi jars are
auto-detected at call time: present → the writer runs normally; absent →
a clear NotImplementedError instead of an opaque JVM ClassNotFound.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

_LAKEHOUSE_PROBE_CLASS = {
    "delta": "org.apache.spark.sql.delta.sources.DeltaDataSource",
    "iceberg": "org.apache.iceberg.spark.source.IcebergSource",
    "hudi": "org.apache.hudi.DefaultSource",
}


def lakehouse_available(spark: SparkSession, format: str) -> bool:
    """True when the connector's DataSource class is on the session's
    classpath (jar shipped with the image or added via spark.jars)."""
    cls = _LAKEHOUSE_PROBE_CLASS.get(format)
    if cls is None:
        return False
    try:
        spark._jvm.java.lang.Class.forName(cls)  # type: ignore[union-attr]
        return True
    except Exception:
        return False


def write_table(df: DataFrame, path: str, format: str = "parquet",
                mode: str = "overwrite", partition_by: list[str] | None = None) -> None:
    if format in _LAKEHOUSE_PROBE_CLASS and not lakehouse_available(
        df.sparkSession, format
    ):
        raise NotImplementedError(
            f"{format} connector jars are not on this session's classpath; "
            "add them via spark.jars.packages or use parquet/csv/json/orc"
        )
    w = df.write.mode(mode).format(format)
    if format == "csv":
        w = w.option("header", "true")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.save(path)


def read_table(spark: SparkSession, path: str, format: str = "parquet",
               schema: StructType | str | None = None) -> DataFrame:
    r = spark.read.format(format)
    if schema is not None:
        r = r.schema(schema)
    elif format in ("csv", "json"):
        raise ValueError(
            f"{format} reads require an explicit schema (inference is a full "
            "extra scan at scale)"
        )
    if format == "csv":
        r = r.option("header", "true")
    return r.load(path)
