"""Format round-trip helpers beyond parquet (the reference shipped spark-csv
on its classpath, ``pom.xml:44-48``, though never used in code).

Thin, explicit-schema wrappers: at 100 TB a schema inference pass over CSV
is a full extra scan — always pass the schema. Delta/Iceberg/Hudi need jars
absent from this image; their writers raise with a clear message instead of
failing at the JVM layer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def write_table(df: DataFrame, path: str, format: str = "parquet",
                mode: str = "overwrite", partition_by: list[str] | None = None) -> None:
    if format in ("delta", "iceberg", "hudi"):
        raise NotImplementedError(
            f"{format} requires connector jars not present in this image; "
            "use parquet/csv/json/orc"
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
