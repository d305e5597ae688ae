"""Bucketed-table helpers: pre-shuffle once at write time, join shuffle-free
forever after — the co-located-join strategy for repeatedly-joined 100 TB
fact tables (pyspark guide "Partitioning & shuffle").

``write_bucketed`` hash-buckets (and optionally sorts) into the session
catalog; a later equi-join between two tables bucketed on the same keys with
the same bucket count plans as a zero-Exchange sort-merge join — verified by
``tests/test_bucketing.py`` via plan inspection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    keys: list[str] | str,
    n_buckets: int = 32,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    keys = [keys] if isinstance(keys, str) else list(keys)
    w = df.write.mode(mode).format("parquet").bucketBy(n_buckets, *keys)
    if sort:
        w = w.sortBy(*keys)
    w.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)
