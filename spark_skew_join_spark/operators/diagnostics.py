"""Partition diagnostics + timing harness.

Re-expresses the reference's ``Utils`` surface (SURVEY §2 O5–O8):

* ``count_per_partition`` / ``show_count_per_partition`` —
  ``Utils.scala:23-25,50-54`` (rdd.mapPartitionsWithIndex + collect) →
  DataFrame-native ``groupBy(spark_partition_id())`` (stays in codegen, no
  RDD materialization of a wide plan).
* ``partition_stats`` / ``show_partition_stats`` — ``Utils.scala:31-43``:
  #partitions, total records, nearest-rank percentiles of per-partition
  counts (same ``ceil((n-1)*p/100)`` rank formula for output parity).
* ``timed_save`` — ``Utils.scala:57-74``: wall-clock around a full
  materialization. Spark 3's ``noop`` sink replaces the
  write-parquet-then-delete dance (no cleanup, no disk bound); the parquet
  variant is kept for write-path benchmarking.
"""

from __future__ import annotations

import math
import shutil
import tempfile
import time
from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F


def count_per_partition(df: DataFrame) -> list[tuple[int, int]]:
    """[(partition_index, row_count)] — empty partitions omitted (matches the
    reference: its mapPartitionsWithIndex emits every partition, but empty
    ones show count 0; we add them back driver-side)."""
    rows = (
        df.groupBy(F.spark_partition_id().alias("pid"))
        .count()
        .collect()
    )
    observed = {r["pid"]: r["count"] for r in rows}
    # trailing empty partitions never emit a pid — take the layout's true
    # partition count (and keep max(observed)+1 in case the rdd conversion
    # re-plans to a different count than the executed pids)
    n_part = max(
        df.rdd.getNumPartitions(), (max(observed) + 1) if observed else 0
    )
    return [(i, observed.get(i, 0)) for i in range(n_part)]


def count_per_partition_df(df: DataFrame) -> DataFrame:
    """Distributed variant (no collect) for use inside larger plans."""
    return df.groupBy(F.spark_partition_id().alias("pid")).agg(
        F.count(F.lit(1)).alias("rows")
    )


def show_count_per_partition(df: DataFrame) -> None:
    for idx, cnt in count_per_partition(df):
        print(f"{idx} => {cnt}")


@dataclass(frozen=True)
class PartitionStats:
    num_partitions: int
    total_records: int
    min: int
    p25: int
    p50: int
    p75: int
    max: int

    @property
    def skew_ratio(self) -> float:
        """max / median per-partition count — the imbalance metric the
        skew join exists to shrink."""
        return float("inf") if self.p50 == 0 else self.max / self.p50


def _nearest_rank(sorted_counts: list[int], pct: int) -> int:
    # ceil((n-1) * pct / 100) — Utils.scala:34, kept for output parity
    idx = math.ceil((len(sorted_counts) - 1) * pct / 100)
    return sorted_counts[idx]


def partition_stats(df: DataFrame) -> PartitionStats:
    counts = sorted(c for _, c in count_per_partition(df))
    if not counts:
        return PartitionStats(0, 0, 0, 0, 0, 0, 0)
    return PartitionStats(
        num_partitions=len(counts),
        total_records=sum(counts),
        min=counts[0],
        p25=_nearest_rank(counts, 25),
        p50=_nearest_rank(counts, 50),
        p75=_nearest_rank(counts, 75),
        max=counts[-1],
    )


def show_partition_stats(df: DataFrame, extended: bool = False) -> None:
    s = partition_stats(df)
    print(f"Total number of partitions: {s.num_partitions}")
    print(f"Total records in the partitions: {s.total_records}")
    print(
        f"Percentiles of records in partitions: min={s.min}, 25th={s.p25}, "
        f"median={s.p50}, 75th={s.p75}, max={s.max}"
    )
    if extended:
        show_count_per_partition(df)


def timed_save(
    df: DataFrame, operation_name: str = "operation", format: str = "noop"
) -> float:
    """Force full materialization, return wall-clock seconds.

    format="noop" → Spark's no-op sink (every row computed + serialized,
    nothing written). format="parquet" reproduces the reference's
    write-then-delete measurement (Utils.scala:57-74) for write-path cost.
    """
    start = time.perf_counter()
    if format == "noop":
        df.write.mode("overwrite").format("noop").save()
    else:
        path = tempfile.mkdtemp(prefix="sj_timed_save_")
        try:
            df.write.mode("overwrite").format(format).save(path)
        finally:
            shutil.rmtree(path, ignore_errors=True)
    elapsed = time.perf_counter() - start
    print(f"Time taken for operation {operation_name} is {elapsed:.3f} s")
    return elapsed
