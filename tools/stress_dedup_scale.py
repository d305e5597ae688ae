"""Dedup-family scale stress (VERDICT r10 #6 — the flagship's order-of-
magnitude push, dedup leg).

Exact dedup at hundreds of millions of synthetic docs: texts are
generated in-plan (md5-derived words, duplicate groups planted by id
modulus, so the expected survivor count is exact arithmetic), the
operator path is exact_dedup's fingerprint-groupBy — the shuffle moves
16-byte md5 keys + ids, never text, which is the whole 100 TB design
claim this stress exercises. Records wall, rows/s, and the JVM peak
heap from the status REST executor metrics.

Usage: python tools/stress_dedup_scale.py [n_rows] [dup_group]
  n_rows    total documents (default 500M)
  dup_group every doc shares its text with (id % (n_rows/dup_group))
            peers => survivors = n_rows/dup_group exactly (default 5)
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F

N_ROWS = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000_000
DUP_GROUP = int(sys.argv[2]) if len(sys.argv) > 2 else 5
PORT = 4047


def _peak_heap_mb() -> float:
    with urllib.request.urlopen(
        f"http://localhost:{PORT}/api/v1/applications", timeout=10
    ) as r:
        app = json.load(r)[0]["id"]
    with urllib.request.urlopen(
        f"http://localhost:{PORT}/api/v1/applications/{app}/executors",
        timeout=10,
    ) as r:
        execs = json.load(r)
    return max(
        e.get("peakMemoryMetrics", {}).get("JVMHeapMemory", 0)
        for e in execs
    ) / 1e6


def main() -> None:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("stress-dedup-scale")
        .config("spark.sql.shuffle.partitions", str(cpus * 8))
        .config("spark.driver.memory",
                os.environ.get("SPARK_DRIVER_MEM", "48g"))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", str(PORT))
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")
    from spark_skew_join_spark.operators.dedup import exact_dedup

    n_groups = N_ROWS // DUP_GROUP
    # ~8 distinct words per text from the GROUP id: same group => same
    # text, different group => md5-distinct words (collision-free at
    # this scale for 128-bit fingerprints)
    g = (F.col("id") % n_groups).cast("string")
    text = F.concat_ws(
        " ", *[F.md5(F.concat(g, F.lit(f"_{j}"))) for j in range(8)]
    )
    docs = spark.range(N_ROWS).select(
        F.col("id").alias("doc_id"), text.alias("text")
    )
    t0 = time.perf_counter()
    row = exact_dedup(docs).agg(
        F.count(F.lit(1)).alias("survivors"),
        F.sum("dup_count").alias("total"),
        F.max("dup_count").alias("max_group"),
    ).collect()[0]
    wall = time.perf_counter() - t0
    ok = row["survivors"] == n_groups and row["total"] == N_ROWS
    print(
        f"rows={N_ROWS:,} dup_group={DUP_GROUP} -> "
        f"survivors={row['survivors']:,} (expected {n_groups:,}) "
        f"total={row['total']:,} max_group={row['max_group']} | "
        f"wall={wall:.1f}s ({N_ROWS / wall / 1e6:.1f}M rows/s) "
        f"peak_jvm_heap={_peak_heap_mb():.0f}MB | "
        f"{'PASS' if ok else 'FAIL'}"
    )
    spark.stop()
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
