"""Scale stress for semantic dedup (operators/semdedup.py).

Synthesizes N 16-dim vectors fully distributed (no driver data): G
duplicate groups of near-identical vectors (deterministic hash-derived
base + tiny jitter) embedded in a background of unrelated vectors.
Runs the kmeans-centroid path (the scale configuration) and measures:

* wall-clock for assignment + within-cluster pruning,
* duplicate recall: fraction of non-representative group members
  pruned (SemDeDup's recall is bounded by clustering quality — a group
  straddling a cluster boundary escapes comparison, the documented
  trade-off),
* false prunes among the background vectors (threshold 0.95 on random
  vectors should prune ~none).

Usage: python tools/stress_semdedup.py [n_vectors] [n_groups] [group_size]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from spark_skew_join_spark.operators.semdedup import semdedup
from spark_skew_join_spark.sources.tables import get_spark

N = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
GROUPS = int(sys.argv[2]) if len(sys.argv) > 2 else 5_000
GSIZE = int(sys.argv[3]) if len(sys.argv) > 3 else 4
DIM = 16


def main() -> None:
    spark = get_spark("stress-semdedup", cpus=32)
    dup_rows = GROUPS * GSIZE
    # component c of vec v: base(group, c) for dup members (+1% jitter
    # per member), fresh noise for background vectors
    unit = lambda h: (F.pmod(h, F.lit(2001)) - 1000.0) / 1000.0  # noqa: E731
    gid = (F.col("id") / GSIZE).cast("long")
    base = lambda c: unit(F.xxhash64(F.lit("g"), gid * DIM + c))  # noqa: E731
    noise = lambda c: unit(F.xxhash64(F.lit("n"), F.col("id") * DIM + c))  # noqa: E731
    comp = lambda c: F.when(  # noqa: E731
        F.col("id") < dup_rows, base(c) + 0.01 * noise(c)
    ).otherwise(noise(c))
    vecs = spark.range(N).select(
        F.col("id").alias("vec_id"),
        F.array(*[comp(c) for c in range(DIM)]).alias("embedding"),
    ).persist()
    vecs.count()

    t0 = time.perf_counter()
    out = semdedup(
        vecs, threshold=0.95, n_clusters=128, centroid_source="kmeans",
        dim=DIM, sample_size=4096, cluster_cap=20_000,
    ).persist()
    stats = out.agg(
        F.sum((~F.col("is_kept")).cast("long")).alias("pruned"),
        F.sum(
            ((~F.col("is_kept")) & (F.col("vec_id") >= dup_rows)).cast("long")
        ).alias("bg_pruned"),
        F.sum(
            ((~F.col("is_kept")) & (F.col("vec_id") < dup_rows)).cast("long")
        ).alias("dup_pruned"),
    ).collect()[0]
    wall = time.perf_counter() - t0
    prunable = GROUPS * (GSIZE - 1)  # every member but one per group
    print(
        f"semdedup {N:,} vectors ({GROUPS:,} groups x {GSIZE}, kmeans-128): "
        f"{wall:.1f} s; dup recall {stats['dup_pruned']:,}/{prunable:,} "
        f"({100 * stats['dup_pruned'] / prunable:.2f}%), "
        f"background false prunes={stats['bg_pruned']:,}"
    )
    out.unpersist()
    vecs.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
