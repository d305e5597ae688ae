"""Scale stress for the fixed-iteration PageRank operator.

Synthetic power-law-ish directed graph: 10M edges over 1M vertices with
a hub (vertex 0 receives ~1% of all edges — the hot-vertex regime), 5
iterations. Checks: ranks positive, total mass ≤ 1 (dangling vertices
exist by construction), hub rank ≫ median, wall-clock per iteration.

Usage: python tools/stress_pagerank.py [edges] [vertices] [iterations]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from spark_skew_join_spark.operators.pagerank import pagerank
from spark_skew_join_spark.sources.tables import get_spark

EDGES = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
VERTS = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000
ITERS = int(sys.argv[3]) if len(sys.argv) > 3 else 5


def main() -> None:
    spark = get_spark("stress-pagerank", cpus=32)
    e = spark.range(EDGES).select(
        F.pmod(F.xxhash64("id", F.lit(1)), F.lit(VERTS)).alias("src"),
        # ~1% of edges point at hub vertex 0, rest uniform
        F.when(F.pmod(F.xxhash64("id", F.lit(2)), F.lit(100)) == 0, F.lit(0))
        .otherwise(F.pmod(F.xxhash64("id", F.lit(3)), F.lit(VERTS)))
        .alias("dst"),
        (F.pmod(F.xxhash64("id", F.lit(4)), F.lit(9)) + 1)
        .cast("double")
        .alias("w"),
    ).localCheckpoint()
    t0 = time.perf_counter()
    pr = pagerank(e, "src", "dst", "w", damping=0.85, iterations=ITERS)
    stats = pr.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("rank").alias("mass"),
        F.min("rank").alias("mn"),
        F.expr("percentile_approx(rank, 0.5)").alias("med"),
    ).collect()[0]
    hub = pr.where("vertex = 0").collect()[0]["rank"]
    wall = time.perf_counter() - t0
    print(
        f"pagerank {EDGES:,} edges / {VERTS:,} verts / {ITERS} iters: "
        f"{wall:.1f} s ({wall/ITERS:.1f} s/iter), n={stats['n']:,}, "
        f"mass={stats['mass']:.4f} (<=1), min={stats['mn']:.2e}, "
        f"median={stats['med']:.2e}, hub={hub:.4f} "
        f"({hub/stats['med']:.0f}x median)"
    )
    spark.stop()


if __name__ == "__main__":
    main()
