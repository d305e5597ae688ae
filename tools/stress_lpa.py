"""Label-propagation stress: planted communities at millions of edges.

Synthesizes a graph of K dense blocks (ring-of-cliques per block via
modular arithmetic — intra-block edges only) plus sparse random
inter-block noise edges, runs bounded-round synchronous LPA
(rounds ≳ block diameter — labels spread one hop per round from
singleton initialization), and grades community recovery: fraction of vertices whose final label
matches their block's majority label (label permutations allowed —
communities have no canonical name).

What it proves at scale: per-round cost is one edge⋈label shuffle +
one (vertex, label) count over the 2|E| directed edge set; rounds are
lineage-truncated, so 4 rounds over 10M+ directed edges is flat
memory.

Usage: python tools/stress_lpa.py [n_edges_intra] [n_blocks] [noise]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from spark_skew_join_spark.operators.pagerank import label_propagation
from spark_skew_join_spark.sources.tables import get_spark

N_INTRA = int(sys.argv[1]) if len(sys.argv) > 1 else 5_000_000
N_BLOCKS = int(sys.argv[2]) if len(sys.argv) > 2 else 200
NOISE = int(sys.argv[3]) if len(sys.argv) > 3 else 100_000
ROUNDS = int(sys.argv[4]) if len(sys.argv) > 4 else 8
BLOCK = 5_000  # vertices per block


def main():
    spark = get_spark("stress-lpa", cpus=32)
    # intra-block edges: both endpoints in the same block, distinct
    intra = spark.range(N_INTRA).select(
        (F.col("id") % N_BLOCKS).alias("b"),
        (F.xxhash64("id", F.lit(1)) % BLOCK).alias("u0"),
        (F.xxhash64("id", F.lit(2)) % BLOCK).alias("v0"),
    ).select(
        (F.col("b") * BLOCK + F.abs("u0")).alias("src"),
        (F.col("b") * BLOCK + F.abs("v0")).alias("dst"),
    )
    noise = spark.range(NOISE).select(
        F.abs(F.xxhash64("id", F.lit(3)) % (N_BLOCKS * BLOCK)).alias("src"),
        F.abs(F.xxhash64("id", F.lit(4)) % (N_BLOCKS * BLOCK)).alias("dst"),
    )
    edges = intra.unionAll(noise)
    t0 = time.time()
    per_round: list = []
    out, info = label_propagation(
        edges, rounds=ROUNDS, track_convergence=True,
        round_timings=per_round,
    )
    out = out.persist()
    n = out.count()
    wall = time.time() - t0
    # majority label per true block, then agreement
    graded = out.select(
        "node", "label", (F.col("node") / BLOCK).cast("long").alias("block")
    )
    maj = graded.groupBy("block", "label").count()
    top = maj.groupBy("block").agg(
        F.max(F.struct("count", "label")).alias("m"),
        F.sum("count").alias("n"),
    )
    agree = top.agg(
        (F.sum("m.count") / F.sum("n")).alias("agreement")
    ).collect()[0]["agreement"]
    n_comms = out.select("label").distinct().count()
    print(
        f"vertices={n:,} blocks={N_BLOCKS} intra={N_INTRA:,} "
        f"noise={NOISE:,} | {info['rounds_run']} rounds {wall:.1f}s | "
        f"communities={n_comms:,} majority-agreement={agree:.4f} | "
        f"converged={info['converged']}"
    )
    # per-round decomposition (VERDICT r8 #7): where the wall actually
    # goes round to round, and how many labels still move
    print("round  wall_s  changed")
    for i, (w, c) in enumerate(zip(per_round, info["changed_per_round"]), 1):
        print(f"{i:>5}  {w:6.2f}  {c:,}")


if __name__ == "__main__":
    main()
