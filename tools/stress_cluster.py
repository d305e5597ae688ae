"""At-scale connected-components smoke (on demand, like stress_equivalence):
synthetic graphs with known ground truth at millions of vertices.

Phase 1 — chains: blocks of C consecutive ids linked into paths (diameter
C-1 stresses the pointer-jumping convergence); expected rep = block start.
Phase 2 — hub: a star from vertex 0 to every block start merges everything
into one component (hot-vertex skew through the edge join); expected rep 0.

Usage: python tools/stress_cluster.py [n_vertices] [chain_len]
Prints PASS/FAIL lines and exits nonzero on any mismatch.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from spark_skew_join_spark.operators.cluster import connected_components
from spark_skew_join_spark.sources.tables import get_spark


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    c = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    spark = get_spark("stress_cluster", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    fails = 0

    verts = spark.range(n).select(F.col("id").alias("doc_id"))
    chain = (
        spark.range(n)
        .where(F.col("id") % c != 0)
        .select((F.col("id") - 1).alias("id_a"), F.col("id").alias("id_b"))
    )

    t0 = time.perf_counter()
    comp = connected_components(chain, verts)
    bad = comp.where(
        F.col("cluster_rep") != (F.expr(f"doc_id div {c}") * c)
    ).count()
    secs = time.perf_counter() - t0
    status = "PASS" if bad == 0 else "FAIL"
    fails += bad > 0
    print(f"{status} chains n={n} chain_len={c} bad={bad} {secs:.1f}s")

    hub = spark.range(1, n // c).select(
        F.lit(0).cast("long").alias("id_a"), (F.col("id") * c).alias("id_b")
    )
    t0 = time.perf_counter()
    comp2 = connected_components(chain.unionByName(hub), verts)
    bad2 = comp2.where(F.col("cluster_rep") != 0).count()
    secs2 = time.perf_counter() - t0
    status2 = "PASS" if bad2 == 0 else "FAIL"
    fails += bad2 > 0
    print(f"{status2} hub-star n={n} bad={bad2} {secs2:.1f}s")

    spark.stop()
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
