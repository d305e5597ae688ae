"""LPA checkpoint-cadence sweep (VERDICT r10 #5 — kcore's sweep, for LPA).

Same 10M-edge power-law graph as tools/stress_graph.py, fixed rounds,
track_convergence OFF so every cadence does identical logical work.
Measures wall + completed-stage input/shuffle bytes via the status REST
API (the shuffle_audit methodology) per cadence, and asserts the label
assignment is BIT-IDENTICAL across cadences (lineage-truncation points
must not change the recurrence).

Usage: python tools/sweep_lpa.py [n_edges] [n_nodes] [rounds]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F

N_EDGES = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
N_NODES = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000
ROUNDS = int(sys.argv[3]) if len(sys.argv) > 3 else 8
PORT = 4048


def _rest(path: str):
    with urllib.request.urlopen(
        f"http://localhost:{PORT}/api/v1/{path}", timeout=10
    ) as r:
        return json.load(r)


def _totals(app_id: str) -> dict[str, int]:
    out = {"input": 0, "sread": 0, "swrite": 0}
    for st in _rest(f"applications/{app_id}/stages?status=COMPLETE"):
        out["input"] += st.get("inputBytes", 0)
        out["sread"] += st.get("shuffleReadBytes", 0)
        out["swrite"] += st.get("shuffleWriteBytes", 0)
    return out


def main() -> None:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("sweep-lpa")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.driver.memory",
                os.environ.get("SPARK_DRIVER_MEM", "16g"))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", str(PORT))
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.ui.retainedStages", "5000")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")
    from spark_skew_join_spark.operators.pagerank import label_propagation

    edges = spark.range(N_EDGES).select(
        (F.pow(F.rand(3), 4.0) * N_NODES).cast("long").alias("src"),
        (F.pow(F.rand(5), 4.0) * N_NODES).cast("long").alias("dst"),
    ).localCheckpoint(eager=True)  # freeze rand() so every cadence sees
    # the same graph and input bytes start at the cached edge set
    app_id = _rest("applications")[0]["id"]

    fingerprints = {}
    for every in (1, 2, 4, ROUNDS):
        before = _totals(app_id)
        t0 = time.perf_counter()
        out = label_propagation(
            edges, rounds=ROUNDS, checkpoint_every=every
        )
        fp = out.agg(
            F.count(F.lit(1)).alias("n"),
            F.bit_xor(F.xxhash64("node", "label", "community_size")).alias("h"),
            F.countDistinct("label").alias("c"),
        ).collect()[0]
        wall = time.perf_counter() - t0
        time.sleep(0.5)
        after = _totals(app_id)
        mb = {k: (after[k] - before[k]) / 1e6 for k in before}
        fingerprints[every] = (fp["n"], fp["h"], fp["c"])
        print(
            f"cadence={every:>2}  wall={wall:6.1f}s  "
            f"input={mb['input']:8.1f}MB  sread={mb['sread']:8.1f}MB  "
            f"swrite={mb['swrite']:8.1f}MB  "
            f"nodes={fp['n']:,} communities={fp['c']:,} hash={fp['h']}"
        )
    vals = set(fingerprints.values())
    print("bit-identical across cadences:", len(vals) == 1)
    spark.stop()


if __name__ == "__main__":
    main()
