"""Benchmark harness (driver contract): headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": total_sec, "unit": "sec",
   "queries": {name: sec, ...}, "sf": 0.1}

Each query is forced to full materialization through the noop sink (all rows
computed + serialized, nothing written — same methodology as the reference's
timedSaveToDisk, Utils.scala:57-74, minus the parquet write cost).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from spark_skew_join_spark import queries as q
from spark_skew_join_spark.sources.tables import get_spark

# every registered query is timed (VERDICT r1 #8: regressions in the
# un-benched half must be visible); the skew-join queries are re-timed below
# to fold in their plan-construction pre-pass jobs
HEADLINE = "ALL"


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    spark = get_spark("bench", cpus=cpus)
    # warm the JVM (codegen paths, parquet footers) so the first timed query
    # doesn't absorb session cold-start — same methodology as skewbench
    from spark_skew_join_spark.sources.tables import load_tables

    for df in load_tables(spark, sf_dir).values():
        df.count()
    names = list(q.QUERIES) if HEADLINE == "ALL" else HEADLINE
    timings: dict[str, float] = {}
    for name in names:
        fn = q.QUERIES[name]
        df = fn(spark, sf_dir)  # plan construction (includes any pre-jobs)
        start = time.perf_counter()
        df.write.mode("overwrite").format("noop").save()
        timings[name] = round(time.perf_counter() - start, 3)
    # queries with eager plan-construction work (skew-join hot-key pre-pass,
    # connected-components iteration loop) are re-timed construction+execution
    for name in (
        "skew_join_lineitem_supplier",
        "skew_join_multicol",
        "dedup_clusters_docs",
    ):
        start = time.perf_counter()
        q.QUERIES[name](spark, sf_dir).write.mode("overwrite").format("noop").save()
        timings[name] = round(time.perf_counter() - start, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall_clock",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
