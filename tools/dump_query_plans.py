"""Dump `.explain("formatted")` for named registry queries to files.

Usage: python tools/dump_query_plans.py <outdir> <suffix> <query> [query ...]

Writes <outdir>/<query>_<suffix>.txt for each query — the optimization-round
evidence artifact (plans/r14/<query>_before.txt / _after.txt). Runs at
$SPARK_GRAFT_SF_DIR (default sf0.1) so plan shapes match the bench. EAGER
queries run their construction-time jobs (training collects) as a side
effect; the dump itself triggers no action on the returned frame.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    outdir, suffix, names = sys.argv[1], sys.argv[2], sys.argv[3:]
    os.makedirs(outdir, exist_ok=True)
    from spark_skew_join_spark import queries as q
    from spark_skew_join_spark.sources.tables import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("plan-dump", cpus=cpus)
    for name in names:
        df = q.QUERIES[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)")
    q.clear_dedup_cache()
    spark.stop()


if __name__ == "__main__":
    main()
