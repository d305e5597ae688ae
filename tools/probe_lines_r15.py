"""Fresh-JVM probe for individual bench lines (bench-identical walls:
EAGER lines time construction + noop; non-eager construct once and time
the noop). Families the lines consume are pre-built untimed.

    python tools/probe_lines_r15.py <query> [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main() -> None:
    names = sys.argv[1:]
    from spark_skew_join_spark import queries as q
    from spark_skew_join_spark.sources.tables import get_spark, load_tables

    spark = get_spark("probe-lines-r15", cpus=CPUS)
    for df in load_tables(spark, SF).values():
        df.count()
    for fam, consumers in q.FAMILY_CONSUMERS.items():
        if any(c in names for c in consumers):
            q.build_family(fam, spark, SF)
    for name in names:
        walls = []
        if name in q.EAGER_QUERIES:
            for _ in range(2):
                t0 = time.perf_counter()
                q.QUERIES[name](spark, SF).write.mode("overwrite").format(
                    "noop"
                ).save()
                walls.append(time.perf_counter() - t0)
        else:
            df = q.QUERIES[name](spark, SF)
            for _ in range(2):
                t0 = time.perf_counter()
                df.write.mode("overwrite").format("noop").save()
                walls.append(time.perf_counter() - t0)
        print(f"{name:30s} {walls[0]:7.3f} {walls[1]:7.3f}  "
              f"rec {min(walls):7.3f}", flush=True)
    for fam in list(q.FAMILY_CONSUMERS):
        q.release_family(fam)
    q.clear_dedup_cache()
    spark.stop()


if __name__ == "__main__":
    main()
