"""Fresh-JVM probe for the r15 ANN family A/B: family build wall +
bench-identical line walls (EAGER: construction + noop, twice, both
recorded) for the six IVF/PQ consumers.

    python tools/probe_ann_r15.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

LINES = (
    "ann_pq_topk",
    "ann_pq_refined_topk",
    "ann_ivf_topk",
    "ann_ivf_refined_topk",
    "ann_ivfpq_topk",
    "ann_ivfpq_refined_topk",
)


def main() -> None:
    from spark_skew_join_spark import queries as q
    from spark_skew_join_spark.sources.tables import get_spark, load_tables

    spark = get_spark("probe-ann-r15", cpus=CPUS)
    for df in load_tables(spark, SF).values():
        df.count()
    t0 = time.perf_counter()
    q.build_family("ann", spark, SF)
    print(f"ann_family_build  {time.perf_counter() - t0:7.3f} s", flush=True)
    total = 0.0
    for name in LINES:
        walls = []
        for _ in range(2):
            t0 = time.perf_counter()
            q.QUERIES[name](spark, SF).write.mode("overwrite").format(
                "noop"
            ).save()
            walls.append(time.perf_counter() - t0)
        rec = min(walls)
        total += rec
        print(f"{name:26s} {walls[0]:7.3f} {walls[1]:7.3f}  rec {rec:7.3f}",
              flush=True)
    print(f"consumers total (recorded) {total:7.3f} s")
    q.release_family("ann")
    q.clear_dedup_cache()
    spark.stop()


if __name__ == "__main__":
    main()
