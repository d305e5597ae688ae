"""A/B: dedup family materialization via persist (current) vs
localCheckpoint (analysis barrier). Fresh JVM per invocation:

    python tools/ab_dedup_ckpt.py persist|ckpt

Builds the family exactly as queries._dedup_family does (same params),
pre-seeds _DEDUP_FAMILY_CACHE with the variant's frames, then times the
benched consumer actions — the per-action Catalyst analysis cost is the
thing the barrier targets (BASELINE r14: ~6.5 s driver-side analysis in
the build, 32-agg subtree embedded ~6x and re-analyzed per action).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main() -> None:
    variant = sys.argv[1]
    from spark_skew_join_spark import queries as q
    from spark_skew_join_spark.operators.dedup import minhash_pairs, shingles
    from spark_skew_join_spark.sources.tables import get_spark, load_tables

    spark = get_spark(f"ab-dedup-{variant}", cpus=CPUS)
    t0 = time.perf_counter()
    docs = load_tables(spark, SF)["documents"]
    if variant == "persist":
        sh = shingles(docs, n=8).persist()
        pairs = minhash_pairs(docs, threshold=0.5, n=8, shingle_df=sh).persist()
    else:
        sh = shingles(docs, n=8).localCheckpoint()
        pairs = minhash_pairs(
            docs, threshold=0.5, n=8, shingle_df=sh, cache_bands="ckpt"
        ).localCheckpoint()
    # materialize like build_family does
    sh.count()
    pairs.count()
    t_build = time.perf_counter() - t0
    print(f"build {t_build:7.3f} s", flush=True)

    key = (q._session_key(spark), SF)
    q._DEDUP_FAMILY_CACHE[key] = (sh, pairs)

    total = 0.0
    for name in (
        "dedup_minhash_docs", "dedup_clusters_docs", "dedup_fuzzy_survivors",
        "cluster_split_docs", "dedup_ngram_jaccard", "near_dup_leakage_sources",
    ):
        t1 = time.perf_counter()
        df = q.QUERIES[name](spark, SF)
        df.write.mode("overwrite").format("noop").save()
        dt = time.perf_counter() - t1
        total += dt
        print(f"  {name:28s} {dt:7.3f} s", flush=True)
    print(f"consumers total {total:7.3f} s  grand {t_build + total:7.3f} s")
    spark.stop()


if __name__ == "__main__":
    main()
