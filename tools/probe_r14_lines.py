"""Fresh-JVM probe for the r14 changed-semantics bench lines:

    python tools/probe_r14_lines.py dedup|quality|langid|ann|phash

Reports the same walls bench.py records (family build incl. stages, or
cold-run line walls for cache-registering queries) so BENCH_EXPECT refs
can be refreshed from a quiet-box measurement.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def noop(df):
    df.write.mode("overwrite").format("noop").save()


def main() -> None:
    probe = sys.argv[1]
    from spark_skew_join_spark import queries as q
    from spark_skew_join_spark.sources.tables import get_spark

    spark = get_spark(f"probe-{probe}", cpus=CPUS)
    if probe == "dedup":
        stages: dict = {}
        t0 = time.perf_counter()
        sh, pairs = q._dedup_family(spark, SF, stage_times=stages)
        sh.count()
        pairs.count()
        total = time.perf_counter() - t0
        for k, v in stages.items():
            print(f"  stage_{k:10s} {v:7.3f} s", flush=True)
        print(f"  build total     {total:7.3f} s")
    elif probe in ("quality", "ann", "langid_fam"):
        fam = {"quality": "quality", "ann": "ann", "langid_fam": "langid"}[probe]
        t0 = time.perf_counter()
        q.build_family(fam, spark, SF)
        print(f"  {fam}_family_build {time.perf_counter() - t0:7.3f} s")
    elif probe == "langid":
        q.build_family("langid", spark, SF)
        for name in ("langid_softmax_docs", "langid_softmax_eval",
                     "langid_planted_multilingual"):
            import spark_skew_join_spark.operators.dedup as _dd

            snap = _dd.cache_snapshot()
            t0 = time.perf_counter()
            df = q.QUERIES[name](spark, SF)
            noop(df)
            cold = time.perf_counter() - t0
            t1 = time.perf_counter()
            noop(df)
            warm = time.perf_counter() - t1
            _dd.release_entries(*_dd.entries_since(snap))
            print(f"  {name:30s} cold {cold:7.3f}  warm {warm:7.3f}", flush=True)
    elif probe == "phash":
        import spark_skew_join_spark.operators.dedup as _dd

        for name in ("image_near_dup_phash", "image_near_dup_png",
                     "audio_near_dup_awhash"):
            snap = _dd.cache_snapshot()
            t0 = time.perf_counter()
            df = q.QUERIES[name](spark, SF)
            noop(df)
            cold = time.perf_counter() - t0
            _dd.release_entries(*_dd.entries_since(snap))
            print(f"  {name:25s} cold {cold:7.3f} s", flush=True)
    q.clear_dedup_cache()
    spark.stop()


if __name__ == "__main__":
    main()
