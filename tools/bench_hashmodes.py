"""md5-compat tax quantification (VERDICT r8 #6).

The registry runs hll_distinct_stats, hll_union_sources,
bloom_membership_orders, and dedup_simhash_docs in hash_fn="md5" mode
so their DuckDB oracles can replay every register/probe/fingerprint
bit in ANSI SQL. That replayability costs md5-vs-xxhash64 per key.
This tool times the sketch-build portion of each — the only part the
hash mode touches; everything downstream is identical — in BOTH modes
at the bench scale so the tax is on record per query.

Run: PYTHONPATH=/root/repo python tools/bench_hashmodes.py [sf_dir]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from spark_skew_join_spark.sources.tables import get_spark, load_tables


def timed(fn, warmup=True):
    if warmup:
        fn()  # JIT/plan-compile warm-up — we measure the hash delta,
        # not first-run codegen (BASELINE.md variance decomposition)
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    spark = get_spark("bench_hashmodes", cpus=32)
    t = load_tables(spark, sf_dir)

    from spark_skew_join_spark.operators.dedup import simhash64
    from spark_skew_join_spark.sketch.bloom import bloom_from_dataframe
    from spark_skew_join_spark.sketch.hll import hll_from_dataframe

    probes = [
        ("orders.o_custkey", t["orders"], ["o_custkey"]),
        ("lineitem.l_partkey", t["lineitem"], ["l_partkey"]),
        ("lineitem.l_suppkey", t["lineitem"], ["l_suppkey"]),
    ]

    rows = []

    def hll_all(mode):
        for _, df, cols in probes:
            hll_from_dataframe(df, cols, hash_fn=mode)

    rows.append(("hll_distinct_stats (3 sketch builds)",
                 timed(lambda: hll_all("xxhash64")),
                 timed(lambda: hll_all("md5"))))

    def hll_union(mode):
        docs = t["documents"]
        for src in [r["source"] for r in
                    docs.select("source").distinct().collect()]:
            hll_from_dataframe(docs.where(docs.source == src),
                               ["doc_id"], hash_fn=mode)

    rows.append(("hll_union_sources (per-source builds)",
                 timed(lambda: hll_union("xxhash64")),
                 timed(lambda: hll_union("md5"))))

    rows.append(("bloom_membership_orders (one-shot build)",
                 timed(lambda: bloom_from_dataframe(
                     t["orders"], ["o_custkey"], hash_fn="xxhash64")),
                 timed(lambda: bloom_from_dataframe(
                     t["orders"], ["o_custkey"], hash_fn="md5"))))

    def simhash(mode):
        simhash64(t["documents"], n=8, hash_fn=mode).write.mode(
            "overwrite").format("noop").save()

    rows.append(("dedup_simhash_docs (fingerprint build)",
                 timed(lambda: simhash("xxhash64")),
                 timed(lambda: simhash("md5"))))

    print(f"\nmd5-compat tax at {sf_dir} (warm, sketch-build portion):")
    print(f"{'query (timed portion)':<44} {'xxh64':>7} {'md5':>7} {'tax':>7}")
    for name, tx, tm in rows:
        print(f"{name:<44} {tx:>6.2f}s {tm:>6.2f}s {tm - tx:>+6.2f}s")
    spark.stop()


if __name__ == "__main__":
    main()
