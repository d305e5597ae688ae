"""TF-IDF cosine join stress: 1M synthetic docs, planted duplicates,
and a hot-phrase skew guard check.

What it proves at scale: the pair enumeration is the inverted-index
equi-join on trigram hashes, so with a realistic (large-vocabulary)
corpus the candidate fan-out per term is tiny and 1M docs complete in
seconds — while a boilerplate trigram stamped into 100k docs would
alone create ~5·10⁹ candidate pairs; the ``max_df`` cap drops it from
vectors AND norms, keeping the same run bounded. Planted duplicate
pairs must come back at cosine 1.0.

Run: PYTHONPATH=/root/repo python tools/stress_tfidf.py [n_docs]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from spark_skew_join_spark.operators.retrieval import tfidf_cosine_pairs
from spark_skew_join_spark.sources.tables import get_spark

N_DOCS = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
N_WORDS, VOCAB, N_DUPS, N_HOT = 30, 50_000, 1_000, 100_000


def main():
    spark = get_spark("stress_tfidf", cpus=32)
    # doc i and its planted twin N-1-i (i < N_DUPS) share a seed so
    # their texts are identical; everyone else is hash-random over a
    # 50k vocabulary (trigram df ≈ 1 — the realistic sparse case)
    seed = F.when(
        F.col("id") >= N_DOCS - N_DUPS, F.lit(N_DOCS - 1) - F.col("id")
    ).otherwise(F.col("id"))
    words = F.transform(
        F.sequence(F.lit(0), F.lit(N_WORDS - 1)),
        lambda j: F.concat(
            F.lit("w"),
            F.pmod(F.xxhash64(seed * N_WORDS + j), F.lit(VOCAB)),
        ),
    )
    # hot boilerplate trigram stamped into the first N_HOT docs — the
    # skew case the max_df cap exists for
    text = F.when(
        F.col("id") < N_HOT,
        F.concat(F.lit("click here now "), F.array_join(words, " ")),
    ).otherwise(F.array_join(words, " "))
    docs = spark.range(N_DOCS).select(
        F.col("id").alias("doc_id"), text.alias("text")
    ).persist()
    docs.count()

    t0 = time.time()
    pairs = tfidf_cosine_pairs(docs, threshold=0.9, ngram=3, max_df=50)
    got = pairs.collect()
    wall = time.time() - t0
    planted = {(i, N_DOCS - 1 - i) for i in range(N_DUPS)}
    found = {(r["id_a"], r["id_b"]) for r in got}
    ones = sum(1 for r in got if r["cosine"] == 1.0)
    print(
        f"tfidf stress: {N_DOCS:,} docs ({N_HOT:,} stamped with a hot "
        f"trigram, capped) -> {len(got)} pairs >=0.9 in {wall:.1f}s; "
        f"planted recovered {len(planted & found)}/{N_DUPS}, "
        f"cosine==1.0 rows {ones}"
    )
    assert planted <= found, "planted duplicate pairs missing"
    spark.stop()


if __name__ == "__main__":
    main()
