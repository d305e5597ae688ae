"""Hard-negative candidate-path stress (VERDICT r8 #3): 100k anchors
against a 200k-vector corpus through hard_negatives(candidates=...).

What it proves: the wired candidate path replaces the broadcast
crossJoin with two equi-joins bounded by the candidate count, so an
anchor set far past broadcast size completes — the 100k × 200k brute
product (2·10¹⁰ dot products) is never formed. Candidates come from
lsh_topk (the documented producer shape); the result is checked for
dense per-anchor ranks, label-mismatch purity, and (on a sampled
anchor subset) equality with the brute path restricted to the same
candidates.

Run: PYTHONPATH=/root/repo python tools/stress_hardneg.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from spark_skew_join_spark.operators.similarity import hard_negatives, lsh_topk
from spark_skew_join_spark.sources.tables import get_spark


def main():
    n_corpus, n_anchors, dim, k = 200_000, 100_000, 32, 10
    spark = get_spark("stress_hardneg", cpus=32)
    corpus = spark.range(n_corpus).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda j: (F.pmod(F.xxhash64(F.col("id") * dim + j), F.lit(1000))
                       .cast("double") / 500.0 - 1.0).cast("float"),
        ).alias("embedding"),
        F.concat(F.lit("s"), F.pmod(F.col("id"), F.lit(4))).alias("label"),
    ).persist()
    corpus.count()
    anchors = corpus.where(F.col("vec_id") < n_anchors)

    t0 = time.time()
    # band_bits=12 → 4096 buckets/band ≈ 50 corpus rows per bucket on
    # the near-orthogonal synthetic vectors: ~8·50 candidates/anchor,
    # ~40M candidate pairs total instead of the 2·10¹⁰ brute product
    cand = lsh_topk(corpus, anchors, k=4 * k, dim=dim, n_bands=8,
                    band_bits=12, max_bucket_size=2000,
                    cache_bands="auto").persist()
    mined = hard_negatives(corpus, anchors, k=k, dim=dim, candidates=cand)
    n = mined.count()
    t1 = time.time()

    per_q = mined.groupBy("query_id").agg(
        F.count(F.lit(1)).alias("n"), F.max("rank").alias("maxr")
    )
    nq = per_q.count()
    sparse = per_q.where(F.col("n") != F.col("maxr")).count()
    mixed = mined.where(
        F.col("query_label").eqNullSafe(F.col("neighbor_label"))
    ).count()
    print(f"hard_negatives 100k-anchor stress: {n} mined rows over "
          f"{nq} anchors in {t1 - t0:.1f}s; non-dense ranks={sparse}, "
          f"same-label leaks={mixed}")
    assert sparse == 0 and mixed == 0

    # spot check vs an INDEPENDENT reference: numpy-rerank the exact
    # candidate pairs for 50 anchors and verify the operator returned a
    # valid top-k of them (ulp-tolerant at the k-th boundary — a brute
    # hard_negatives run cut at global top-k can legitimately MISS
    # low-ranked candidates, so it is not a sound reference here)
    import numpy as np

    few = anchors.where(F.col("vec_id") < 50)
    cand_few = cand.where(F.col("query_id") < 50).persist()
    via = hard_negatives(corpus, few, k=k, dim=dim, candidates=cand_few)
    pairs = {(r["query_id"], r["neighbor_id"]) for r in cand_few.collect()}
    ids = sorted({i for p in pairs for i in p})
    vecs = {
        r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64)
        for r in corpus.where(F.col("vec_id").isin(ids)).collect()
    }
    label = lambda v: v % 4  # the generation rule above

    def cos(a, b):
        na, nb = np.linalg.norm(a), np.linalg.norm(b)
        return 0.0 if na == 0 or nb == 0 else float(a @ b / (na * nb))

    got = {}
    for r in sorted(via.collect(), key=lambda r: (r["query_id"], r["rank"])):
        got.setdefault(r["query_id"], []).append(r["neighbor_id"])
    for q, got_ids in got.items():
        cands = [n for (qq, n) in pairs
                 if qq == q and label(n) != label(q) and n != q]
        ref = sorted(((cos(vecs[q], vecs[n]), n) for n in cands),
                     key=lambda t: (-t[0], t[1]))
        assert len(got_ids) == min(k, len(cands))
        assert all(label(n) != label(q) for n in got_ids)
        assert set(got_ids) <= set(cands)
        if len(ref) >= k:
            kth = ref[k - 1][0]
            worst = min(cos(vecs[q], vecs[n]) for n in got_ids)
            assert worst >= kth - 1e-9, (
                f"anchor {q}: returned set below the true candidate "
                f"top-{k} boundary"
            )
    print("spot check vs independent numpy rerank on 50 anchors: valid top-k")
    spark.stop()


if __name__ == "__main__":
    main()
