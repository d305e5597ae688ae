"""DSIR importance weighting (operators/dsir.py): planted-domain
separation, gram accounting, both hash paths."""

import random

import pytest

from spark_skew_join_spark.operators.dsir import (
    hashed_gram_buckets,
    importance_weights,
)

MED = [f"med{i}" for i in range(30)]   # "target domain" vocabulary
WEB = [f"web{i}" for i in range(30)]


def _doc(rng, vocab, n=40):
    return " ".join(rng.choice(vocab) for _ in range(n))


@pytest.mark.parametrize("hash_fn", ["xxhash64", "md5"])
def test_target_domain_docs_score_higher(spark, hash_fn):
    rng = random.Random(3)
    rows = []
    for i in range(30):            # corpus: 10 medical, 20 web
        vocab = MED if i < 10 else WEB
        rows.append((i, _doc(rng, vocab)))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    target = docs.where("doc_id < 5")   # a trusted medical sample
    out = {r["doc_id"]: r["log_weight"] for r in
           importance_weights(docs, target, hash_fn=hash_fn).collect()}
    assert len(out) == 30
    med_w = [out[i] for i in range(10)]
    web_w = [out[i] for i in range(10, 30)]
    # every medical doc outranks every web doc under the target model
    assert min(med_w) > max(web_w)
    assert all(w > 0 for w in med_w) and all(w < 0 for w in web_w)


def test_gram_accounting_and_bucket_range(spark):
    df = spark.createDataFrame(
        [(0, "a b c"), (1, "x")], "doc_id long, text string"
    )
    b = hashed_gram_buckets(df, n_buckets=16).collect()
    per_doc = {}
    for r in b:
        assert 0 <= r["bucket"] < 16
        per_doc[r["doc_id"]] = per_doc.get(r["doc_id"], 0) + r["cnt"]
    # 3 unigrams + 2 bigrams; single-token doc has no bigrams
    assert per_doc == {0: 5, 1: 1}
    no_bi = hashed_gram_buckets(df, n_buckets=16, include_bigrams=False)
    assert sum(r["cnt"] for r in no_bi.collect()) == 4


def test_unknown_hash_fn_raises(spark):
    df = spark.createDataFrame([(0, "a")], "doc_id long, text string")
    with pytest.raises(ValueError, match="hash_fn"):
        hashed_gram_buckets(df, hash_fn="sha1").collect()


def test_dsir_resample_top_k_matches_python_reference(spark):
    """top_k selects exactly the k largest log-weights with doc_id
    tiebreak — verified against a driver-side sort of the full table."""
    from spark_skew_join_spark.operators.dsir import dsir_resample

    rows = [(i, float((i * 37) % 100) / 10.0 - 5.0) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, log_weight double")
    got = sorted(r["doc_id"] for r in
                 dsir_resample(df, k=25, method="top_k").collect())
    want = sorted(d for d, _ in
                  sorted(rows, key=lambda r: (-r[1], r[0]))[:25])
    assert got == want


def test_dsir_resample_gumbel_deterministic_and_weight_biased(spark):
    """Gumbel-top-k: (a) the sampled set is identical across runs and
    partitionings (md5-derived noise, no RNG state); (b) selection is
    biased toward high weights — the high-weight half must dominate."""
    from spark_skew_join_spark.operators.dsir import dsir_resample

    # half the docs get log_w = +3, half -3: softmax odds e^6 ≈ 400:1
    rows = [(i, 3.0 if i % 2 == 0 else -3.0) for i in range(400)]
    df = spark.createDataFrame(rows, "doc_id long, log_weight double")
    one = sorted(r["doc_id"] for r in
                 dsir_resample(df, k=100, method="gumbel").collect())
    two = sorted(r["doc_id"] for r in
                 dsir_resample(df.repartition(13), k=100,
                               method="gumbel").collect())
    assert one == two
    high = sum(1 for d in one if d % 2 == 0)
    assert high >= 95, high  # ~99.75% expected from the e^6 odds

    # temperature → 0 approaches hard top-k of the weights
    cold = {r["doc_id"] for r in
            dsir_resample(df, k=100, method="gumbel",
                          temperature=1e-6).collect()}
    assert all(d % 2 == 0 for d in cold)

    import pytest

    with pytest.raises(ValueError, match="method"):
        dsir_resample(df, k=5, method="uniform")
