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
