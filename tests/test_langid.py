"""Supervised softmax language-ID (operators/langid.py)."""

from __future__ import annotations

import random

import pytest

from spark_skew_join_spark.operators.langid import (
    char_hashed_features,
    langid_classifier,
    langid_eval,
    train_softmax,
)


def _planted(spark, n_per=40, seed=7):
    """Three synthetic 'languages' with disjoint character alphabets —
    char bigrams separate them perfectly, so a working trainer must
    recover (near-)perfect predictions."""
    alphabets = {
        "aa": "abcde",
        "bb": "klmno",
        "cc": "uvwxy",
    }
    rng = random.Random(seed)
    rows = []
    i = 0
    for lang, alpha in alphabets.items():
        for _ in range(n_per):
            words = [
                "".join(rng.choice(alpha) for _ in range(rng.randint(3, 7)))
                for _ in range(rng.randint(8, 15))
            ]
            rows.append((i, " ".join(words), lang))
            i += 1
    return spark.createDataFrame(rows, "doc_id bigint, text string, lang string")


def test_planted_languages_recovered(spark):
    docs = _planted(spark)
    out = langid_classifier(docs, n_buckets=64, iters=6, lr=4.0).collect()
    assert len(out) == 120
    acc = sum(r["y"] == r["pred"] for r in out) / len(out)
    assert acc >= 0.95, acc
    for r in out:
        assert 0.0 <= r["p_pred"] <= 1.0


def test_eval_counts_and_metrics(spark):
    docs = _planted(spark)
    scored = langid_classifier(docs, n_buckets=64, iters=6, lr=4.0)
    ev = {r["lang"]: r for r in langid_eval(scored).collect()}
    assert set(ev) == {"aa", "bb", "cc"}
    for lang, r in ev.items():
        assert r["n_docs"] == 40
        assert r["tp"] + r["fn"] == 40
        # confusion identities hold regardless of model quality
        if r["tp"] + r["fp"] > 0:
            assert r["precision"] == pytest.approx(
                round(r["tp"] / (r["tp"] + r["fp"]), 6)
            )
        assert r["recall"] == pytest.approx(round(r["tp"] / 40, 6))


def test_feature_maps_shape_and_bias(spark):
    docs = spark.createDataFrame(
        [(1, "abca"), (2, "x")], "doc_id bigint, text string"
    )
    rows = {r["doc_id"]: r for r in
            char_hashed_features(docs, n_buckets=16, n=2).collect()}
    # doc 2 is shorter than the gram width -> dropped
    assert set(rows) == {1}
    fmap = rows[1]["fmap"]
    assert rows[1]["n_gram"] == 3  # ab, bc, ca
    assert fmap[16] == 1.0  # bias bucket
    assert abs(sum(v for k, v in fmap.items() if k < 16) - 1.0) < 1e-9


def test_tie_break_is_smallest_class_index(spark):
    # two identical classes -> identical margins -> rounded probs tie
    # on every doc; pred must be the alphabetically-first label
    rows = [(i, "aaaa bbbb", "zz" if i % 2 else "mm") for i in range(20)]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string, lang string")
    out = langid_classifier(docs, n_buckets=16, iters=2, lr=1.0).collect()
    assert {r["pred"] for r in out} == {"mm"}


def test_errors(spark):
    docs = spark.createDataFrame(
        [(1, "abc", "aa")], "doc_id bigint, text string, lang string"
    )
    with pytest.raises(ValueError):
        langid_classifier(docs)  # single class
    feats = char_hashed_features(docs, n_buckets=16)
    with pytest.raises(ValueError):
        train_softmax(feats.withColumn("y", feats.n_gram * 0), iters=0)
    with pytest.raises(ValueError):
        char_hashed_features(docs, n_buckets=1)


def test_tf_counts_fold_validates_divisibility(spark):
    """ADVICE r13 #1: folding a shared tf table to a NON-divisor
    bucket count is silently wrong (bucket % m != md5 % m) — the
    classifier must refuse, using the base count char_tf_counts
    stamps on the bucket column."""
    from spark_skew_join_spark.operators.langid import char_tf_counts

    docs = spark.createDataFrame(
        [(1, "abcd", "aa"), (2, "wxyz", "bb")],
        "doc_id bigint, text string, lang string",
    )
    tf = char_tf_counts(docs, n_buckets=128)
    assert tf.schema["bucket"].metadata["base_buckets"] == 128
    with pytest.raises(ValueError, match="does not divide"):
        langid_classifier(docs, tf_counts=tf, n_buckets=100, iters=1)
    # a table missing the metadata stamp is rejected too
    bare = tf.withColumn("bucket", tf.bucket + 0)
    with pytest.raises(ValueError, match="base_buckets"):
        langid_classifier(docs, tf_counts=bare, n_buckets=64, iters=1)
    # divisor folds still work end-to-end
    out = langid_classifier(docs, tf_counts=tf, n_buckets=64, iters=1)
    assert out.count() == 2


def test_gram_positions_follow_lowered_length(spark):
    """ADVICE r13: lower() grows U+0130 to two codepoints; gram
    positions must come from the LOWERED text so the tail grams are
    neither dropped nor shifted."""
    from spark_skew_join_spark.operators.langid import char_tf_counts

    docs = spark.createDataFrame(
        [(1, "İB", "x")], "doc_id bigint, text string, lang string"
    )
    rows = char_tf_counts(docs, n_buckets=16, n=2).collect()
    # lowered text is 3 chars -> 2 bigrams (the old raw-length code
    # produced only 1)
    assert rows and rows[0]["n_gram"] == 2
