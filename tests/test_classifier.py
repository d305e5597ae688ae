"""Trainable hashed-n-gram logistic classifier (operators/classifier.py).

Three angles: (1) planted linearly-separable labels are learned to
perfect train accuracy, (2) the distributed GD fold is numerically
equivalent to a NumPy reference running the identical recurrence on the
identical features, (3) feature invariants (bias row, tf normalization,
empty-doc drop) hold.
"""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pyspark.sql.functions as F
import pytest

from spark_skew_join_spark.operators.classifier import (
    hashed_features,
    quality_classifier,
    score_logistic,
    train_logistic,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


@pytest.fixture(scope="module")
def planted(spark):
    # Class 1 speaks only {alpha..delta}, class 0 only {one..four}:
    # disjoint vocabularies => linearly separable in hashed-tf space
    # (64 buckets, 8 words: collision between the classes possible but
    # checked below to be absent for this vocab).
    pos = ["alpha beta gamma delta", "beta beta alpha gamma",
           "delta alpha alpha beta gamma", "gamma delta beta"]
    neg = ["one two three four", "two two one three",
           "four one one two three", "three four two"]
    rows = [(i, t) for i, t in enumerate(pos)] + [
        (100 + i, t) for i, t in enumerate(neg)
    ]
    return _docs(spark, rows)


def _bucket(tok: str, d: int = 64) -> int:
    return int(hashlib.md5(tok.encode()).hexdigest()[:8], 16) % d


def test_planted_vocab_has_no_cross_class_collisions():
    pos = {_bucket(t) for t in "alpha beta gamma delta".split()}
    neg = {_bucket(t) for t in "one two three four".split()}
    assert not (pos & neg)


def test_planted_separable_reaches_perfect_accuracy(spark, planted):
    out = quality_classifier(
        planted, F.col("doc_id") < 100, iters=12, lr=4.0
    ).collect()
    assert len(out) == 8
    assert all(r["pred"] == r["y"] for r in out)
    # scores actually separate, not border-hugging
    assert min(r["score"] for r in out if r["y"] == 1) > 0.6
    assert max(r["score"] for r in out if r["y"] == 0) < 0.4


def test_gd_matches_numpy_reference(spark, planted):
    d = 64
    feats = hashed_features(planted, n_buckets=d).withColumn(
        "y", (F.col("doc_id") < 100).cast("double")
    )
    w_spark = train_logistic(feats, n_buckets=d, iters=6, lr=2.0)

    rows = sorted(planted.collect(), key=lambda r: r["doc_id"])
    X = np.zeros((len(rows), d + 1))
    y = np.zeros(len(rows))
    for i, r in enumerate(rows):
        toks = r["text"].split()
        for t in toks:
            X[i, _bucket(t, d)] += 1.0
        X[i] /= len(toks)
        X[i, d] = 1.0
        y[i] = 1.0 if r["doc_id"] < 100 else 0.0
    w = np.zeros(d + 1)
    for _ in range(6):
        p = 1.0 / (1.0 + np.exp(-X @ w))
        w -= 2.0 * X.T @ (p - y) / len(rows)
    assert np.max(np.abs(np.array(w_spark) - w)) < 1e-9


def test_feature_invariants(spark):
    docs = _docs(
        spark, [(1, "aa bb aa"), (2, ""), (3, "   "), (4, "cc")]
    )
    got = {r["doc_id"]: r for r in hashed_features(docs).collect()}
    # empty / whitespace-only docs dropped
    assert set(got) == {1, 4}
    f1 = got[1]["fmap"]
    assert got[1]["n_tok"] == 3
    # bias present and exactly 1.0
    assert f1[64] == 1.0
    # tf normalization: aa=2/3, bb=1/3
    assert math.isclose(f1[_bucket("aa")], 2 / 3)
    assert math.isclose(f1[_bucket("bb")], 1 / 3)
    # non-bias mass sums to 1
    assert math.isclose(
        sum(v for k, v in f1.items() if k != 64), 1.0
    )


def test_score_logistic_rounding_and_bias_only(spark):
    docs = _docs(spark, [(1, "zz")])
    feats = hashed_features(docs)
    w = [0.0] * 65
    w[64] = 1.0
    w[_bucket("zz")] = -1.0
    # margin = 1*(-1) + 1*1 = 0 -> sigmoid = 0.5 exactly
    row = score_logistic(feats, w).collect()[0]
    assert row["score"] == 0.5


def test_train_rejects_empty_and_bad_args(spark):
    docs = _docs(spark, [(1, "")])
    feats = hashed_features(docs).withColumn("y", F.lit(1.0))
    with pytest.raises(ValueError):
        train_logistic(feats, n_buckets=64, iters=0)
    with pytest.raises(ValueError):
        train_logistic(feats, n_buckets=64)  # zero rows survive


def test_calibration_sweep_hand_counts(spark):
    """Confusion counts and PR/F1 at a hand-checkable threshold grid;
    NULL precision when nothing clears the cut."""
    from spark_skew_join_spark.operators.classifier import calibration_sweep

    scored = spark.createDataFrame(
        [(1, 1, 0.95, 1), (2, 1, 0.55, 1), (3, 0, 0.45, 0),
         (4, 0, 0.05, 0), (5, 1, 0.25, 0)],
        "doc_id long, y int, score double, pred int",
    )
    rows = {r["threshold"]: r for r in calibration_sweep(scored).collect()}
    assert len(rows) == 9
    r5 = rows[0.5]
    assert (r5["tp"], r5["fp"], r5["fn"], r5["tn"]) == (2, 0, 1, 2)
    assert r5["precision"] == 1.0
    assert r5["recall"] == round(2 / 3, 6)
    assert r5["f1"] == round(4 / 5, 6)
    r1 = rows[0.1]
    assert (r1["tp"], r1["fp"]) == (3, 1)
    # nothing scores >= 0.97 -> empty denominator -> NULL precision
    none_row = calibration_sweep(
        scored.where("score < 0.1")
    ).collect()
    hi = [r for r in none_row if r["threshold"] == 0.9][0]
    assert hi["precision"] is None and hi["tp"] == 0
