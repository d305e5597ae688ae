"""Driver-side GD fast path (r15, VERDICT r14 next-round #1).

When the labeled feature relation fits DRIVER_TRAIN_MAX_BYTES, the
quality/langid classifiers collect it once and replay the IDENTICAL
training recurrence in numpy instead of running 1 count + iters gradient
collects + a relational scoring pass. These tests pin:

* rounded round-6 outputs EXACTLY equal between the two paths,
* the rounding helper exactly matches Spark's ROUND(double, 6),
* the gate: tiny inputs take the driver path, driver_train_max_bytes=0
  forces the relational loop.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from spark_skew_join_spark.operators.classifier import (
    _round6_half_up,
    quality_classifier,
)
from spark_skew_join_spark.operators.langid import langid_classifier


@pytest.fixture(scope="module")
def corpus(spark):
    # mixed vocab + lengths so scores spread over (0, 1) and the two
    # paths must agree on many distinct rounded values
    words_a = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]
    words_b = ["one", "two", "three", "four", "xy"]
    rows = []
    for i in range(80):
        pool = words_a if i % 2 else words_b
        ws = [pool[(i + j) % len(pool)] for j in range(3 + i % 6)]
        rows.append((i, " ".join(ws)))
    return spark.createDataFrame(rows, "doc_id bigint, text string")


@pytest.fixture(scope="module")
def langid_corpus(spark):
    import random

    alphabets = {"aa": "abcde", "bb": "klmno", "cc": "uvwxy"}
    rng = random.Random(11)
    rows, i = [], 0
    for lang, alpha in alphabets.items():
        for _ in range(30):
            words = [
                "".join(rng.choice(alpha) for _ in range(rng.randint(3, 7)))
                for _ in range(rng.randint(6, 12))
            ]
            rows.append((i, " ".join(words), lang))
            i += 1
    return spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string"
    )


def test_round6_matches_spark_round(spark):
    """_round6_half_up must reproduce Spark's ROUND(double, 6)
    (BigDecimal(Double.toString(x)).setScale(6, HALF_UP)) exactly —
    including the classic shortest-repr traps."""
    vals = [
        0.5, 0.1234565, 0.1234575, 2.675, 0.0000005, 0.9999995,
        1.0 / 3.0, 2.0 / 3.0, 0.30000000000000004, 0.1 + 0.2,
        1e-7, 9.9999994e-1, 0.5000004999999999, 0.50000050000001,
    ] + [1.0 / (1.0 + 2.718281828459045 ** (-x / 7.0)) for x in range(-40, 41)]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    got = [r["r"] for r in
           df.select(F.round("x", 6).alias("r")).collect()]
    want = [_round6_half_up(v) for v in vals]
    assert got == want


def test_quality_driver_path_matches_relational(spark, corpus):
    label = F.length("text") % 2 == 0
    fast_df = quality_classifier(corpus, label, iters=6, lr=2.0)
    slow_df = quality_classifier(
        corpus, label, iters=6, lr=2.0, driver_train_max_bytes=0
    )
    # the gate actually picked different paths: relational scoring
    # reads the broadcast __w relation, the driver path has no join
    assert "__w" not in fast_df._jdf.queryExecution().analyzed().toString()
    assert "__w" in slow_df._jdf.queryExecution().analyzed().toString()
    fast = [tuple(r) for r in fast_df.collect()]
    slow = [tuple(r) for r in slow_df.collect()]
    assert fast == slow
    assert len(fast) == 80


def test_langid_driver_path_matches_relational(spark, langid_corpus):
    kw = dict(n_buckets=64, iters=4, lr=4.0)
    fast_df = langid_classifier(langid_corpus, **kw)
    slow_df = langid_classifier(
        langid_corpus, driver_train_max_bytes=0, **kw
    )
    assert "__w0" not in fast_df._jdf.queryExecution().analyzed().toString()
    assert "__w0" in slow_df._jdf.queryExecution().analyzed().toString()
    fast = [tuple(r) for r in fast_df.collect()]
    slow = [tuple(r) for r in slow_df.collect()]
    assert fast == slow
    assert len(fast) == 90


def test_langid_driver_tie_break_smallest_class(spark):
    # two identical classes -> identical margins -> rounded probs tie
    # on every doc; pred must be the alphabetically-first label in the
    # driver path exactly as in the relational path
    rows = [(i, "aaaa bbbb", "zz" if i % 2 else "mm") for i in range(20)]
    docs = spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string"
    )
    out = langid_classifier(docs, n_buckets=16, iters=2, lr=1.0).collect()
    assert {r["pred"] for r in out} == {"mm"}


def test_quality_gate_estimate_scales(spark, corpus):
    # a threshold below any plausible estimate forces the relational
    # loop; the default lets an 80-doc corpus through
    label = F.length("text") % 2 == 0
    slow_df = quality_classifier(
        corpus, label, iters=2, lr=2.0, driver_train_max_bytes=1
    )
    assert "__w" in slow_df._jdf.queryExecution().analyzed().toString()
