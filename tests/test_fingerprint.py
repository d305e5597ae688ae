"""Winnowing fingerprint operator: coverage guarantee, density, rolling
parity, cap behavior, and the repetition signal."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from spark_skew_join_spark.operators.fingerprint import (
    fingerprint_overlap_pairs,
    kgram_hashes,
    winnow_fingerprints,
)
from spark_skew_join_spark.operators.quality import duplicate_ngram_fraction

K, W = 8, 4


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _rand_text(rng, n):
    return "".join(rng.choice("abcdefghijklmnopqrstuvwxyz ") for _ in range(n))


def test_winnow_guarantee_shared_substring(spark):
    """Docs sharing a substring of length >= w + k - 1 MUST share a fp
    (the winnowing theorem) — for every such planted pair."""
    rng = random.Random(7)
    shared = _rand_text(rng, K + W - 1 + 20)  # comfortably above threshold
    rows = [
        (1, _rand_text(rng, 120) + shared + _rand_text(rng, 80)),
        (2, shared + _rand_text(rng, 150)),
        (3, _rand_text(rng, 200)),  # no planted overlap
    ]
    fps = winnow_fingerprints(_docs(spark, rows), k=K, w=W)
    by_doc = {
        r.doc_id: set(r.s)
        for r in fps.groupBy("doc_id").agg(F.collect_set("fp").alias("s")).collect()
    }
    assert by_doc[1] & by_doc[2], "planted overlap must share a fingerprint"


def test_winnow_density(spark):
    """Selected positions ~ 2/(w+1) of grams; distinct fps bounded by that
    (loose band — winnowing is expected sublinear, not exact)."""
    rng = random.Random(11)
    rows = [(i, _rand_text(rng, 1000)) for i in range(5)]
    df = _docs(spark, rows)
    n_grams = kgram_hashes(df, k=K).count()
    n_fps = winnow_fingerprints(df, k=K, w=W).count()
    frac = n_fps / n_grams
    assert 0.1 < frac < 0.6, frac  # theory: ~2/(w+1) = 0.4 before distinct


def test_rolling_same_shape_and_guarantee(spark):
    """Karp-Rabin path: same (id,pos) domain as the md5 path and the same
    coverage guarantee (values differ by design)."""
    rng = random.Random(13)
    shared = _rand_text(rng, K + W - 1 + 10)
    rows = [
        (1, _rand_text(rng, 90) + shared),
        (2, shared + _rand_text(rng, 90)),
    ]
    df = _docs(spark, rows)
    md5_pos = set(map(tuple, kgram_hashes(df, k=K).select("doc_id", "pos").collect()))
    kr_pos = set(
        map(tuple, kgram_hashes(df, k=K, rolling=True).select("doc_id", "pos").collect())
    )
    assert md5_pos == kr_pos
    fps = winnow_fingerprints(df, k=K, w=W, rolling=True)
    by_doc = {
        r.doc_id: set(r.s)
        for r in fps.groupBy("doc_id").agg(F.collect_set("fp").alias("s")).collect()
    }
    assert by_doc[1] & by_doc[2]


def test_rolling_hash_window_values(spark):
    """Karp-Rabin recurrence check: each position's hash equals the
    direct polynomial evaluation of its gram."""
    from spark_skew_join_spark.operators.fingerprint import _KR_BASE, _KR_MOD

    text = "abcdefghij"
    rows = kgram_hashes(_docs(spark, [(1, text)]), k=3, rolling=True).collect()
    for r in sorted(rows, key=lambda r: r.pos):
        gram = text[r.pos - 1 : r.pos + 2]
        expect = 0
        for ch in gram:
            expect = (expect * _KR_BASE + ord(ch)) % _KR_MOD
        assert r.h == expect, (r.pos, gram)


def test_overlap_cap_drops_boilerplate(spark):
    """A fingerprint present in > cap docs must not generate pairs."""
    rng = random.Random(17)
    boiler = _rand_text(rng, 40)  # shared by ALL docs -> over any small cap
    rows = [(i, boiler + _rand_text(rng, 60)) for i in range(10)]
    fps = winnow_fingerprints(_docs(spark, rows), k=K, w=W)
    pairs = fingerprint_overlap_pairs(fps, min_shared=1, max_docs_per_fp=5)
    boiler_fps = (
        fps.groupBy("fp").count().where(F.col("count") > 5).count()
    )
    assert boiler_fps > 0  # the boilerplate really is over-cap
    # pairs may still exist from the random tails, but none may be
    # explained only by over-cap fps: rebuild pairs from kept fps and
    # compare (the operator must equal the post-filter self-join)
    kept = fps.join(
        fps.groupBy("fp").count().where(F.col("count") <= 5).select("fp"), "fp"
    )
    a = kept.select("fp", F.col("doc_id").alias("id_a"))
    b = kept.select("fp", F.col("doc_id").alias("id_b"))
    expect = (
        a.join(b, "fp")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .count()
        .count()
    )
    assert pairs.count() == expect


def test_short_docs_excluded(spark):
    rows = [(1, "tiny"), (2, "x" * (K - 1)), (3, "y" * (K + W))]
    fps = winnow_fingerprints(_docs(spark, rows), k=K, w=W)
    ids = {r.doc_id for r in fps.select("doc_id").distinct().collect()}
    assert ids == {3}


def test_duplicate_ngram_fraction(spark):
    rows = [
        (1, "a b a b a b"),  # 2-grams: ab ba ab ba ab -> 5 total, 2 distinct
        (2, "u v w x y z"),  # all distinct
    ]
    out = {
        r.doc_id: r.f
        for r in duplicate_ngram_fraction(
            _docs(spark, rows), "doc_id", "text", 2, "f"
        ).collect()
    }
    assert out[1] == pytest.approx(1 - 2 / 5)
    assert out[2] == 0.0
