"""corpus_stats operators: n-gram diversity and Zipf/vocab fingerprint."""

from __future__ import annotations

import math

import pytest

from spark_skew_join_spark.operators.corpus_stats import (
    ngram_diversity,
    zipf_vocab_stats,
)


def test_ngram_diversity_hand_computed(spark):
    docs = spark.createDataFrame(
        [
            # source A: "a b a b" -> bigrams (a,b),(b,a),(a,b):
            # total 3, distinct 2, singletons 1
            (1, "a b a b", "A"),
            # source B: two docs, all-distinct bigrams
            (2, "x y z", "B"),   # (x,y),(y,z)
            (3, "p q", "B"),     # (p,q)
            # one-token doc contributes nothing
            (4, "solo", "B"),
        ],
        "doc_id bigint, text string, source string",
    )
    got = {
        r["source"]: r.asDict()
        for r in ngram_diversity(docs, n=2).collect()
    }
    assert got["A"]["total_ngrams"] == 3
    assert got["A"]["distinct_ngrams"] == 2
    assert got["A"]["type_token_ratio"] == round(2 / 3, 6)
    assert got["A"]["singleton_share"] == 0.5
    assert got["B"]["total_ngrams"] == 3
    assert got["B"]["distinct_ngrams"] == 3
    assert got["B"]["singleton_share"] == 1.0
    with pytest.raises(ValueError):
        ngram_diversity(docs, n=0)


def test_zipf_vocab_stats_hand_computed(spark):
    # corpus: a x4, b x2, c x1, d x1 -> N=8, V=4, singletons 2/4
    docs = spark.createDataFrame(
        [(1, "a a b c"), (2, "a a b d")], "doc_id bigint, text string"
    )
    row = zipf_vocab_stats(docs, top_k=3).collect()[0]
    assert row["n_tokens"] == 8
    assert row["vocab_size"] == 4
    assert row["singleton_share"] == 0.5
    # top-3 coverage: 4 + 2 + 1 of 8
    assert row["topk_coverage"] == round(7 / 8, 6)
    # OLS slope over (ln r, ln c) for top-3; the count ranking is
    # unambiguous except ranks 3-4 (c=1 tie) — both have ln(c)=0, so
    # the slope is tie-invariant (the operator's contract)
    xs = [math.log(r) for r in (1, 2, 3)]
    ys = [math.log(c) for c in (4, 2, 1)]
    n = 3
    sx, sy = sum(xs), sum(ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    sxx = sum(x * x for x in xs)
    want = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    assert row["zipf_slope"] == round(want, 6)
    with pytest.raises(ValueError):
        zipf_vocab_stats(docs, top_k=1)


def test_normalize_text_and_normalized_dedup(spark):
    from pyspark.sql import functions as F

    from spark_skew_join_spark.functions.text import normalize_text
    from spark_skew_join_spark.operators.dedup import exact_dedup

    docs = spark.createDataFrame(
        [
            (1, "Hello, World!"),
            (2, "hello   world"),
            (3, "HELLO world."),
            (4, "goodbye world"),
        ],
        "doc_id bigint, text string",
    )
    n = docs.withColumn("norm", normalize_text(F.col("text")))
    got = {r["doc_id"]: r["norm"] for r in n.collect()}
    assert got[1] == got[2] == got[3] == "hello world"
    assert got[4] == "goodbye world"
    groups = exact_dedup(n, text_col="norm").collect()
    by_rep = {r["rep_id"]: r["dup_count"] for r in groups}
    assert by_rep == {1: 3, 4: 1}


def test_cdc_chunks_shift_resistant_vs_fixed_windows(spark):
    """The content-defined property: prepending text to a document
    perturbs only the leading chunks; the tail chunks keep their exact
    text (and therefore their dedup hashes / embeddings / cache
    entries). Fixed windows shift EVERY boundary — the contrast this
    operator exists for."""
    import random

    from spark_skew_join_spark.functions.text import cdc_chunks, chunk_documents

    rng = random.Random(17)
    body = " ".join(f"tok{rng.randrange(500)}" for _ in range(400))
    docs = spark.createDataFrame(
        [(1, body), (2, "inserted preamble goes here " + body)],
        "doc_id bigint, text string",
    )
    cdc = cdc_chunks(docs, gram=4, avg_tokens=16).collect()
    by_doc = {1: set(), 2: set()}
    for r in cdc:
        by_doc[r["doc_id"]].add(r["chunk_text"])
    shared = by_doc[1] & by_doc[2]
    # nearly all of doc 1's chunks survive the prefix edit verbatim
    assert len(shared) >= 0.8 * len(by_doc[1]), (
        len(shared), len(by_doc[1]))

    fixed = chunk_documents(docs, chunk_tokens=16, overlap=0).collect()
    fx = {1: set(), 2: set()}
    for r in fixed:
        fx[r["doc_id"]].add(r["chunk_text"])
    # the 4-token prefix shifts every 16-token grid boundary
    assert len(fx[1] & fx[2]) <= 0.1 * len(fx[1])


def test_cdc_chunks_cover_and_validate(spark):
    from spark_skew_join_spark.functions.text import cdc_chunks

    docs = spark.createDataFrame(
        [(1, "a b c d e f g h i j")], "doc_id bigint, text string"
    )
    rows = sorted(
        cdc_chunks(docs, gram=2, avg_tokens=2).collect(),
        key=lambda r: r["chunk_id"],
    )
    # chunks tile the token range exactly: contiguous, complete
    assert rows[0]["start_tok"] == 1
    total = sum(r["n_tokens"] for r in rows)
    assert total == 10
    for prev, cur in zip(rows, rows[1:]):
        assert cur["start_tok"] == prev["start_tok"] + prev["n_tokens"]
    assert " ".join(r["chunk_text"] for r in rows) == "a b c d e f g h i j"
    with pytest.raises(ValueError):
        cdc_chunks(docs, gram=0)
    with pytest.raises(ValueError):
        cdc_chunks(docs, avg_tokens=1)
    with pytest.raises(ValueError):
        cdc_chunks(docs, hash_fn="sha1")


def test_zipf_slope_near_minus_one_on_zipf_corpus(spark):
    """A synthetic corpus drawn from an exact Zipf pmf should fit
    s ≈ -1; a uniform corpus should fit s ≈ 0 — the separation the
    operator exists to detect."""
    from pyspark.sql import functions as F

    # frequencies proportional to 1/r for 50 'words', materialized
    # exactly: word r repeated floor(1000/r) times
    rows = []
    for r in range(1, 51):
        rows.extend([(f"w{r}",)] * (1000 // r))
    zipf = spark.createDataFrame(rows, "text string").agg(
        F.concat_ws(" ", F.collect_list("text")).alias("text")
    ).select(F.lit(1).alias("doc_id"), "text")
    s_zipf = zipf_vocab_stats(zipf, top_k=50).collect()[0]["zipf_slope"]
    assert -1.15 < s_zipf < -0.85, s_zipf

    uni = spark.createDataFrame(
        [(1, " ".join(f"u{i}" for i in range(200)) * 1)],
        "doc_id bigint, text string",
    )
    s_uni = zipf_vocab_stats(uni, top_k=50).collect()[0]["zipf_slope"]
    assert abs(s_uni) < 1e-9, s_uni
