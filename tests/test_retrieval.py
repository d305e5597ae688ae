"""BM25 retrieval pinned against a pure-Python reference."""

from __future__ import annotations

import math

import pytest

from spark_skew_join_spark.operators.retrieval import bm25_topk

CORPUS = [
    (1, "spark join spark window table"),
    (2, "join join join filter scan"),
    (3, "window window window window window window window window"),
    (4, "table scan filter merge batch"),
    (5, "spark"),
    (6, "the a the a the a join"),
]


def _reference(query, k1=1.2, b=0.75):
    docs = {i: t.split(" ") for i, t in CORPUS}
    n = len(docs)
    avgdl = sum(len(t) for t in docs.values()) / n
    scores = {}
    for term in query:
        df = sum(1 for t in docs.values() if term in t)
        if df == 0:
            continue
        idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
        for i, toks in docs.items():
            tf = toks.count(term)
            if tf == 0:
                continue
            dl = len(toks)
            norm = tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))
            scores[i] = scores.get(i, 0.0) + idf * norm
    return scores


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(CORPUS, "doc_id bigint, text string")


def test_scores_match_reference(spark, docs_df):
    query = ["spark", "join", "window"]
    got = {r["doc_id"]: r["score"] for r in
           bm25_topk(docs_df, query, k=10).collect()}
    want = _reference(query)
    assert set(got) == set(want)
    for i, s in want.items():
        assert got[i] == pytest.approx(s, abs=1e-6)


def test_topk_cut_and_order(spark, docs_df):
    query = ["join"]
    rows = bm25_topk(docs_df, query, k=2).collect()
    want = sorted(
        _reference(query).items(), key=lambda kv: (-round(kv[1], 6), kv[0])
    )[:2]
    assert [r["doc_id"] for r in rows] == [i for i, _ in want]
    # matched counts distinct query terms present, dl the token length
    assert rows[0]["matched"] == 1
    assert {r["doc_id"]: r["dl"] for r in rows} == {
        i: len(dict(CORPUS)[i].split(" ")) for i, _ in want
    }


def test_absent_term_contributes_nothing(spark, docs_df):
    with_junk = {r["doc_id"]: r["score"] for r in
                 bm25_topk(docs_df, ["spark", "zzz_absent"], k=10).collect()}
    alone = {r["doc_id"]: r["score"] for r in
             bm25_topk(docs_df, ["spark"], k=10).collect()}
    assert with_junk == alone


def test_empty_query_rejected(spark, docs_df):
    with pytest.raises(ValueError):
        bm25_topk(docs_df, [])


# -- reciprocal-rank fusion -------------------------------------------

def test_rrf_hand_computed(spark):
    from spark_skew_join_spark.operators.retrieval import rrf_fuse

    lex = spark.createDataFrame(
        [(0, 10, 1), (0, 11, 2), (0, 12, 3)], "query_id int, doc_id int, rank int"
    )
    vec = spark.createDataFrame(
        [(0, 11, 1), (0, 13, 2)], "query_id int, doc_id int, rank int"
    )
    out = {r["doc_id"]: r for r in
           rrf_fuse({"lex": lex, "vec": vec}, k=10).collect()}
    # doc 11: both rankers -> 1/62 + 1/61; doc 10: 1/61; doc 13: 1/62
    assert out[11]["n_rankers"] == 2
    assert abs(out[11]["rrf_score"] - round(1 / 62 + 1 / 61, 6)) < 1e-9
    assert out[11]["rank"] == 1  # consensus beats either single ranker
    assert out[10]["rank"] == 2 and out[10]["n_rankers"] == 1
    assert out[13]["rank"] == 3


def test_rrf_three_rankers_deterministic_and_k_cut(spark):
    from spark_skew_join_spark.operators.retrieval import rrf_fuse

    dfs = {
        name: spark.createDataFrame(
            [(0, d, r + 1) for r, d in enumerate(perm)],
            "query_id int, doc_id int, rank int",
        )
        for name, perm in [
            ("a", [1, 2, 3, 4]), ("b", [2, 1, 4, 3]), ("c", [3, 4, 1, 2]),
        ]
    }
    out = rrf_fuse(dfs, k=2).collect()
    assert len(out) == 2 and all(r["n_rankers"] == 3 for r in out)
    again = rrf_fuse(dfs, k=2).collect()
    assert out == again


def test_bm25_multi_matches_single_per_query(spark, docs_df):
    """bm25_topk_multi must reproduce a per-query bm25_topk loop exactly
    (same arithmetic, same rounded-score cut) — it only batches the
    corpus passes (VERDICT r7 #3)."""
    from spark_skew_join_spark.operators.retrieval import (
        bm25_topk, bm25_topk_multi,
    )

    queries = {0: ["spark", "join"], 1: ["data", "spark"]}
    multi = bm25_topk_multi(docs_df, queries, k=5)
    got = {
        (r["query_id"], r["rank"]): (r["doc_id"], r["dl"], r["matched"],
                                     r["score"])
        for r in multi.collect()
    }
    for qid, ts in queries.items():
        solo = bm25_topk(docs_df, ts, k=5).collect()
        for rank, r in enumerate(solo, start=1):
            assert got[(qid, rank)] == (
                r["doc_id"], r["dl"], r["matched"], r["score"]
            ), f"qid={qid} rank={rank}"
    assert len(got) == sum(
        min(5, bm25_topk(docs_df, ts, k=5).count()) for ts in queries.values()
    )
