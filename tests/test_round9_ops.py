"""Round-9 operator units: tfidf_cosine_pairs, ndcg_at_k, bigram LM."""
import math

import pytest

from pyspark.sql import functions as F

from spark_skew_join_spark.operators.retrieval import (
    ndcg_at_k,
    tfidf_cosine_pairs,
)


def test_tfidf_cosine_identical_and_disjoint(spark):
    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta"),
            (2, "alpha beta gamma delta epsilon zeta"),  # identical → 1.0
            (3, "one two three four five six"),           # disjoint  → none
            (4, "x y"),                                    # < 3 words → no vector
        ],
        "doc_id bigint, text string",
    )
    got = {(r["id_a"], r["id_b"]): r["cosine"]
           for r in tfidf_cosine_pairs(docs, threshold=0.3, ngram=3).collect()}
    assert got == {(1, 2): 1.0}


def test_tfidf_cosine_max_df_drops_stop_phrases(spark):
    # the only shared-weight trigram between docs 1 and 2 has df=2
    # (df=3 trigrams already weigh ln(3/3)=0); max_df=1 removes it from
    # vectors AND norms, so the pair list collapses to 0 rows
    docs = spark.createDataFrame(
        [
            (1, "common one two three private alpha beta gamma"),
            (2, "common one two three private delta epsilon zeta"),
            (3, "common one two three other words here now"),
        ],
        "doc_id bigint, text string",
    )
    loose = tfidf_cosine_pairs(docs, threshold=0.02, ngram=3, max_df=50)
    strict = tfidf_cosine_pairs(docs, threshold=0.02, ngram=3, max_df=1)
    assert loose.count() > strict.count()


def test_tfidf_cosine_rejects_bad_params(spark):
    docs = spark.createDataFrame([(1, "a b c")], "doc_id bigint, text string")
    with pytest.raises(ValueError):
        tfidf_cosine_pairs(docs, threshold=0.0)
    with pytest.raises(ValueError):
        tfidf_cosine_pairs(docs, threshold=0.5, ngram=0)


def test_ndcg_known_values(spark):
    run = spark.createDataFrame(
        [(0, 20, 1), (0, 10, 2), (0, 99, 3)],
        "query_id int, doc_id bigint, rank int",
    )
    judg = spark.createDataFrame(
        [(0, 10, 3), (0, 20, 2), (0, 30, 1)],
        "query_id int, doc_id bigint, rel int",
    )
    out = ndcg_at_k(run, judg, k=3).collect()
    assert len(out) == 1
    r = out[0]
    dcg = (2**2 - 1) / math.log2(2) + (2**3 - 1) / math.log2(3) + 0.0
    idcg = (2**3 - 1) / math.log2(2) + (2**2 - 1) / math.log2(3) \
        + (2**1 - 1) / math.log2(4)
    assert r["dcg"] == round(dcg, 6)
    assert r["idcg"] == round(idcg, 6)
    assert r["ndcg"] == round(round(dcg, 6) / round(idcg, 6), 6)


def test_ndcg_no_relevant_docs(spark):
    run = spark.createDataFrame(
        [(7, 1, 1), (7, 2, 2)], "query_id int, doc_id bigint, rank int"
    )
    judg = spark.createDataFrame(
        [(7, 9, 0)], "query_id int, doc_id bigint, rel int"
    )
    r = ndcg_at_k(run, judg, k=10).collect()[0]
    assert (r["dcg"], r["idcg"], r["ndcg"]) == (0.0, 0.0, 0.0)


def test_ndcg_ideal_run_scores_one(spark):
    judg = spark.createDataFrame(
        [(1, 5, 2), (1, 6, 1)], "query_id int, doc_id bigint, rel int"
    )
    run = spark.createDataFrame(
        [(1, 5, 1), (1, 6, 2)], "query_id int, doc_id bigint, rank int"
    )
    assert ndcg_at_k(run, judg, k=5).collect()[0]["ndcg"] == 1.0


def test_bigram_logprob_known_value(spark):
    from spark_skew_join_spark.operators.quality import bigram_logprob

    docs = spark.createDataFrame(
        [(1, "a b a b"), (2, "b a"), (3, "x")],  # doc 3: no bigrams
        "doc_id bigint, text string",
    )
    out = {r["doc_id"]: r for r in
           bigram_logprob(docs, k_smooth=0.5).collect()}
    assert 3 not in out
    # corpus: unigram counts a=3, b=3, x=1, V=3
    # bigram counts: (a b)=2, (b a)=2
    V, k = 3, 0.5
    p_ab = (2 + k) / (3 + k * V)
    p_ba = (2 + k) / (3 + k * V)
    d1 = -(math.log(p_ab) + math.log(p_ba) + math.log(p_ab)) / 3
    assert out[1]["n_bigrams"] == 3
    assert out[1]["avg_nll"] == round(d1, 6)
    assert out[2]["n_bigrams"] == 1
    assert out[2]["avg_nll"] == round(-math.log(p_ba), 6)


# -- property tests vs Python references (the test_property.py posture:
# tiny max_examples, every example runs Spark jobs) ------------------

from hypothesis import HealthCheck, given, settings, strategies as st

_PSETTINGS = dict(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
    derandomize=True,
)


@given(seed=st.integers(0, 100), k=st.integers(1, 6))
@settings(**_PSETTINGS)
def test_ndcg_matches_python_reference(spark, seed, k):
    import random

    rng = random.Random(seed)
    n_q, n_docs = 3, 12
    run_rows, judg_rows = [], []
    for q in range(n_q):
        ranked = rng.sample(range(n_docs), rng.randint(1, 8))
        run_rows += [(q, d, i + 1) for i, d in enumerate(ranked)]
        judg_rows += [(q, d, rng.randint(0, 3)) for d in
                      rng.sample(range(n_docs), rng.randint(0, n_docs))]
    run = spark.createDataFrame(
        run_rows, "query_id int, doc_id bigint, rank int")
    judg = spark.createDataFrame(
        judg_rows, "query_id int, doc_id bigint, rel int")
    got = {r["query_id"]: r for r in ndcg_at_k(run, judg, k=k).collect()}

    jmap = {(q, d): rel for q, d, rel in judg_rows}
    for q in range(n_q):
        ranked = [(d, r) for (qq, d, r) in run_rows if qq == q and r <= k]
        dcg = sum((2 ** jmap.get((q, d), 0) - 1) / math.log2(r + 1)
                  for d, r in ranked)
        rels = sorted((rel for (qq, _), rel in jmap.items()
                       if qq == q and rel > 0), reverse=True)[:k]
        idcg = sum((2 ** rel - 1) / math.log2(i + 2)
                   for i, rel in enumerate(rels))
        r = got[q]
        assert r["dcg"] == round(dcg, 6)
        assert r["idcg"] == round(idcg, 6)
        expect = round(round(dcg, 6) / round(idcg, 6), 6) if idcg > 0 else 0.0
        assert r["ndcg"] == expect


@given(seed=st.integers(0, 100))
@settings(**_PSETTINGS)
def test_tfidf_cosine_matches_python_reference(spark, seed):
    import itertools
    import random

    rng = random.Random(seed)
    vocab = [f"t{i}" for i in range(8)]
    texts = {i: " ".join(rng.choice(vocab)
                         for _ in range(rng.randint(1, 12)))
             for i in range(8)}
    docs = spark.createDataFrame(
        list(texts.items()), "doc_id bigint, text string")
    n, max_df, thr = 2, 6, 0.3
    got = {(r["id_a"], r["id_b"]): r["cosine"]
           for r in tfidf_cosine_pairs(
               docs, threshold=thr, ngram=n, max_df=max_df).collect()}

    def grams(t):
        w = t.split(" ")
        out = {}
        for i in range(len(w) - n + 1):
            g = " ".join(w[i:i + n])
            out[g] = out.get(g, 0) + 1
        return out

    tfs = {d: grams(t) for d, t in texts.items()}
    dfc = {}
    for g in set(itertools.chain.from_iterable(tfs.values())):
        dfc[g] = sum(1 for t in tfs.values() if g in t)
    N = len(texts)
    w = {d: {g: tf * math.log(N / dfc[g])
             for g, tf in t.items() if dfc[g] <= max_df}
         for d, t in tfs.items()}
    expect = {}
    for a, b in itertools.combinations(sorted(texts), 2):
        na = math.sqrt(sum(x * x for x in w[a].values()))
        nb = math.sqrt(sum(x * x for x in w[b].values()))
        dot = sum(w[a][g] * w[b].get(g, 0.0) for g in w[a])
        if na > 0 and nb > 0 and dot != 0:
            c = round(dot / (na * nb), 6)
            if c >= thr:
                expect[(a, b)] = c
    assert got == expect


def test_tfidf_cosine_zero_norm_guard(spark):
    """Review r9: identical boilerplate docs (every trigram df == N,
    all weights ln(1)=0 → zero norms) must yield no pairs, not a
    DIVIDE_BY_ZERO under ANSI mode."""
    docs = spark.createDataFrame(
        [(i, "a b c d") for i in range(3)], "doc_id bigint, text string"
    )
    assert tfidf_cosine_pairs(docs, threshold=0.1, ngram=3).count() == 0


def test_lpa_tracking_requires_checkpoint(spark):
    from spark_skew_join_spark.operators.pagerank import label_propagation

    edges = spark.createDataFrame([(1, 2)], "src bigint, dst bigint")
    with pytest.raises(ValueError, match="checkpoint"):
        label_propagation(edges, rounds=2, track_convergence=True,
                          checkpoint=False)


def test_ndcg_query_missing_from_run_scores_zero(spark):
    """Review r9: a query with relevant judgments but no run rows must
    appear with ndcg=0, not vanish from the output."""
    run = spark.createDataFrame(
        [(0, 1, 1)], "query_id int, doc_id bigint, rank int"
    )
    judg = spark.createDataFrame(
        [(0, 1, 2), (5, 9, 3)], "query_id int, doc_id bigint, rel int"
    )
    out = {r["query_id"]: r for r in ndcg_at_k(run, judg, k=3).collect()}
    assert set(out) == {0, 5}
    assert out[0]["ndcg"] == 1.0
    assert (out[5]["dcg"], out[5]["ndcg"]) == (0.0, 0.0)
    assert out[5]["idcg"] > 0


def test_retrieval_metrics_known_values(spark):
    from spark_skew_join_spark.operators.retrieval import retrieval_metrics

    run = spark.createDataFrame(
        [(0, 10, 1), (0, 11, 2), (0, 12, 3)],
        "query_id int, doc_id bigint, rank int",
    )
    judg = spark.createDataFrame(
        # relevant for q0: 11, 12, 99 (99 never retrieved); rel 0 row ignored
        [(0, 11, 1), (0, 12, 2), (0, 99, 1), (0, 10, 0), (7, 50, 3)],
        "query_id int, doc_id bigint, rel int",
    )
    out = {r["query_id"]: r
           for r in retrieval_metrics(run, judg, k=2).collect()}
    r0 = out[0]
    # top-2 = {10, 11}; hits = 1 (doc 11); first relevant rank = 2
    assert (r0["n_rel"], r0["hits"]) == (3, 1)
    assert r0["recall_at_k"] == round(1 / 3, 6)
    assert r0["precision_at_k"] == 0.5
    assert r0["mrr"] == 0.5
    # judged-relevant query with no run rows surfaces with zeros
    r7 = out[7]
    assert (r7["n_rel"], r7["hits"], r7["recall_at_k"], r7["mrr"]) == \
        (1, 0, 0.0, 0.0)


@given(seed=st.integers(0, 100), k=st.integers(1, 5))
@settings(**_PSETTINGS)
def test_retrieval_metrics_matches_python_reference(spark, seed, k):
    import random

    from spark_skew_join_spark.operators.retrieval import retrieval_metrics

    rng = random.Random(seed)
    n_q, n_docs = 3, 10
    run_rows, judg_rows = [], []
    for q in range(n_q):
        ranked = rng.sample(range(n_docs), rng.randint(0, 7))
        run_rows += [(q, d, i + 1) for i, d in enumerate(ranked)]
        judg_rows += [(q, d, rng.randint(0, 2)) for d in
                      rng.sample(range(n_docs), rng.randint(0, n_docs))]
    if not run_rows:
        run_rows = [(0, 0, 1)]
    run = spark.createDataFrame(
        run_rows, "query_id int, doc_id bigint, rank int")
    judg = spark.createDataFrame(
        judg_rows, "query_id int, doc_id bigint, rel int") \
        if judg_rows else spark.createDataFrame(
            [], "query_id int, doc_id bigint, rel int")
    got = {r["query_id"]: r
           for r in retrieval_metrics(run, judg, k=k).collect()}

    rel = {(q, d) for q, d, r in judg_rows if r >= 1}
    qids = {q for q, _, _ in run_rows if any(
        (q, d) in rel for _, d, _ in run_rows)} \
        | {q for q, _ in rel}
    for q in qids:
        n_rel = sum(1 for (qq, _) in rel if qq == q)
        matched = [(d, r) for (qq, d, r) in run_rows
                   if qq == q and (q, d) in rel]
        hits = sum(1 for _, r in matched if r <= k)
        first = min((r for _, r in matched), default=None)
        g = got[q]
        assert g["n_rel"] == n_rel and g["hits"] == hits
        assert g["recall_at_k"] == (round(hits / n_rel, 6) if n_rel else 0.0)
        assert g["precision_at_k"] == round(hits / k, 6)
        assert g["mrr"] == (round(1.0 / first, 6) if first else 0.0)
