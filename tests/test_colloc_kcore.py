"""PMI collocations and k-core peel vs Python references."""

from __future__ import annotations

import math
import random

import pytest

from spark_skew_join_spark.operators.colloc import pmi_collocations
from spark_skew_join_spark.operators.pagerank import kcore


def test_pmi_hand_computed(spark):
    docs = [
        (1, "new york new york"),
        (2, "old york new day"),
        (3, "new york rises"),
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    got = {
        (r.word_a, r.word_b): r
        for r in pmi_collocations(df, "text", min_count=2).collect()
    }
    # (new,york): 2 in doc1 + 1 in doc3; (york,new): doc1 + doc2
    assert set(got) == {("new", "york"), ("york", "new")}
    n_words = 4 + 4 + 3
    n_bigrams = 3 + 3 + 2
    c_new, c_york = 4, 4
    for pair, c_pair in ((("new", "york"), 3), (("york", "new"), 2)):
        r = got[pair]
        ca, cb = (c_new, c_york) if pair[0] == "new" else (c_york, c_new)
        want = math.log(
            (c_pair / n_bigrams) / ((ca / n_words) * (cb / n_words))
        )
        assert (r.pair_count, r.count_a, r.count_b) == (c_pair, ca, cb)
        assert r.pmi == pytest.approx(round(want, 6), abs=2e-6)
    with pytest.raises(ValueError):
        pmi_collocations(df, "text", min_count=0)


def test_pmi_negative_for_anticorrelated(spark):
    # "a" and "b" both frequent but never adjacent in "ab" order more
    # than independence predicts -> pair ("a","x") has lower PMI than
    # the exclusive pair ("c","d")
    rows = [(i, "a x " * 5 + "c d") for i in range(4)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        (r.word_a, r.word_b): r.pmi
        for r in pmi_collocations(df, "text", min_count=2).collect()
    }
    assert got[("c", "d")] > got[("a", "x")]


def _peel(edges: set[tuple[int, int]], k: int, rounds: int):
    e = set(edges)
    for _ in range(rounds):
        deg: dict[int, int] = {}
        for u, v in e:
            deg[u] = deg.get(u, 0) + 1
            deg[v] = deg.get(v, 0) + 1
        keep = {n for n, d in deg.items() if d >= k}
        e = {(u, v) for u, v in e if u in keep and v in keep}
    deg = {}
    for u, v in e:
        deg[u] = deg.get(u, 0) + 1
        deg[v] = deg.get(v, 0) + 1
    return deg


def test_kcore_clique_survives_path_peels(spark):
    # K4 on {1,2,3,4} + path 4-5-6-7: 2-core = the K4 exactly
    edges = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),
             (4, 5), (5, 6), (6, 7)]
    df = spark.createDataFrame(edges, ["src", "dst"])
    got = {
        r.node: r.degree for r in kcore(df, k=2, rounds=10).collect()
    }
    assert got == {1: 3, 2: 3, 3: 3, 4: 3}


def test_kcore_matches_reference_peel(spark):
    rng = random.Random(13)
    edges = {
        (a, b)
        for a, b in (
            sorted(rng.sample(range(40), 2)) for _ in range(160)
        )
    }
    # noisy input: duplicates both ways + self loops must be ignored
    rows = list(edges) + [(b, a) for a, b in list(edges)[:20]] + [(5, 5)]
    df = spark.createDataFrame(rows, ["src", "dst"]).repartition(5)
    for k in (2, 4, 6):
        got = {
            r.node: r.degree for r in kcore(df, k=k, rounds=10).collect()
        }
        assert got == _peel(edges, k, 10)
    with pytest.raises(ValueError):
        kcore(df, k=0)


@pytest.mark.slow
def test_kcore_cadence_and_early_stop_identical(spark):
    """checkpoint_every > 1 and early_stop change materialization and
    round count, never the result: peeling is idempotent after
    convergence (VERDICT r9 #6)."""
    rng = random.Random(29)
    edges = {
        (a, b)
        for a, b in (
            sorted(rng.sample(range(60), 2)) for _ in range(300)
        )
    }
    df = spark.createDataFrame(list(edges), ["src", "dst"]).repartition(4)
    base = {
        r.node: r.degree
        for r in kcore(df, k=3, rounds=12, early_stop=False).collect()
    }
    for every in (2, 5):
        got = {
            r.node: r.degree
            for r in kcore(
                df, k=3, rounds=12, checkpoint_every=every
            ).collect()
        }
        assert got == base, f"cadence {every} diverged"
    # early_stop stops before `rounds` boundaries on a converged graph
    timings: list = []
    got = {
        r.node: r.degree
        for r in kcore(df, k=3, rounds=12, round_timings=timings).collect()
    }
    assert got == base
    assert len(timings) < 12  # 60-node graph converges well before 12
    with pytest.raises(ValueError):
        kcore(df, k=2, checkpoint_every=0)
