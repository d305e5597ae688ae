"""label_propagation and char_entropy unit tests (round-8 additions)."""
import math

from spark_skew_join_spark.operators.pagerank import label_propagation
from spark_skew_join_spark.operators.quality import char_entropy


def test_lpa_two_cliques_with_bridge(spark):
    # two 4-cliques joined by one bridge edge: communities must be the
    # cliques, each labeled by its smallest member
    c1 = [(a, b) for a in range(1, 5) for b in range(1, 5) if a < b]
    c2 = [(a, b) for a in range(10, 14) for b in range(10, 14) if a < b]
    edges = spark.createDataFrame(
        c1 + c2 + [(4, 10)], "src bigint, dst bigint"
    )
    out = {r["node"]: (r["label"], r["community_size"])
           for r in label_propagation(edges, rounds=4).collect()}
    assert len(out) == 8
    assert {out[n][0] for n in (1, 2, 3)} == {1}
    assert {out[n][0] for n in (11, 12, 13)} == {10}


def test_lpa_deterministic_tiebreak_smallest_label(spark):
    # star: center 5 sees leaves {1,2,3} once each -> tie -> label 1
    edges = spark.createDataFrame(
        [(5, 1), (5, 2), (5, 3)], "src bigint, dst bigint"
    )
    out = {r["node"]: r["label"]
           for r in label_propagation(edges, rounds=1).collect()}
    assert out[5] == 1
    # each leaf's only neighbor is 5
    assert out[1] == out[2] == out[3] == 5


def test_lpa_track_convergence(spark):
    """VERDICT r8 #8: with track_convergence, LPA reports per-round
    changed counts and a converged flag, stops early at the fixpoint,
    and the early-stopped labels equal the full-rounds result."""
    c1 = [(a, b) for a in range(1, 5) for b in range(1, 5) if a < b]
    c2 = [(a, b) for a in range(10, 14) for b in range(10, 14) if a < b]
    edges = spark.createDataFrame(
        c1 + c2 + [(4, 10)], "src bigint, dst bigint"
    )
    out, info = label_propagation(edges, rounds=10, track_convergence=True)
    assert info["converged"] is True
    assert info["rounds_run"] < 10  # early stop at the fixpoint
    assert info["changed_per_round"][-1] == 0
    assert all(c >= 0 for c in info["changed_per_round"])
    assert len(info["changed_per_round"]) == info["rounds_run"]
    plain = label_propagation(edges, rounds=10)
    key = lambda r: r["node"]
    assert sorted(map(tuple, out.collect()), key=lambda t: t[0]) == \
        sorted(map(tuple, plain.collect()), key=lambda t: t[0])


def test_lpa_track_convergence_not_converged(spark):
    # a path graph needs ~diameter rounds; 1 round cannot converge
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(8)], "src bigint, dst bigint"
    )
    out, info = label_propagation(edges, rounds=1, track_convergence=True)
    assert info["converged"] is False
    assert info["rounds_run"] == 1
    assert info["changed_per_round"][0] > 0
    assert out.count() == 9


def test_lpa_rejects_bad_rounds(spark):
    import pytest

    edges = spark.createDataFrame([(1, 2)], "src bigint, dst bigint")
    with pytest.raises(ValueError):
        label_propagation(edges, rounds=0)


def test_char_entropy_known_values(spark):
    docs = spark.createDataFrame(
        [(1, "aaaa"), (2, "abab"), (3, "abcd"), (4, "")],
        "doc_id bigint, text string",
    )
    out = {r["doc_id"]: r for r in char_entropy(docs).collect()}
    assert out[1]["entropy_bits"] == 0.0 and out[1]["n_chars"] == 4
    assert out[2]["entropy_bits"] == 1.0  # two equiprobable symbols
    assert out[3]["entropy_bits"] == 2.0  # four equiprobable symbols
    assert out[4]["n_chars"] == 0 and out[4]["entropy_bits"] == 0.0
    # a skewed distribution: 3 a's + 1 b
    docs2 = spark.createDataFrame([(9, "aaab")], "doc_id bigint, text string")
    r = char_entropy(docs2).collect()[0]
    expect = -(0.75 * math.log2(0.75) + 0.25 * math.log2(0.25))
    assert r["entropy_bits"] == round(expect, 6)


def test_chunk_documents_windows_and_edges(spark):
    from spark_skew_join_spark.functions.text import chunk_documents

    docs = spark.createDataFrame(
        [
            (1, " ".join(f"t{i}" for i in range(20))),  # 20 toks
            (2, "a b c"),                               # shorter than chunk
            (3, ""),                                    # empty -> no rows
            (4, " ".join(f"x{i}" for i in range(12))),  # exactly one chunk
        ],
        "doc_id bigint, text string",
    )
    out = chunk_documents(docs, chunk_tokens=12, overlap=4)
    rows = {(r["doc_id"], r["chunk_idx"]): r for r in out.collect()}
    # doc 1: stride 8 -> starts 1, 9 (ceil((20-4)/8)=2 chunks)
    assert {k for k in rows if k[0] == 1} == {(1, 0), (1, 1)}
    assert rows[(1, 0)]["start_token"] == 1 and rows[(1, 0)]["n_tokens"] == 12
    assert rows[(1, 1)]["start_token"] == 9 and rows[(1, 1)]["n_tokens"] == 12
    assert rows[(1, 0)]["chunk_text"].split()[:2] == ["t0", "t1"]
    assert rows[(1, 1)]["chunk_text"].split()[0] == "t8"  # 4-token overlap
    # doc 2: one short chunk
    assert rows[(2, 0)]["n_tokens"] == 3 and rows[(2, 0)]["chunk_text"] == "a b c"
    # doc 3 absent, doc 4 exactly one full chunk
    assert not any(k[0] == 3 for k in rows)
    assert {k for k in rows if k[0] == 4} == {(4, 0)}
    # every token of doc 1 is covered by some chunk
    covered = set()
    for k, r in rows.items():
        if k[0] == 1:
            covered |= set(range(r["start_token"],
                                 r["start_token"] + r["n_tokens"]))
    assert covered == set(range(1, 21))


def test_chunk_documents_rejects_bad_params(spark):
    import pytest

    from spark_skew_join_spark.functions.text import chunk_documents

    docs = spark.createDataFrame([(1, "a b")], "doc_id bigint, text string")
    with pytest.raises(ValueError):
        chunk_documents(docs, chunk_tokens=8, overlap=8)
    with pytest.raises(ValueError):
        chunk_documents(docs, chunk_tokens=0, overlap=0)


def test_lpa_cadence_bit_identical(spark):
    """VERDICT r10 #5: checkpoint_every moves only lineage-truncation
    points, never the recurrence — results are identical at every
    cadence, including no checkpointing at all."""
    import random

    rng = random.Random(7)
    edges = spark.createDataFrame(
        [(rng.randrange(60), rng.randrange(60)) for _ in range(400)],
        "src bigint, dst bigint",
    )
    ref = sorted(
        (r["node"], r["label"], r["community_size"])
        for r in label_propagation(
            edges, rounds=5, checkpoint_every=1
        ).collect()
    )
    for every in (2, 3, 5):
        got = sorted(
            (r["node"], r["label"], r["community_size"])
            for r in label_propagation(
                edges, rounds=5, checkpoint_every=every
            ).collect()
        )
        assert got == ref, f"cadence {every} diverged"
    lazy = sorted(
        (r["node"], r["label"], r["community_size"])
        for r in label_propagation(
            edges, rounds=5, checkpoint=False
        ).collect()
    )
    assert lazy == ref


def test_lpa_cadence_arg_validation(spark):
    import pytest

    edges = spark.createDataFrame([(1, 2)], "src bigint, dst bigint")
    with pytest.raises(ValueError):
        label_propagation(edges, checkpoint_every=0)
    with pytest.raises(ValueError):
        # tracking under a wide cadence would re-execute the lazy chain
        label_propagation(
            edges, track_convergence=True, checkpoint_every=2
        )
