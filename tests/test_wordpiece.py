"""WordPiece trainer/apply tests: a hand-computed likelihood-argmax
example, driver-vs-distributed merge parity, greedy longest-match
semantics incl. the [UNK] fallback, lossless round-trip on a corpus,
and the Kneser-Ney scorer's hand-checked probabilities."""

from __future__ import annotations

import math

import pytest

from spark_skew_join_spark.operators.wordpiece import (
    UNK,
    _encode_word,
    _initial_pieces,
    apply_wordpiece,
    train_wordpiece,
    wordpiece_vocab,
)


def test_initial_pieces_convention():
    assert _initial_pieces("abc") == ["a", "##b", "##c"]
    assert _initial_pieces("x") == ["x"]


def test_likelihood_argmax_beats_raw_count(spark):
    # "ab" appears 10x and "cd" 4x, but c/d occur ONLY in "cd" while
    # a/b also occur apart — the likelihood score picks (c, ##d):
    #   score(a,##b) = 10 / (14*12),  score(c,##d) = 4 / (4*4)
    # a raw-count (BPE) trainer would pick (a, ##b).
    text = " ".join(["ab"] * 10 + ["cd"] * 4 + ["ax"] * 4 + ["yb"] * 2)
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    merges = train_wordpiece(docs, 1, mode="driver")
    (rank, left, right, merged, cnt, cl, cr) = merges[0]
    assert (left, right, merged) == ("c", "##d", "cd")
    assert (cnt, cl, cr) == (4, 4, 4)


def test_driver_distributed_parity(spark):
    docs = spark.createDataFrame(
        [
            (1, "the cat sat on the mat"),
            (2, "the dog ate the cat food"),
            (3, "a cat and a dog and a rat"),
            (4, "mat rat cat bat that"),
        ],
        "doc_id long, text string",
    )
    a = train_wordpiece(docs, 12, mode="driver")
    b = train_wordpiece(docs, 12, mode="distributed", checkpoint_every=5)
    assert a == b
    assert len(a) == 12
    # every merged piece strips the continuation prefix exactly once
    for _, left, right, merged, *_ in a:
        assert right.startswith("##")
        assert merged == left + right[2:]


def test_encode_word_greedy_longest_match():
    vocab = {"un", "##aff", "##able", "##ff", "a", "##a", "##b", "##l",
             "##e", "u", "##n", "##f"}
    # maximal munch: "un" then "##aff" (longest), then "##able"
    assert _encode_word("unaffable", vocab, 5) == ["un", "##aff", "##able"]
    # a char with no continuation piece strands the word -> [UNK]
    assert _encode_word("unzip", vocab, 5) == [UNK]
    # word-initial piece must be unprefixed: "##aff" can't start a word
    assert _encode_word("aff", vocab, 5) == ["a", "##ff"]


def test_apply_round_trip_and_unk(spark):
    docs = spark.createDataFrame(
        [(1, "hugging faces hug"), (2, "hugging huggers")],
        "doc_id long, text string",
    )
    merges = train_wordpiece(docs, 6, mode="driver")
    vocab = wordpiece_vocab(docs, merges)
    rows = {r["doc_id"]: r for r in
            apply_wordpiece(docs, vocab).collect()}
    for did, text in [(1, "hugging faces hug"), (2, "hugging huggers")]:
        rebuilt = "".join(
            p[2:] if p.startswith("##") else p for p in rows[did]["pieces"]
        )
        assert rebuilt == text.replace(" ", "")
        assert rows[did]["n_unk_words"] == 0
        assert rows[did]["n_pieces"] == len(rows[did]["pieces"])
    # an out-of-alphabet word tokenizes to a single [UNK]
    oov = spark.createDataFrame([(9, "hug zzz!")], "doc_id long, text string")
    r9 = apply_wordpiece(oov, vocab).collect()[0]
    assert r9["n_unk_words"] == 1
    assert UNK in r9["pieces"]


def test_max_vocab_guard(spark):
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta")], "doc_id long, text string"
    )
    with pytest.raises(ValueError, match="max_vocab_words"):
        train_wordpiece(docs, 2, mode="driver", max_vocab_words=2)


def test_kneser_ney_hand_example(spark):
    # corpus: one doc "a b a b a c"; bigrams: ab x2, ba x2, ac x1
    # c(a)=3, c(b)=2; types: ab, ba, ac -> T=3
    # N1+(a.)=2 (b,c), N1+(b.)=1 (a); N1+(.b)=1 (a), N1+(.a)=1, N1+(.c)=1
    from spark_skew_join_spark.operators.quality import kneser_ney_logprob

    docs = spark.createDataFrame(
        [(1, "a b a b a c")], "doc_id long, text string"
    )
    out = kneser_ney_logprob(docs).collect()[0]
    d = 0.75
    p_ab = (max(2 - d, 0) + d * 2 * (1 / 3)) / 3
    p_ba = (max(2 - d, 0) + d * 1 * (1 / 3)) / 2
    p_ac = (max(1 - d, 0) + d * 2 * (1 / 3)) / 3
    expect = (2 * -math.log(p_ab) + 2 * -math.log(p_ba) - math.log(p_ac)) / 5
    assert out["n_bigrams"] == 5
    assert out["avg_nll"] == pytest.approx(round(expect, 6), abs=1e-6)


def test_perplexity_buckets_terciles(spark):
    """Per-source terciles: equal-ish bucket sizes, nll envelopes
    ordered head <= middle <= tail, short docs dropped."""
    from spark_skew_join_spark.operators.quality import perplexity_buckets

    rows = []
    did = 0
    for src in ("a", "b"):
        for k in range(9):
            # repetitive docs score low nll; diverse ones high
            text = " ".join(["x y"] * 6) if k < 3 else (
                " ".join(f"w{did}t{j}" for j in range(12)))
            rows.append((did, text, src))
            did += 1
    rows.append((did, "solo", "a"))  # 1 token -> no bigrams -> dropped
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = perplexity_buckets(docs, "doc_id", "text", "source").collect()
    by = {(r["source"], r["bucket"]): r for r in out}
    assert len(by) == 6
    for src in ("a", "b"):
        assert sum(by[(src, b)]["n_docs"] for b in ("head", "middle", "tail")) == 9
        assert by[(src, "head")]["max_nll"] <= by[(src, "middle")]["min_nll"]
        assert by[(src, "middle")]["max_nll"] <= by[(src, "tail")]["min_nll"]
