"""Unigram-LM tokenizer trainer (operators/unigram.py).

Pins: Viterbi tie-break semantics on hand-built cases, driver ≡
distributed training parity, seed construction invariants, OOV
single-char fallback, and apply-path losslessness.
"""

from __future__ import annotations

import math

import pyspark.sql.functions as F
import pytest

from spark_skew_join_spark.operators.unigram import (
    SEP,
    _ilogp,
    _seed_counts_py,
    _select_seed,
    _viterbi,
    apply_unigram,
    train_unigram,
)


def test_viterbi_prefers_higher_score():
    # "ab" as one piece (p=1/2) beats a+b (1/4 * 1/4)
    ilp = _ilogp({"ab": 2, "a": 1, "b": 1})
    score, np_, path = _viterbi("ab", ilp, max_piece_len=2)
    assert path == "ab" and np_ == 1


def test_viterbi_tie_breaks_fewest_then_lex():
    # uniform probs: "abc" -> {a,bc} vs {ab,c} vs {a,b,c}; 2-piece
    # paths tie on score, fewest wins over 3 pieces, then lex:
    # "a<SEP>bc" < "ab<SEP>c"  (chr(31) < 'b')
    ilp = {p: -100 for p in ("a", "b", "c", "ab", "bc")}
    _, np_, path = _viterbi("abc", ilp, max_piece_len=2)
    assert np_ == 2
    assert path == "a" + SEP + "bc"
    assert path < "ab" + SEP + "c"


def test_viterbi_uncoverable_returns_none():
    assert _viterbi("xyz", _ilogp({"a": 1}), 3) is None


def test_seed_selection_keeps_all_chars():
    cnt = _seed_counts_py([("aab", 2), ("cd", 1)], max_piece_len=3)
    # occurrence-weighted: 'a' appears twice per word instance
    assert cnt["a"] == 4 and cnt["aa"] == 2 and cnt["aab"] == 2
    seed = _select_seed(cnt, seed_size=1)
    assert {"a", "b", "c", "d"} <= set(seed)
    multis = [p for p in seed if len(p) > 1]
    assert multis == ["aa"]  # top-1 by (count DESC, piece ASC)


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (1, "spark spark sparkle park"),
        (2, "parking sparks spark"),
        (3, "lark park spark spark"),
        (4, "sparkle sparkle lark"),
    ]
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_driver_distributed_parity(spark, corpus):
    kw = dict(vocab_size=12, seed_size=10, max_piece_len=5, em_iters=3)
    assert train_unigram(corpus, mode="driver", **kw) == train_unigram(
        corpus, mode="distributed", **kw
    )


def test_trainer_learns_frequent_pieces(spark, corpus):
    vocab = train_unigram(
        corpus, vocab_size=12, seed_size=10, max_piece_len=5, em_iters=3
    )
    pieces = [p for p, _, _ in vocab]
    # the dominant subword must survive pruning as a multi-char piece
    assert any(len(p) >= 4 and "park" in p for p in pieces)
    # logprobs normalized over the kept set
    total = sum(math.exp(lp) for _, _, lp in vocab)
    assert abs(total - 1.0) < 1e-3
    # counts descending under the (count DESC, piece ASC) order
    counts = [c for _, c, _ in vocab]
    assert counts == sorted(counts, reverse=True)


def test_apply_lossless_and_oov_fallback(spark, corpus):
    vocab = train_unigram(
        corpus, vocab_size=12, seed_size=10, max_piece_len=5, em_iters=3
    )
    unseen = spark.createDataFrame(
        [(9, "SPARK quizzy"), (10, ""), (11, "   ")],
        "doc_id bigint, text string",
    )
    out = {
        r["doc_id"]: r
        for r in apply_unigram(unseen, vocab).collect()
    }
    assert set(out) == {9, 10, 11}
    # lossless incl. the OOV word (q/u/i/z/y likely absent from vocab)
    assert "".join(out[9]["pieces"]) == "sparkquizzy"
    assert out[10]["pieces"] == [] and out[11]["pieces"] == []
    # OOV chars come through as single-char pieces
    vocab_pieces = {p for p, _, _ in vocab}
    oov = [p for p in out[9]["pieces"] if p not in vocab_pieces]
    assert oov and all(len(p) == 1 for p in oov)


def test_train_rejects_bad_args(spark, corpus):
    with pytest.raises(ValueError):
        train_unigram(corpus, mode="nope")
    with pytest.raises(ValueError):
        train_unigram(corpus, em_iters=0)
    with pytest.raises(ValueError):
        train_unigram(corpus, mode="driver", max_vocab_words=2)
