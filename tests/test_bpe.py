"""BPE trainer tests: the canonical Sennrich example, driver-vs-
distributed merge parity on messier text, encoding round-trip
properties, memoized application, and the vocab guard."""

from __future__ import annotations

import pytest

from spark_skew_join_spark.operators.bpe import (
    EOW,
    _encode_word,
    apply_bpe,
    train_bpe,
    word_frequencies,
)

SENNRICH = (
    "low low low low low lower lower newest newest newest "
    "newest newest newest widest widest widest"
)


def test_sennrich_example_merge_order(spark):
    docs = spark.createDataFrame([(1, SENNRICH)], "doc_id long, text string")
    merges = train_bpe(docs, 4, mode="driver")
    assert [(m[1], m[2]) for m in merges] == [
        ("e", "s"), ("es", "t"), ("est", EOW), ("l", "o")
    ]
    assert [m[3] for m in merges] == [9, 9, 9, 7]


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
    a = train_bpe(docs, 12, mode="driver")
    b = train_bpe(docs, 12, mode="distributed", checkpoint_every=5)
    assert a == b
    assert len(a) == 12


def test_word_frequencies_normalization(spark):
    docs = spark.createDataFrame(
        [(1, "Foo  foo\tFOO"), (2, "bar")], "doc_id long, text string"
    )
    wf = {r["word"]: r["freq"] for r in word_frequencies(docs).collect()}
    assert wf == {"foo": 3, "bar": 1}


def test_encode_word_replays_training():
    # after training, encoding a training word yields the symbols the
    # trainer left it with
    merges = [(0, "e", "s", 9), (1, "es", "t", 9), (2, "est", EOW, 9),
              (3, "l", "o", 7), (4, "lo", "w", 7)]
    ranks = {(m[1], m[2]): m[0] for m in merges}
    assert _encode_word("newest", ranks) == ["n", "e", "w", "est" + EOW]
    assert _encode_word("lowest", ranks) == ["low", "est" + EOW]
    assert _encode_word("zzz", ranks) == ["z", "z", "z", EOW]


def test_apply_bpe_roundtrip_property(spark):
    docs = spark.createDataFrame(
        [(1, SENNRICH), (2, "unseen tokens stay decomposed")],
        "doc_id long, text string",
    )
    merges = train_bpe(docs, 8, mode="driver")
    out = {r["doc_id"]: r["bpe_tokens"] for r in apply_bpe(docs, merges).collect()}
    for did, text in ((1, SENNRICH), (2, "unseen tokens stay decomposed")):
        toks = out[did]
        # concatenating tokens and splitting on the EOW marker recovers
        # the lowercased words exactly — BPE is lossless
        rebuilt = "".join(toks).split(EOW)
        assert [w for w in rebuilt if w] == text.lower().split()
        assert len(toks) <= sum(len(w) + 1 for w in text.split())


def test_apply_bpe_compresses_trained_words(spark):
    docs = spark.createDataFrame([(1, SENNRICH)], "doc_id long, text string")
    merges = train_bpe(docs, 10, mode="driver")
    toks = apply_bpe(docs, merges).collect()[0]["bpe_tokens"]
    n_words = len(SENNRICH.split())
    n_chars = sum(len(w) + 1 for w in SENNRICH.split())
    assert len(toks) < 0.5 * n_chars  # merges actually compress
    assert len(toks) >= n_words


def test_driver_mode_vocab_guard(spark):
    docs = spark.createDataFrame(
        [(i, f"w{i} x{i} y{i}") for i in range(50)], "doc_id long, text string"
    )
    with pytest.raises(ValueError, match="max_vocab_words"):
        train_bpe(docs, 2, mode="driver", max_vocab_words=10)
    with pytest.raises(ValueError, match="mode"):
        train_bpe(docs, 2, mode="nope")


def test_train_stops_when_exhausted(spark):
    docs = spark.createDataFrame([(1, "ab ab")], "doc_id long, text string")
    # 'ab</w>' fully merges after 2 merges; requesting 10 stops early
    merges = train_bpe(docs, 10, mode="driver")
    assert len(merges) == 2
    dist = train_bpe(docs, 10, mode="distributed")
    assert dist == merges
