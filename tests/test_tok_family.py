"""Shared tokenizer-trainer family (r15, the ANN-family pattern).

The six tokenizer registry entries previously ran 12 word-frequency
corpus aggregations and 6 driver-mode trainings for 4 distinct
artifacts; the family collects the word table ONCE and trains each
model once. These tests pin that the injected-words path is
bit-identical to the standalone path for all three trainers plus the
WordPiece vocab."""

from __future__ import annotations

import pytest

from spark_skew_join_spark.operators.bpe import train_bpe, word_frequencies
from spark_skew_join_spark.operators.unigram import train_unigram
from spark_skew_join_spark.operators.wordpiece import (
    train_wordpiece,
    wordpiece_vocab,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "low lower lowest newer new"),
        (2, "wider wide widest low low newer"),
        (3, "the newest of the new lows"),
        (4, "supercalifragilistic low wide xyz"),
        (5, ""),
    ]
    return spark.createDataFrame(rows, "doc_id bigint, text string")


@pytest.fixture(scope="module")
def words(docs):
    return word_frequencies(docs).collect()


def test_bpe_injected_words_bit_identical(docs, words):
    assert train_bpe(docs, 8, mode="driver", words_rows=words) == train_bpe(
        docs, 8, mode="driver"
    )


def test_wordpiece_injected_words_bit_identical(docs, words):
    a = train_wordpiece(docs, 8, mode="driver", words_rows=words)
    b = train_wordpiece(docs, 8, mode="driver")
    assert a == b
    assert wordpiece_vocab(docs, a, words_rows=words) == wordpiece_vocab(
        docs, a
    )


def test_unigram_injected_words_bit_identical(docs, words):
    a = train_unigram(docs, mode="driver", words_rows=words)
    b = train_unigram(docs, mode="driver")
    assert a == b


def test_injection_guard_still_applies(docs, words):
    with pytest.raises(ValueError, match="max_vocab_words"):
        train_bpe(docs, 4, mode="driver", words_rows=words,
                  max_vocab_words=2)
    with pytest.raises(ValueError, match="max_vocab_words"):
        train_wordpiece(docs, 4, mode="driver", words_rows=words,
                        max_vocab_words=2)
    with pytest.raises(ValueError, match="max_vocab_words"):
        train_unigram(docs, mode="driver", words_rows=words,
                      max_vocab_words=2)
