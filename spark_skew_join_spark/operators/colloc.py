"""Collocation extraction by pointwise mutual information (PMI).

Surfaces word pairs that co-occur adjacently far more often than their
individual frequencies predict (Church & Hanks, 1990) — multiword
expressions ("new york", "machine learning") for tokenizer vocab
curation, stopword-phrase detection, and boilerplate analysis in a
training-data pipeline.

    PMI(a, b) = ln( P(ab) / (P(a) · P(b)) )
              = ln( (c_ab / N_bigrams) / ((c_a / N_words) · (c_b / N_words)) )

computed from corpus-wide *frequency* counts (unlike the set-semantics
word n-grams of operators/setsim.py, multiplicity matters here).
A minimum pair count keeps the noisy low-frequency tail out (PMI's
known bias toward hapax pairs).

Scale shape: two explodes (words, adjacent pairs) feeding
map-side-combined groupBys; unigram counts join back onto the pair
table by word key — all equi-joins, zero Python, and the two 1-row
corpus totals ride a bounded scalar cross-join (SCALAR_BNL_OK shape).
PMI values round to 6 decimals: ln is evaluated per-row on identical
inputs in any engine, but the displayed double is quantized to keep the
oracle hash stable across libm builds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def pmi_collocations(
    docs: DataFrame,
    text_col: str = "text",
    min_count: int = 5,
) -> DataFrame:
    """Adjacent-word-pair PMI over the corpus.

    Returns (word_a, word_b, pair_count, count_a, count_b, pmi) for
    ordered adjacent pairs with pair_count >= min_count.
    """
    if min_count < 1:
        raise ValueError("min_count must be >= 1")
    arr = F.filter(F.split(F.lower(F.col(text_col)), " "), lambda x: x != "")
    words = docs.select(arr.alias("w"))

    unigrams = words.select(F.explode("w").alias("word")).groupBy(
        "word"
    ).agg(F.count(F.lit(1)).alias("cnt"))

    pairs = (
        words.where(F.size("w") >= 2)
        .select(
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("w") - F.lit(1)),
                    lambda i: F.struct(
                        F.element_at(F.col("w"), i).alias("word_a"),
                        F.element_at(F.col("w"), i + F.lit(1)).alias(
                            "word_b"
                        ),
                    ),
                )
            ).alias("p")
        )
        .select("p.word_a", "p.word_b")
        .groupBy("word_a", "word_b")
        .agg(F.count(F.lit(1)).alias("pair_count"))
        .where(F.col("pair_count") >= min_count)
    )

    n_words = unigrams.agg(F.sum("cnt").alias("n_words"))
    n_bigrams = (
        words.select(
            F.greatest(F.size("w") - F.lit(1), F.lit(0)).alias("nb")
        )
        .agg(F.sum("nb").alias("n_bigrams"))
    )

    ca = unigrams.select(
        F.col("word").alias("word_a"), F.col("cnt").alias("count_a")
    )
    cb = unigrams.select(
        F.col("word").alias("word_b"), F.col("cnt").alias("count_b")
    )
    p_ab = F.col("pair_count").cast("double") / F.col("n_bigrams")
    p_a = F.col("count_a").cast("double") / F.col("n_words")
    p_b = F.col("count_b").cast("double") / F.col("n_words")
    return (
        pairs.join(ca, "word_a")
        .join(cb, "word_b")
        .crossJoin(F.broadcast(n_words))
        .crossJoin(F.broadcast(n_bigrams))
        .select(
            "word_a",
            "word_b",
            "pair_count",
            "count_a",
            "count_b",
            F.round(F.log(p_ab / (p_a * p_b)), 6).alias("pmi"),
        )
    )
