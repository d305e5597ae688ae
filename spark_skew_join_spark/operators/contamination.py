"""Benchmark-contamination screening: word-n-gram overlap of a training
corpus against an evaluation set.

Standard decontamination methodology (GPT-3 appx. C / PaLM §8: a training
document is contaminated if it shares ≥ one word n-gram with any eval
document; containment ratio = contaminated n-grams / doc n-grams).

Scale design (100 TB): the eval set is small by construction, so its
distinct n-gram set is broadcast — the per-train-doc probe is a map-side
hash-join against the broadcast set, no shuffle of the corpus.  N-grams are
deduplicated per document *before* the join (set semantics).  At real scale
the join key would be ``xxhash64(ngram)`` (8 bytes instead of the string);
here the raw string is the key so the DuckDB oracle is engine-exact —
semantics are identical, only key width differs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def word_ngrams(text_col, n: int):
    """array<string> of word n-grams (codegen transform/slice; empty for
    docs with < n words)."""
    tokens = F.split(text_col, " ")
    size = F.size(tokens)
    idx = F.when(size >= n, F.sequence(F.lit(0), size - n)).otherwise(
        F.array().cast("array<int>")
    )
    return F.transform(idx, lambda i: F.array_join(F.slice(tokens, i + 1, n), " "))


def contamination_report(train: DataFrame, eval_docs: DataFrame, n: int = 5,
                         id_col: str = "doc_id",
                         text_col: str = "text") -> DataFrame:
    """Per-train-doc contamination: (id_col, total_ngrams,
    contaminated_ngrams, containment) with containment = contaminated /
    total (0.0 when the doc has < n words)."""
    t_grams = train.select(
        F.col(id_col), F.explode_outer(word_ngrams(F.col(text_col), n)).alias("_ng")
    ).distinct()
    e_grams = (
        eval_docs.select(F.explode(word_ngrams(F.col(text_col), n)).alias("_ng"))
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    probed = t_grams.join(F.broadcast(e_grams), "_ng", "left")
    return probed.groupBy(id_col).agg(
        F.sum(F.when(F.col("_ng").isNotNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("total_ngrams"),
        F.sum(F.when(F.col("_hit").isNotNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("contaminated_ngrams"),
        F.when(
            F.sum(F.when(F.col("_ng").isNotNull(), 1).otherwise(0)) == 0, F.lit(0.0)
        )
        .otherwise(
            F.sum(F.when(F.col("_hit").isNotNull(), 1).otherwise(0))
            / F.sum(F.when(F.col("_ng").isNotNull(), 1).otherwise(0))
        )
        .alias("containment"),
    )
