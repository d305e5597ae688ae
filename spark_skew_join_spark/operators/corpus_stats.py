"""Corpus-health statistics: n-gram diversity and Zipf/vocabulary fit.

Training-data curation reads these before and after every filter pass:
diversity collapse (falling type-token ratio, vanishing singletons) is
the standard symptom of over-deduplication or template flooding, and a
Zipf slope drifting far from -1 flags synthetic or boilerplate-heavy
corpora (natural language sits near s = 1; Piantadosi 2014 reviews the
empirical band). Both operators are pure aggregations — one explode +
one or two map-side-combined groupBys — and never move raw text across
a shuffle (grams travel as xxhash64 int64s; the SQL oracles group the
raw strings instead, so the driver gate would surface a hash collision
as a count mismatch).

No reference-repo counterpart (anish749/spark-skew-join is a join
utility); these belong to the LLM-pipeline extension surface the build
mandates alongside dedup/quality/sampling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def ngram_diversity(
    docs: DataFrame,
    n: int = 2,
    group_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Word n-gram diversity per group: how repetitive is each slice?

    Output, one row per group:
    (group_col, total_ngrams, distinct_ngrams, type_token_ratio,
     singleton_share) — TTR = distinct/total, singleton_share =
    fraction of DISTINCT n-grams occurring exactly once in the group.
    A boilerplate-flooded source shows low TTR and low singleton share
    long before per-doc quality scores move.

    Scale shape: explode positions → xxhash64 the n-token phrase →
    ONE (group, gram) count (map-side combined; the gram string never
    shuffles) → ONE per-group fold. Ratios round to 6 for oracle
    stability.
    """
    if n < 1:
        raise ValueError("n must be >= 1")
    toks = F.split(F.col(text_col), " ")
    base = (
        docs.where(F.size(toks) >= n)
        .select(F.col(group_col).alias("__g"), toks.alias("__tk"))
        .select(
            "__g",
            F.explode(
                F.sequence(F.lit(1), F.size("__tk") - (n - 1))
            ).alias("__i"),
            "__tk",
        )
    )
    gram = F.xxhash64(
        *[F.element_at(F.col("__tk"), F.col("__i") + F.lit(j)) for j in range(n)]
    )
    per_gram = base.select("__g", gram.alias("__h")).groupBy(
        "__g", "__h"
    ).agg(F.count(F.lit(1)).alias("__c"))
    return (
        per_gram.groupBy("__g")
        .agg(
            F.sum("__c").alias("total_ngrams"),
            F.count(F.lit(1)).alias("distinct_ngrams"),
            F.sum(F.when(F.col("__c") == 1, 1).otherwise(0)).alias("__s"),
        )
        .select(
            F.col("__g").alias(group_col),
            "total_ngrams",
            "distinct_ngrams",
            F.round(
                F.col("distinct_ngrams") / F.col("total_ngrams").cast("double"),
                6,
            ).alias("type_token_ratio"),
            F.round(
                F.col("__s") / F.col("distinct_ngrams").cast("double"), 6
            ).alias("singleton_share"),
        )
    )


def zipf_vocab_stats(
    docs: DataFrame,
    top_k: int = 100,
    text_col: str = "text",
) -> DataFrame:
    """One-row corpus fingerprint: vocabulary size, singleton share,
    top-``top_k`` mass, and the Zipf slope.

    The slope is the closed-form OLS coefficient of ln(freq) on
    ln(rank) over the ``top_k`` most frequent tokens. Rank ties break
    on the token hash here and on the raw token in the SQL oracle —
    the tiebreaks DIFFER, and the output is still EXACT: permuting
    tied-count tokens permutes identical (rank set, freq) pairs, so
    every aggregate over the top-k is tie-order invariant (including
    a tie group straddling the top_k boundary: the excluded member's
    freq equals the included one's). Natural corpora fit s ≈ -1.
    Output:
    (n_tokens, vocab_size, singleton_share, topk_coverage, zipf_slope),
    ratios and slope rounded to 6.

    Scale shape: one token-count aggregation (map-side combined int64
    keys), a ``top_k``-row window cut on the count table (top_k is a
    constant — the window input is pre-cut by a count threshold at
    scale if needed; here the count table is small next to the corpus),
    and two scalar folds. No raw token crosses a shuffle.
    """
    if top_k < 2:
        raise ValueError("top_k must be >= 2 for a slope")
    toks = (
        docs.select(
            F.explode(F.split(F.col(text_col), " ")).alias("__tok")
        )
        .select(F.xxhash64("__tok").alias("__h"))
        .groupBy("__h")
        .agg(F.count(F.lit(1)).alias("__c"))
    )
    totals = toks.agg(
        F.sum("__c").alias("n_tokens"),
        F.count(F.lit(1)).alias("vocab_size"),
        F.round(
            F.sum(F.when(F.col("__c") == 1, 1).otherwise(0))
            / F.count(F.lit(1)).cast("double"),
            6,
        ).alias("singleton_share"),
    )
    w = Window.orderBy(F.col("__c").desc(), F.col("__h").asc())
    top = toks.withColumn("__r", F.row_number().over(w)).where(
        F.col("__r") <= top_k
    )
    x = F.log(F.col("__r").cast("double"))
    y = F.log(F.col("__c").cast("double"))
    fit = top.agg(
        F.sum("__c").alias("__topc"),
        F.count(F.lit(1)).alias("__n"),
        F.sum(x).alias("__sx"),
        F.sum(y).alias("__sy"),
        F.sum(x * y).alias("__sxy"),
        F.sum(x * x).alias("__sxx"),
    ).select(
        "__topc",
        F.round(
            (F.col("__n") * F.col("__sxy") - F.col("__sx") * F.col("__sy"))
            / (F.col("__n") * F.col("__sxx") - F.col("__sx") * F.col("__sx")),
            6,
        ).alias("zipf_slope"),
    )
    return totals.crossJoin(F.broadcast(fit)).select(
        "n_tokens",
        "vocab_size",
        "singleton_share",
        F.round(F.col("__topc") / F.col("n_tokens").cast("double"), 6).alias(
            "topk_coverage"
        ),
        "zipf_slope",
    )
