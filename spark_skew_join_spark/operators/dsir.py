"""DSIR-style importance weighting for data selection (Xie et al. 2023,
"Data Selection for Language Models via Importance Resampling").

The public recipe: featurize every document as hashed n-gram counts
over B buckets, fit two smoothed bucket distributions — the TARGET
(what you want more of, e.g. a trusted domain) and the RAW corpus —
and score each document by its log importance weight

    log w(doc) = sum_b count_b(doc) * (log p_target(b) - log p_raw(b)).

High-weight documents look more like the target than the raw corpus;
resampling by w re-balances the mixture toward the target domain.

Spark shape (100 TB): featurization is explode + pmod(hash) + groupBy
(map-side combine; 8-byte bucket keys); both distributions are B-row
aggregates that BROADCAST into the scoring join, so the corpus is
scanned twice (once for the raw distribution, once for scoring) and
shuffled only as (doc, bucket, count) rows.  Zero Python UDFs.

``hash_fn="md5"`` buckets via the first 8 hex chars of md5 — bit-equal
in ANSI SQL, so the registry query is EXACT-checkable; ``"xxhash64"``
is the cheaper scale path (same distribution properties).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _bucket(gram, n_buckets: int, hash_fn: str):
    if hash_fn == "xxhash64":
        return F.pmod(F.xxhash64(gram), F.lit(n_buckets))
    if hash_fn == "md5":
        return F.pmod(
            F.conv(F.substring(F.md5(gram), 1, 8), 16, 10).cast("long"),
            F.lit(n_buckets),
        )
    raise ValueError(f"hash_fn must be xxhash64|md5, got {hash_fn!r}")


def hashed_gram_buckets(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 512,
    include_bigrams: bool = True,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """(id, bucket, cnt): hashed unigram (+ bigram) counts per doc."""
    # unigram and bigram streams explode separately and union — the
    # old transform() bigram lambda fell out of whole-stage codegen
    # (2.7 s → 0.9 s warm at sf0.1, BASELINE.md r9); positions +
    # element_at keep the whole build codegen
    toks = F.split(F.col(text_col), " ")
    grams_df = docs.select(F.col(id_col), F.explode(toks).alias("g"))
    if include_bigrams:
        base = (
            docs.where(F.size(toks) >= 2)
            .select(F.col(id_col), toks.alias("__tk"))
            .select(
                id_col,
                F.explode(
                    F.sequence(F.lit(1), F.size("__tk") - 1)
                ).alias("__i"),
                "__tk",
            )
        )
        bi = base.select(
            F.col(id_col),
            F.concat_ws(
                " ",
                F.element_at(F.col("__tk"), F.col("__i")),
                F.element_at(F.col("__tk"), F.col("__i") + F.lit(1)),
            ).alias("g"),
        )
        grams_df = grams_df.unionByName(bi)
    return (
        grams_df
        .select(id_col, _bucket(F.col("g"), n_buckets, hash_fn).alias("bucket"))
        .groupBy(id_col, "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def importance_weights(
    docs: DataFrame,
    target_docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 512,
    include_bigrams: bool = True,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Per-document DSIR log importance weight.

    Output: (id, n_grams, log_weight) — log_weight > 0 means the
    document is more target-like than raw-corpus-like under the hashed
    n-gram model.  Both distributions use add-one smoothing over the
    same B buckets, so every bucket has positive mass and the log is
    total."""
    raw_b = hashed_gram_buckets(
        docs, text_col, id_col, n_buckets, include_bigrams, hash_fn
    )
    tgt_b = hashed_gram_buckets(
        target_docs, text_col, id_col, n_buckets, include_bigrams, hash_fn
    )

    def dist(b: DataFrame) -> DataFrame:
        counts = b.groupBy("bucket").agg(F.sum("cnt").alias("bn"))
        total = counts.agg(F.sum("bn").alias("tot"))
        return counts.crossJoin(F.broadcast(total)).select(
            "bucket",
            F.log((F.col("bn") + 1.0) / (F.col("tot") + F.lit(float(n_buckets))))
            .alias("logp"),
            (F.log(F.lit(1.0) / (F.col("tot") + F.lit(float(n_buckets))))).alias(
                "logp_absent"
            ),
        )

    raw_d = dist(raw_b).select(
        "bucket", F.col("logp").alias("lq"), F.col("logp_absent").alias("lq0")
    )
    tgt_d = dist(tgt_b).select(
        "bucket", F.col("logp").alias("lp"), F.col("logp_absent").alias("lp0")
    )
    # absent-bucket mass: a bucket unseen in a corpus still has smoothed
    # probability 1/(N+B); carry each table's absent-logp on every row
    # via a 1-row broadcast so outer-join gaps fill correctly
    lq0 = raw_d.agg(F.first("lq0").alias("lq0"))
    lp0 = tgt_d.agg(F.first("lp0").alias("lp0"))
    scored = (
        raw_b.join(tgt_d.select("bucket", "lp"), on="bucket", how="left")
        .join(raw_d.select("bucket", "lq"), on="bucket", how="left")
        .crossJoin(F.broadcast(lq0))
        .crossJoin(F.broadcast(lp0))
        .select(
            id_col,
            "cnt",
            (
                F.col("cnt")
                * (
                    F.coalesce("lp", "lp0") - F.coalesce("lq", "lq0")
                )
            ).alias("contrib"),
        )
    )
    return scored.groupBy(id_col).agg(
        F.sum("cnt").cast("long").alias("n_grams"),
        F.sum("contrib").alias("log_weight"),
    )


def gumbel_key(id_col: str, weight_col: str, temperature: float = 1.0):
    """Deterministic Gumbel perturbation of a log-weight: key =
    log_w/τ − ln(−ln(u)) with u derived from the md5 hash of the id
    (the same md5-rank idiom as packing.temperature_mix), so the
    'random' draw is engine- and partitioning-independent and the SQL
    oracle reproduces the exact sampled set.  Taking the top-k keys is
    Gumbel-top-k: a weighted sample WITHOUT replacement proportional
    to softmax(log_w/τ) (Vieira 2014 / Kool et al. 2019)."""
    u = (
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10)
        .cast("long")
        + F.lit(0.5)
    ) / F.lit(4294967296.0)
    return F.col(weight_col) / F.lit(float(temperature)) - F.log(-F.log(u))


def dsir_resample(
    weights: DataFrame,
    k: int,
    method: str = "gumbel",
    temperature: float = 1.0,
    id_col: str = "doc_id",
    weight_col: str = "log_weight",
) -> DataFrame:
    """The selection half of DSIR (Xie et al. 2023 §2.3 — the paper's
    importance RESAMPLING step, which importance_weights alone leaves
    to the caller; VERDICT r5 missing #1): pick ``k`` documents from a
    scored table by importance.

    * ``method="top_k"`` — the k largest log-weights (deterministic
      ``id_col`` tiebreak): the hard-selection variant.
    * ``method="gumbel"`` (default) — Gumbel-top-k: a weighted sample
      without replacement ∝ softmax(log_w/temperature), with the
      Gumbel noise derived deterministically from md5(id) so the
      sample is reproducible and SQL-oracle-checkable.

    Returns the selected rows of ``weights`` unchanged (all columns).
    Scale: orderBy+limit plans as TakeOrderedAndProject — a per-
    partition top-k fold + a k-row driver merge, never a global sort."""
    if method == "top_k":
        key = F.col(weight_col)
    elif method == "gumbel":
        key = gumbel_key(id_col, weight_col, temperature)
    else:
        raise ValueError(f"method must be top_k|gumbel, got {method!r}")
    return (
        weights.withColumn("__key", key)
        .orderBy(F.desc("__key"), id_col)
        .limit(k)
        .drop("__key")
    )
