"""Distributed heavy hitters (φ-frequent keys) with exact output.

A plain ``groupBy(key).count().where(count >= φ·N)`` is already the right
plan when the key cardinality fits a shuffle. At 100 TB with billions of
distinct keys the shuffle of (key, partial_count) pairs is the cost — the
classic fix is a mergeable frequency summary: per-partition Misra-Gries
(the batch form: keep the top-k counters after subtracting the (k+1)-th
largest), whose merged counters underestimate any key's true count by at
most Σᵢ errᵢ ≤ N/k. Every key with true count ≥ φ·N therefore survives
the summary when φ > 1/k — a guaranteed candidate superset with bounded
size (≤ k rows per partition crossing the shuffle, not one per distinct
key).

The second pass restricts an exact count to the candidates (broadcast
semi-join — map-side filter, tiny shuffle) so the final output is EXACT,
not approximate: same rows as the plain groupBy/HAVING, which is the
oracle. This mirrors how the skew-join uses its CMS (cheap summary first,
exact work scoped by it) — see `/root/reference/src/main/scala/org/anish/
spark/skew/dfimplicits.scala:51-57` for the reference's version of the
pattern.

Everything stays lazy: N and the threshold are 1-row aggregates cross-
joined into the plan (broadcast NL of one row), so registering the query
triggers no driver-side action.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..sketch.cms import KEY_SEP


def _mg_summaries(keyed: DataFrame, k: int) -> DataFrame:
    """Per-partition Misra-Gries summaries: rows (key, counter) capped at
    ``k`` per partition, plus one (NULL, err) row carrying the partition's
    subtraction error."""

    def summarize(batches):
        import pandas as pd

        counts: dict[str, int] = {}
        for pdf in batches:
            vc = pdf["__key"].value_counts()
            for key, c in vc.items():
                counts[key] = counts.get(key, 0) + int(c)
        err = 0
        if len(counts) > k:
            ordered = sorted(counts.values(), reverse=True)
            err = ordered[k]  # (k+1)-th largest
            counts = {key: c - err for key, c in counts.items() if c > err}
        out = pd.DataFrame(
            {
                "__key": list(counts.keys()) + [None],
                "counter": list(counts.values()) + [0],
                "err": [0] * len(counts) + [err],
            }
        )
        yield out

    return keyed.mapInPandas(summarize, "__key string, counter long, err long")


def heavy_hitters(
    df: DataFrame, key_cols: list[str], phi: float = 0.008, k: int = 512
) -> DataFrame:
    """Keys whose count ≥ ceil(φ·N), exactly — via an MG candidate pass.

    Requires φ > 1/k for the superset guarantee (checked). Output columns:
    the key columns plus ``n_rows``.
    """
    if phi <= 1.0 / k:
        raise ValueError(f"phi={phi} must exceed 1/k={1.0 / k} for the MG guarantee")
    key_expr = F.concat_ws(KEY_SEP, *[F.col(c).cast("string") for c in key_cols])
    keyed = df.select(key_expr.alias("__key"))

    summaries = _mg_summaries(keyed, k)
    merged = (
        summaries.where(F.col("__key").isNotNull())
        .groupBy("__key")
        .agg(F.sum("counter").alias("lower"))
    )
    total_err = summaries.where(F.col("__key").isNull()).agg(
        F.coalesce(F.sum("err"), F.lit(0)).alias("total_err")
    )
    total = df.agg(F.count(F.lit(1)).alias("n_total"))

    # candidate iff its merged lower bound could still reach the threshold
    candidates = (
        merged.crossJoin(F.broadcast(total_err))
        .crossJoin(F.broadcast(total))
        .where(
            F.col("lower") + F.col("total_err")
            >= F.ceil(F.lit(phi) * F.col("n_total"))
        )
        .select("__key")
    )

    exact = (
        df.withColumn("__key", key_expr)
        .join(F.broadcast(candidates), "__key", "left_semi")
        .groupBy(*key_cols)
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )
    return (
        exact.crossJoin(F.broadcast(total))
        .where(F.col("n_rows") >= F.ceil(F.lit(phi) * F.col("n_total")))
        .select(*key_cols, "n_rows")
    )
