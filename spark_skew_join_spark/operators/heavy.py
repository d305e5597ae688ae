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

The summary pass runs over ``xxhash64`` of the composite key, not the key
itself — Arrow then moves 8-byte ints instead of strings (measured ~4× on
a 20M-row pass) and the Python-side counters stay primitive. A hash
collision can only MERGE two keys' counters, which raises lower bounds —
the candidate superset guarantee survives, and the verify pass counts the
ORIGINAL key columns exactly, so a collision-inflated false candidate is
filtered by the final threshold, never emitted.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..sketch.cms import KEY_SEP


def _mg_summaries(keyed: DataFrame, k: int) -> DataFrame:
    """Per-partition Misra-Gries summaries: rows (key, counter, 0) capped
    at ``k`` per partition, plus one (NULL, n_partition, err) row carrying
    the partition's row count and subtraction error — so the caller gets
    N and Σerr from the same single pass over the data."""

    def summarize(batches):
        import pandas as pd

        counts: dict[int, int] = {}
        n_rows = 0
        err_total = 0

        def compress() -> None:
            # MG decrement step: subtract the (k+1)-th largest counter and
            # drop non-positives — at most k strictly-greater entries
            # survive, so memory snaps back to O(k). Each compression's
            # subtraction accumulates into the partition's error bound
            # (the emitted lower bounds underestimate by ≤ err_total).
            nonlocal counts, err_total
            sub = sorted(counts.values(), reverse=True)[k]
            err_total += sub
            counts = {key: c - sub for key, c in counts.items() if c > sub}

        for pdf in batches:
            n_rows += len(pdf)
            vc = pdf["__key"].value_counts()
            for key, c in zip(vc.index.to_numpy(), vc.to_numpy()):
                ik = int(key)
                counts[ik] = counts.get(ik, 0) + int(c)
            # ADVICE r3: compress per batch, not once at partition end —
            # executor memory must be O(k), not O(distinct keys/partition),
            # or the operator's own premise (billions of distinct keys at
            # 100 TB) breaks. 4k slack amortizes the sort cost.
            if len(counts) > 4 * k:
                compress()
        if len(counts) > k:
            compress()
        out = pd.DataFrame(
            {
                "__key": pd.array(list(counts.keys()) + [None], dtype="Int64"),
                "counter": list(counts.values()) + [n_rows],
                "err": [0] * len(counts) + [err_total],
            }
        )
        yield out

    return keyed.mapInPandas(summarize, "__key long, counter long, err long")


def heavy_hitters(
    df: DataFrame, key_cols: list[str], phi: float = 0.008, k: int = 512
) -> DataFrame:
    """Keys whose count ≥ ceil(φ·N), exactly — via an MG candidate pass.

    Requires φ > 1/k for the superset guarantee (checked). Output columns:
    the key columns plus ``n_rows``.
    """
    if phi <= 1.0 / k:
        raise ValueError(f"phi={phi} must exceed 1/k={1.0 / k} for the MG guarantee")
    key_expr = F.xxhash64(
        F.concat_ws(KEY_SEP, *[F.col(c).cast("string") for c in key_cols])
    )
    keyed = df.select(key_expr.alias("__key"))

    # ONE pass over the data; the merged result (≤ k·P + 1 rows) is
    # localCheckpointed so its two consumers (the NULL totals row and the
    # candidate filter) don't re-run the mapInPandas scan
    merged = (
        _mg_summaries(keyed, k)
        .groupBy("__key")
        .agg(F.sum("counter").alias("lower"), F.sum("err").alias("errs"))
        .localCheckpoint(eager=False)
    )
    # the NULL-key row aggregates every partition's (n_rows, err)
    totals = F.broadcast(
        merged.where(F.col("__key").isNull()).select(
            F.col("lower").alias("n_total"), F.col("errs").alias("total_err")
        )
    )

    # candidate iff its merged lower bound could still reach the threshold
    candidates = (
        merged.where(F.col("__key").isNotNull())
        .crossJoin(totals)
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
        exact.crossJoin(totals)
        .where(F.col("n_rows") >= F.ceil(F.lit(phi) * F.col("n_total")))
        .select(*key_cols, "n_rows")
    )
