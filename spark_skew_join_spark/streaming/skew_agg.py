"""Skew-aware streaming aggregation: salted two-phase windowed agg.

The reference's problem — one hot key concentrating a shuffle — has a
streaming twin: one hot key concentrates STATE. A windowed
`groupBy(window, key)` keeps one state-store entry per (window, key), and
every micro-batch routes all of a hot key's rows to the single task that
owns that entry; with a Zipf key distribution one state-store partition
does most of the update work per batch.

Fix = the same salt trick, stream-side: phase 1 aggregates
(window, key, salt) — hot keys spread over ``n_salts`` state entries
updated by different tasks — and phase 2 merges the partials per
(window, key). Spark ≥3.5 supports chained streaming aggregations in
append mode (both stateful operators watermark-aligned), so both phases
live in ONE streaming query; partial sums/counts merge losslessly
(sum-of-sums, sum-of-counts — never average-of-averages).

The salt must be DETERMINISTIC per row (hash of a payload column, not
rand()): under micro-batch replay after failure, a random salt would
re-split a key's rows differently and double-count in the merged state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def salted_window_agg(
    events: DataFrame,
    key_col: str = "event_type",
    value_col: str = "value",
    window: str = "1 hour",
    watermark: str = "2 hours",
    n_salts: int = 8,
    ts_col: str = "ts",
    salt_src: str = "event_id",
) -> DataFrame:
    """Two-phase skew-safe windowed sum/count over a stream (append mode).

    Output: (hour_start bigint, <key_col>, n_events, sum_value) — identical
    to the direct single-phase aggregation, but no single state entry ever
    absorbs more than ~1/n_salts of a hot key's updates.
    """
    salt = F.pmod(F.xxhash64(F.col(salt_src)), F.lit(n_salts)).alias("__salt")
    # same plan runs on batch DataFrames (the parity oracle); watermarks
    # only apply to streams
    if events.isStreaming:
        events = events.withWatermark(ts_col, watermark)
    # decimal partials: float sums depend on accumulation order, which the
    # salting changes — decimal sums make salted ≡ unsalted ≡ batch exact
    partial = (
        events
        .groupBy(F.window(ts_col, window).alias("w"), F.col(key_col), salt)
        .agg(
            F.count(F.lit(1)).alias("__n"),
            F.sum(F.col(value_col).cast("decimal(24,6)")).alias("__s"),
        )
    )
    # phase 2 re-windows OVER the phase-1 window column (`window(w, same)`),
    # the Spark ≥3.5 chained-streaming-aggregation pattern — grouping on the
    # raw struct instead fails the global-watermark correctness check
    # because event-time lineage wouldn't propagate to the second operator
    return (
        partial.groupBy(F.window(F.col("w"), window).alias("w2"), F.col(key_col))
        .agg(
            F.sum("__n").alias("n_events"),
            F.sum("__s").alias("__sum_dec"),
        )
        .select(
            F.unix_timestamp(F.col("w2.start")).alias("hour_start"),
            key_col,
            "n_events",
            F.col("__sum_dec").cast("double").alias("sum_value"),
        )
    )
