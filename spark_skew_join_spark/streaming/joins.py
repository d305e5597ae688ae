"""Stream-stream joins with watermarks (interval join).

Covers the remaining Structured Streaming surface: joining two unbounded
streams requires bounding state with watermarks on both sides plus a time
interval in the join condition; Spark buffers only rows inside the
watermark horizon.

``clicks_to_purchases`` attributes each purchase to the same user's clicks
in the preceding ``window_s`` seconds — the canonical conversion-attribution
interval join. Batch-mode equivalent semantics make it testable by replaying
the events parquet through file streams (stream-vs-batch parity, like
windows.py).

Scale: state size is O(events inside the watermark horizon) per user —
bounded; hot users fan out on the (user_id) shuffle like any keyed join and
can be pre-salted with the skew_join machinery if a single user dominates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def clicks_to_purchases(
    clicks: DataFrame,
    purchases: DataFrame,
    window_s: int = 3600,
    watermark: str = "2 hours",
) -> DataFrame:
    """Join purchases to same-user clicks within the prior ``window_s``
    seconds. Works on both streaming and batch inputs (same plan shape);
    with streaming inputs both sides carry watermarks so join state is
    evictable.

    Output: (purchase_id, user_id, purchase_ts, click_id, click_ts).
    """
    c = clicks.select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("click_ts"),
    )
    p = purchases.select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("purchase_ts"),
    )
    if c.isStreaming:
        c = c.withWatermark("click_ts", watermark)
    if p.isStreaming:
        p = p.withWatermark("purchase_ts", watermark)
    cond = (
        (F.col("c_user") == F.col("p_user"))
        & (F.col("click_ts") <= F.col("purchase_ts"))
        & (
            F.col("click_ts")
            >= F.col("purchase_ts") - F.expr(f"INTERVAL {window_s} SECONDS")
        )
    )
    return c.join(p, cond, "inner").select(
        "purchase_id",
        F.col("p_user").alias("user_id"),
        "purchase_ts",
        "click_id",
        "click_ts",
    )
