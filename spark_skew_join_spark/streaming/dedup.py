"""Streaming deduplication + stream-static enrichment.

Two training-data-pipeline staples the batch operators don't cover:

* ``dedup_stream`` — drop duplicate events inside the watermark horizon
  (``dropDuplicatesWithinWatermark``): exactly-once-per-key semantics for
  at-least-once sources. State holds one entry per key seen within the
  watermark — bounded, unlike plain ``dropDuplicates`` on a stream whose
  state grows forever.
* ``enrich_stream`` — join a stream against a static dimension table
  (stream-static join). The static side is broadcast; no state, no
  watermark needed — each micro-batch joins map-side.

Batch counterparts used for parity testing: ``dropDuplicates`` and a plain
broadcast join (see tests/test_streaming.py).

Scale: dedup state is keyed by the id column and evicted by the watermark;
a hot key does not accumulate state (one entry per key). The enrichment
broadcast must fit executors — for big dims fall back to a shuffled join
or the skew_join machinery.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def dedup_stream(
    events: DataFrame,
    key_cols: list[str] | None = None,
    ts_col: str = "ts",
    watermark: str = "2 hours",
) -> DataFrame:
    """Drop duplicates by ``key_cols`` within the watermark horizon.

    Streaming input → dropDuplicatesWithinWatermark (bounded state);
    batch input → plain dropDuplicates (same output on replayed data whose
    duplicates all fall inside the horizon)."""
    key_cols = key_cols or ["event_id"]
    if events.isStreaming:
        return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
            key_cols
        )
    return events.dropDuplicates(key_cols)


def enrich_stream(
    events: DataFrame,
    dim: DataFrame,
    on: str = "user_id",
    how: str = "left",
) -> DataFrame:
    """Stream-static enrichment join; the static dim side is broadcast."""
    return events.join(F.broadcast(dim), on=on, how=how)
