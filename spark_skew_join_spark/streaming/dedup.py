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


def bloom_dedup_stream(
    events: DataFrame,
    key_col: str = "event_id",
    n_shards: int = 32,
    m_bits: int = 1 << 17,
    k: int = 5,
) -> DataFrame:
    """Unbounded-horizon streaming dedup with FIXED-size state: a Bloom
    filter per hash shard (sketch/bloom.py) via applyInPandasWithState.

    ``dedup_stream`` is exact but its state lives only inside the
    watermark horizon — a key replayed days later re-emits.  This is
    the crawl/"seen URL" semantics instead: state is n_shards × m_bits
    bits FOREVER (default 32 × 16 KiB = 512 KiB total), a key is
    emitted at most once for the stream's whole lifetime, and the price
    is one-sided — a false POSITIVE silently drops a genuinely-new key
    (P bounded by the (1-e^(-kn/m))^k envelope at n inserted keys per
    shard), while emitted rows are always true first occurrences.

    Sharding: groupBy pmod(xxhash64(key), n_shards) — state updates
    parallelize across shards and each shard's filter sizes for
    n_keys/n_shards inserts.  Within a micro-batch the pandas group is
    processed in order, so intra-batch duplicates dedup too.  Output:
    the surviving rows (original columns).
    """
    import pickle

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    from ..sketch.bloom import BloomFilter, _SEED1, _SEED2

    cols = events.columns
    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in events.schema.fields
    )
    with_h = events.withColumns({
        "__bd_h1": F.xxhash64(F.col(key_col), F.lit(_SEED1)),
        "__bd_h2": F.xxhash64(F.col(key_col), F.lit(_SEED2)),
        "__bd_shard": F.pmod(F.xxhash64(F.col(key_col)), F.lit(n_shards)),
    })

    def update(key, pdfs, state: GroupState):
        bloom = pickle.loads(state.get[0]) if state.exists else BloomFilter(
            m_bits, k
        )
        for pdf in pdfs:
            h1 = pdf["__bd_h1"].to_numpy()
            h2 = pdf["__bd_h2"].to_numpy()
            fresh = ~bloom.contains_hashed(h1, h2)
            # first occurrence WITHIN the batch too: keep the first row
            # of each (h1, h2) among the fresh ones
            sub = pdf[fresh]
            sub = sub[~sub.duplicated(subset=["__bd_h1", "__bd_h2"])]
            if len(sub):
                bloom.add_hashed(
                    sub["__bd_h1"].to_numpy(), sub["__bd_h2"].to_numpy()
                )
                yield sub[cols]
        state.update((pickle.dumps(bloom),))

    deduped = with_h.groupBy("__bd_shard").applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType="sketch binary",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    return deduped


def enrich_stream(
    events: DataFrame,
    dim: DataFrame,
    on: str = "user_id",
    how: str = "left",
) -> DataFrame:
    """Stream-static enrichment join; the static dim side is broadcast."""
    return events.join(F.broadcast(dim), on=on, how=how)
