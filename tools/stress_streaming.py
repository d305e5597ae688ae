"""Scale stress for the stateful streaming operators.

Replays a synthetic 2M-event CDC/clickstream feed (200k users) through
file-source streams in multiple micro-batches and measures end-to-end
wall-clock:

1. streaming_funnel — per-user O(stages) state, result must equal the
   batch funnel on the same data (full parity check, not sampling).
2. CDC upsert sink — seq-aware last-wins into a versioned parquet
   table; final snapshot must equal the batch max_by result.

Usage: python tools/stress_streaming.py [events] [users] [batches]
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from spark_skew_join_spark.operators.funnel import funnel_stages
from spark_skew_join_spark.sources.tables import get_spark
from spark_skew_join_spark.streaming.cdc import read_upsert_table, upsert_stream
from spark_skew_join_spark.streaming.funnel import streaming_funnel

EVENTS = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
USERS = int(sys.argv[2]) if len(sys.argv) > 2 else 200_000
BATCHES = int(sys.argv[3]) if len(sys.argv) > 3 else 4


def main() -> None:
    spark = get_spark("stress-streaming", cpus=32)
    work = tempfile.mkdtemp(prefix="sgstream_")
    src = os.path.join(work, "feed")
    ev = spark.range(EVENTS).select(
        (F.col("id") % USERS).alias("user_id"),
        F.element_at(
            F.array(F.lit("a"), F.lit("b"), F.lit("c"), F.lit("x")),
            (F.pmod(F.xxhash64("id"), F.lit(4)) + 1).cast("int"),
        ).alias("event_type"),
        F.col("id").alias("us"),
        (F.col("id") % 97).cast("double").alias("value"),
    )
    # the funnel operator's contract is in-order delivery (its docstring:
    # late events preceding a committed stage are ignored) — so the feed
    # is written as consecutive TIME SLICES, one file batch each, written
    # sequentially so the file source replays them in event-time order
    slice_sz = EVENTS // BATCHES
    for b in range(BATCHES):
        ev.where(
            (F.col("us") >= b * slice_sz)
            & (F.col("us") < (b + 1) * slice_sz if b < BATCHES - 1
               else F.lit(True))
        ).coalesce(1).write.mode("append").parquet(src)
        time.sleep(1.1)  # distinct mtimes → deterministic replay order

    # --- 1. streaming funnel ----------------------------------------
    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(src)
    )
    t0 = time.perf_counter()
    q = (
        streaming_funnel(stream, "user_id", "event_type", "us",
                         ["a", "b", "c"])
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("sfun")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    t_funnel = time.perf_counter() - t0
    got = spark.sql(
        """SELECT user_id, max_by(reached, t_1 + t_2 + t_3) AS reached
           FROM sfun GROUP BY user_id"""
    ).where("reached >= 1")
    exp = funnel_stages(ev, "user_id", "event_type", "us", ["a", "b", "c"])
    mismatch = (
        got.select("user_id", "reached")
        .exceptAll(exp.select("user_id", "reached"))
        .count()
        + exp.select("user_id", "reached")
        .exceptAll(got.select("user_id", "reached"))
        .count()
    )
    print(
        f"streaming_funnel {EVENTS:,} events / {USERS:,} users / "
        f"{BATCHES} batches: {t_funnel:.1f} s "
        f"({EVENTS / t_funnel / 1e6:.2f} M events/s), "
        f"batch-parity mismatches={mismatch}"
    )

    # --- 1b. OUT-OF-ORDER funnel (bounded-lateness reorder buffer) ---
    # the in-order operator's documented failure mode: time slices
    # replayed with cross-boundary disorder. Each slice keeps ~0.1% of
    # its tail events back one batch (disorder bounded by the slice's
    # tail span), every slice is internally shuffled, and a far-future
    # sentinel flushes the buffers. streaming_funnel_unordered must
    # still match the batch funnel exactly.
    from spark_skew_join_spark.streaming.funnel import (
        streaming_funnel_unordered,
    )

    src_u = os.path.join(work, "feed_unordered")
    hold = slice_sz // 1000  # events held back across each boundary
    for b in range(BATCHES):
        lo, hi = b * slice_sz, (b + 1) * slice_sz
        cond = (F.col("us") >= lo) & (
            F.col("us") < hi if b < BATCHES - 1 else F.lit(True)
        )
        # late tail of the PREVIOUS slice joins this batch
        if b > 0:
            cond = cond | (
                (F.col("us") >= lo - hold) & (F.col("us") < lo)
            )
        if b < BATCHES - 1:
            cond = cond & (F.col("us") < hi - hold)
        ev.where(cond).orderBy(F.xxhash64("us")).coalesce(1).write.mode(
            "append"
        ).parquet(src_u)
        time.sleep(1.1)
    sentinel_us = EVENTS + 10_000_000_000
    spark.createDataFrame(
        [(-1, "x", sentinel_us, 0.0)], ev.schema
    ).coalesce(1).write.mode("append").parquet(src_u)
    time.sleep(1.1)

    stream_u = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(src_u)
    )
    t0 = time.perf_counter()
    qu = (
        streaming_funnel_unordered(
            stream_u, "user_id", "event_type", "us", ["a", "b", "c"],
            lateness=f"{max(hold * 2, 10)} microseconds",
        )
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("sfun_u")
        .start()
    )
    qu.processAllAvailable()
    qu.stop()
    t_unordered = time.perf_counter() - t0
    got_u = spark.sql(
        """SELECT user_id, max_by(reached, t_1 + t_2 + t_3) AS reached
           FROM sfun_u WHERE user_id >= 0 GROUP BY user_id"""
    ).where("reached >= 1")
    mismatch_u = (
        got_u.exceptAll(exp.select("user_id", "reached")).count()
        + exp.select("user_id", "reached").exceptAll(got_u).count()
    )
    print(
        f"streaming_funnel_unordered {EVENTS:,} events, {BATCHES} shuffled "
        f"batches (+{hold}-event cross-boundary disorder): "
        f"{t_unordered:.1f} s ({EVENTS / t_unordered / 1e6:.2f} M events/s), "
        f"batch-parity mismatches={mismatch_u}"
    )
    # the unordered run drives one EXTRA trigger (the sentinel batch
    # whose watermark advance fires every user's flush timer), so the
    # per-trigger column is the operator-overhead comparison
    print(
        f"unordered/in-order ratio: {t_unordered / t_funnel:.2f}x wall "
        f"({BATCHES + 1} vs {BATCHES} triggers; "
        f"{(t_unordered / (BATCHES + 1)) / (t_funnel / BATCHES):.2f}x "
        f"per trigger)"
    )

    # --- 2. CDC upsert sink -----------------------------------------
    tbl = os.path.join(work, "tbl")
    stream2 = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    t0 = time.perf_counter()
    q2 = upsert_stream(stream2, tbl, ["user_id"], "us", "scdc")
    q2.processAllAvailable()
    q2.stop()
    t_cdc = time.perf_counter() - t0
    final = read_upsert_table(spark, tbl)
    exp2 = ev.groupBy("user_id").agg(F.max("us").alias("us"))
    bad = (
        final.select("user_id", "us")
        .exceptAll(exp2)
        .count()
    )
    print(
        f"cdc_upsert_sink {EVENTS:,} events → {final.count():,}-row table, "
        f"{BATCHES} copy-on-write epochs: {t_cdc:.1f} s, "
        f"latest-state mismatches={bad}"
    )
    spark.stop()


if __name__ == "__main__":
    main()
