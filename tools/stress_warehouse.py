"""Scale stress for the warehouse-mutation + pipeline operators added in
round 4 (merge/CDC, funnel, chunk-level boilerplate dedup).

1. merge_upsert: 100M-row target, 1M-row changeset (0.5% updates + 0.5%
   inserts). The changeset key set should broadcast into the anti join —
   the target must NOT shuffle. Verifies row count and update count.
2. funnel_stages: 50M events over 5M users, 3 stages. Chained
   entity-keyed aggregations; wall-clock + stage-count sanity.
3. chunk_dedup_stats: 2M synthetic ~60-token docs, 10% sharing a planted
   boilerplate chunk. Verifies the planted chunk is flagged in exactly
   the planted docs and nothing else is (construction guarantees
   uniqueness of organic chunks via per-doc token ids).

Usage: python tools/stress_warehouse.py [target_rows] [events] [docs]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from spark_skew_join_spark.operators.boilerplate import chunk_dedup_stats
from spark_skew_join_spark.operators.funnel import funnel_stages
from spark_skew_join_spark.operators.merge import merge_upsert
from spark_skew_join_spark.sources.tables import get_spark

TARGET_ROWS = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000_000
EVENT_ROWS = int(sys.argv[2]) if len(sys.argv) > 2 else 50_000_000
DOC_ROWS = int(sys.argv[3]) if len(sys.argv) > 3 else 2_000_000


def timed(df) -> float:
    t0 = time.perf_counter()
    df.write.mode("overwrite").format("noop").save()
    return time.perf_counter() - t0


def main() -> None:
    spark = get_spark("stress-warehouse", cpus=32)

    # --- 1. merge_upsert at 100M ------------------------------------
    target = spark.range(TARGET_ROWS).select(
        F.col("id").alias("k"),
        (F.col("id") % 97).cast("double").alias("v"),
        F.lit("base").alias("status"),
    )
    n_chg = TARGET_ROWS // 200  # 0.5% updates, 0.5% inserts
    updates = spark.range(n_chg).select(
        (F.col("id") * 200).alias("k"),
        F.lit(-1.0).alias("v"),
        F.lit("upd").alias("status"),
    )
    inserts = spark.range(n_chg).select(
        (F.col("id") + TARGET_ROWS).alias("k"),
        F.lit(0.0).alias("v"),
        F.lit("new").alias("status"),
    )
    merged = merge_upsert(target, updates.unionByName(inserts), ["k"])
    t = timed(merged)
    plan = merged._jdf.queryExecution().executedPlan().toString()
    n = merged.count()
    n_upd = merged.where("status = 'upd'").count()
    print(
        f"merge_upsert {TARGET_ROWS:,} target + {2*n_chg:,} changes: "
        f"{t:.1f} s, rows={n:,} (expect {TARGET_ROWS + n_chg:,}), "
        f"updated={n_upd:,} (expect {n_chg:,}), "
        f"target_shuffled={'Exchange hashpartitioning(k' in plan}"
    )

    # --- 2. funnel at 50M events ------------------------------------
    ev = spark.range(EVENT_ROWS).select(
        (F.col("id") % (EVENT_ROWS // 10)).alias("uid"),
        F.element_at(
            F.array(F.lit("a"), F.lit("b"), F.lit("c"), F.lit("x")),
            (F.pmod(F.xxhash64("id"), F.lit(4)) + 1).cast("int"),
        ).alias("t"),
        F.col("id").alias("ts"),
    )
    fun = funnel_stages(ev, "uid", "t", "ts", ["a", "b", "c"])
    t = timed(fun)
    dist = {r["reached"]: r["cnt"] for r in
            fun.groupBy("reached").agg(F.count(F.lit(1)).alias("cnt")).collect()}
    print(f"funnel {EVENT_ROWS:,} events / {EVENT_ROWS // 10:,} users: "
          f"{t:.1f} s, reached-dist={dist}")

    # --- 3. chunk dedup at 2M docs ----------------------------------
    # organic tokens are globally unique per doc (docid_pos), so organic
    # chunks can never collide across docs; docs with id % 10 == 0 get a
    # planted 10-token boilerplate chunk as their head
    boiler = " ".join(f"b{i}" for i in range(10))
    organic = F.array_join(
        F.transform(
            F.sequence(F.lit(0), F.lit(49)),
            lambda i: F.concat_ws("_", F.col("id").cast("string"),
                                  i.cast("string")),
        ),
        " ",
    )
    docs = spark.range(DOC_ROWS).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 10 == 0,
               F.concat(F.lit(boiler + " "), organic))
        .otherwise(organic)
        .alias("text"),
    )
    out = chunk_dedup_stats(docs, "doc_id", "text", chunk_tokens=10)
    t = timed(out)
    agg = out.agg(
        F.sum("n_dup_chunks").alias("dups"),
        F.count(F.lit(1)).alias("docs"),
        F.sum(F.when(F.col("n_dup_chunks") > 0, 1).otherwise(0)).alias(
            "docs_with_dup"
        ),
    ).collect()[0]
    print(
        f"chunk_dedup {DOC_ROWS:,} docs: {t:.1f} s, "
        f"flagged_chunks={agg['dups']:,} docs_with_dup={agg['docs_with_dup']:,} "
        f"(expect {DOC_ROWS // 10:,} each), docs={agg['docs']:,}"
    )
    spark.stop()


if __name__ == "__main__":
    main()
