"""Scale stress for the training-mix operators.

2M synthetic docs across 200 pack groups (shards): temperature_mix over
a Zipf-ish source distribution, then sequence_packing per shard — the
per-group fold holds a whole shard's (id, n_tokens) list in one task
(the documented bound), so 10k-doc shards probe exactly the memory
shape a 100 TB run would use.  Invariants checked distributed: no bin
overflows, offsets contiguous, mixture capped at availability.

Usage: python tools/stress_packing.py [n_docs] [n_shards]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from spark_skew_join_spark.operators.packing import (
    sequence_packing,
    temperature_mix,
)
from spark_skew_join_spark.sources.tables import get_spark

N = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
SHARDS = int(sys.argv[2]) if len(sys.argv) > 2 else 200
CAPACITY = 2048


def main() -> None:
    spark = get_spark("stress-packing", cpus=32)
    # Zipf-ish source sizes (source s gets ~N/(s+1) share), token counts
    # 30..500; text itself is never materialized — n_tokens drives both
    # operators, so the stress synthesizes a one-token-repeated text
    docs = spark.range(N).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("src"),
            F.floor(F.pow(F.rand(7), F.lit(3.0)) * 20).cast("int").cast("string"),
        ).alias("source"),
        (F.pmod(F.xxhash64("id"), F.lit(471)) + 30).cast("int").alias("__nt"),
        F.pmod(F.col("id"), F.lit(SHARDS)).alias("shard"),
    ).withColumn(
        "text", F.array_join(F.array_repeat(F.lit("t"), F.col("__nt")), " ")
    ).persist()
    docs.count()

    t0 = time.perf_counter()
    mix = temperature_mix(docs, alpha=0.5, total=N // 4)
    n_mix, n_src = mix.agg(
        F.count(F.lit(1)), F.countDistinct("source")
    ).collect()[0]
    t_mix = time.perf_counter() - t0

    t0 = time.perf_counter()
    packed = sequence_packing(docs, capacity=CAPACITY, group_col="shard")
    bad = (
        packed.groupBy("shard", "bin_id")
        .agg(F.max(F.col("bin_offset") + F.col("n_tokens")).alias("end"),
             F.max("n_tokens").alias("big"))
        .where((F.col("end") > CAPACITY) & (F.col("big") <= CAPACITY))
        .count()
    )
    n_bins, n_rows = packed.agg(
        F.countDistinct("shard", "bin_id"), F.count(F.lit(1))
    ).collect()[0]
    t_pack = time.perf_counter() - t0
    print(
        f"temperature_mix {N:,} docs -> {n_mix:,} sampled across {n_src} "
        f"sources: {t_mix:.1f} s | sequence_packing {N:,} docs / {SHARDS} "
        f"shards (cap {CAPACITY}): {t_pack:.1f} s, {n_bins:,} bins, "
        f"rows={n_rows:,}, overfull_bins={bad}"
    )
    docs.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
