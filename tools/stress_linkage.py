"""Scale stress for record linkage.

N left records link against a dirtied copy (first char of a 32-char
md5-derived name replaced → Levenshtein 1, score 1−1/32 ≈ 0.969) plus
N/4 pure-noise distractors.  Blocking key = last 6 chars of the name
(stable under the perturbation, 16^6 values → ~N/16M rows per block),
so candidate volume stays ≈ N despite the N×(N+N/4) pair space.

Probes:
* end-to-end wall + recall (every planted pair re-found) + precision
  (best-match picks the true twin, not a distractor);
* degenerate-block guard: a planted hot block ('zzzzzz' on both sides,
  N/100 rows each → quadratic if joined) must be excluded by
  block_cap with NO blowup in wall-clock.

Usage: python tools/stress_linkage.py [n_records]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from spark_skew_join_spark.operators.linkage import link_records
from spark_skew_join_spark.sources.tables import get_spark

N = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000


def main() -> None:
    spark = get_spark("stress-linkage", cpus=32)
    base = spark.range(N).select(
        F.col("id"), F.md5(F.col("id").cast("string")).alias("name")
    )
    left = base.withColumn("blk", F.expr("right(name, 6)"))
    twins = base.select(
        (F.col("id") + 10_000_000).alias("rid"),
        F.expr("concat('z', substring(name, 2))").alias("name"),
    )
    noise = spark.range(N // 4).select(
        (F.col("id") + 20_000_000).alias("rid"),
        F.md5((F.col("id") + 777_777_777).cast("string")).alias("name"),
    )
    right = twins.unionByName(noise).withColumn(
        "blk", F.expr("right(name, 6)")
    )

    t0 = time.perf_counter()
    links = link_records(
        left, right, left_id="id", right_id="rid",
        block_left=["blk"], block_right=["blk"],
        compare=[("name", "name")], threshold=0.9, block_cap=100_000,
    )
    lid, rid = links.columns[0], links.columns[1]
    stats = links.select(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            F.when(F.col(rid) - 10_000_000 == F.col(lid), 1).otherwise(0)
        ).alias("n_correct"),
    ).collect()[0]
    link_s = time.perf_counter() - t0
    recall = stats["n_correct"] / N
    precision = stats["n_correct"] / stats["n"] if stats["n"] else 0.0

    # degenerate hot block: N/100 rows with the same key on both sides
    hot_l = left.unionByName(
        spark.range(N // 100).select(
            (F.col("id") + 30_000_000).alias("id"),
            F.md5(F.col("id").cast("string")).alias("name"),
            F.lit("zzzzzz").alias("blk"),
        )
    )
    hot_r = right.unionByName(
        spark.range(N // 100).select(
            (F.col("id") + 40_000_000).alias("rid"),
            F.md5((F.col("id") + 1).cast("string")).alias("name"),
            F.lit("zzzzzz").alias("blk"),
        )
    )
    t0 = time.perf_counter()
    capped = link_records(
        hot_l, hot_r, left_id="id", right_id="rid",
        block_left=["blk"], block_right=["blk"],
        compare=[("name", "name")], threshold=0.9, block_cap=100_000,
    ).count()
    cap_s = time.perf_counter() - t0

    print(
        f"linkage {N:,} left x {N + N // 4:,} right: {link_s:.1f} s "
        f"({N / link_s / 1e6:.2f} M links/s), recall {recall:.4%}, "
        f"precision {precision:.4%} ({stats['n']:,} links); hot-block run "
        f"({N // 100:,}^2-pair degenerate key capped) {cap_s:.1f} s, "
        f"{capped:,} links"
    )
    assert recall >= 0.9999 and precision >= 0.999
    # the capped run must not link more (hot block excluded) nor blow up
    assert capped == stats["n"]
    assert cap_s <= link_s * 3
    spark.stop()


if __name__ == "__main__":
    main()
