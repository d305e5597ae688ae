"""Scale stress for the round-4 pipeline operators.

1. prefilter join: 50M-row fact x 1M-key space, dim keeps 0.1% of keys,
   broadcast disabled (the regime where runtime filters matter — a dim too
   big to broadcast but selective). Measures plain SMJ vs prefiltered SMJ
   wall-clock and checks result equality via an aggregate fingerprint.
2. heavy hitters: 20M rows, Zipf-ish keys over 2M distinct; MG+verify vs
   plain groupBy/HAVING — result equality + wall-clock (in local mode the
   shuffle is memory-speed, so this measures MG overhead; the bounded
   shuffle is the cluster-side win).

Usage: python tools/stress_pipeline.py [fact_rows] [hh_rows]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from spark_skew_join_spark.operators.heavy import heavy_hitters
from spark_skew_join_spark.operators.prefilter import prefiltered_join
from spark_skew_join_spark.sources.tables import get_spark

FACT_ROWS = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000_000
HH_ROWS = int(sys.argv[2]) if len(sys.argv) > 2 else 20_000_000
KEY_SPACE = 1_000_000
DIM_KEYS = 1_000  # 0.1% selectivity


def timed(df) -> float:
    t0 = time.perf_counter()
    df.write.mode("overwrite").format("noop").save()
    return time.perf_counter() - t0


def main() -> None:
    spark = get_spark("stress-pipeline", cpus=32)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    fact = spark.range(FACT_ROWS).select(
        F.pmod(F.xxhash64("id", F.lit(7)), F.lit(KEY_SPACE)).alias("k"),
        F.col("id").alias("payload"),
    )
    dim = spark.range(DIM_KEYS).select(
        (F.col("id") * (KEY_SPACE // DIM_KEYS)).alias("k"),
        F.concat(F.lit("d"), F.col("id")).alias("name"),
    )

    plain = fact.join(dim.withColumnRenamed("k", "dk"), F.col("k") == F.col("dk")).drop(
        "dk"
    )
    pre = prefiltered_join(fact, dim, [("k", "k")], bits=1 << 20, n_seeds=2)

    t_plain = timed(plain)
    t_pre = timed(pre)

    fp = lambda df: df.agg(  # noqa: E731
        F.count(F.lit(1)).alias("n"), F.sum("payload").alias("s")
    ).collect()[0]
    a, b = fp(plain), fp(pre)
    print(
        f"PREFILTER fact={FACT_ROWS} dim_sel=0.1% plain={t_plain:.2f}s "
        f"prefiltered={t_pre:.2f}s speedup={t_plain / t_pre:.2f}x "
        f"equal={(a['n'], a['s']) == (b['n'], b['s'])} rows={a['n']}"
    )

    zipf = spark.range(HH_ROWS).select(
        F.when(F.col("id") % 10 < 3, F.pmod(F.col("id"), F.lit(5)))  # 30% in 5 hot keys
        .otherwise(F.pmod(F.xxhash64("id"), F.lit(2_000_000)))
        .alias("k")
    )
    phi, k = 0.01, 512
    t0 = time.perf_counter()
    got = {
        r["k"]: r["n_rows"] for r in heavy_hitters(zipf, ["k"], phi=phi, k=k).collect()
    }
    t_mg = time.perf_counter() - t0
    import math

    thr = math.ceil(phi * HH_ROWS)
    t0 = time.perf_counter()
    want = {
        r["k"]: r["count"]
        for r in zipf.groupBy("k").count().where(F.col("count") >= thr).collect()
    }
    t_plain_hh = time.perf_counter() - t0
    print(
        f"HEAVY rows={HH_ROWS} distinct~2M mg={t_mg:.2f}s "
        f"plain_groupby={t_plain_hh:.2f}s equal={got == want} hitters={len(got)}"
    )
    spark.stop()


if __name__ == "__main__":
    main()
