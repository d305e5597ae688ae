"""Scale stress for the KLL quantile sketch's distributed build.

100M skewed values (exp-transformed uniform — heavy right tail), built
through the two-level mapInPandas path; rank error of every probe
checked against closed-form true ranks (the generator's CDF is known,
so no exact quantile job is needed at this scale).

Usage: python tools/stress_kll.py [n_rows]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from spark_skew_join_spark.sketch.kll import kll_from_dataframe
from spark_skew_join_spark.sources.tables import get_spark

N = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000_000


def main() -> None:
    spark = get_spark("stress-kll", cpus=32)
    # v = exp(10 * u), u ~ deterministic-hash uniform [0,1): P(v <= x) =
    # ln(x)/10 — a 22,000:1 dynamic range with a dense head
    u = (F.pmod(F.xxhash64("id"), F.lit(1_000_003)) / 1_000_003.0)
    df = spark.range(N).select(F.exp(u * 10.0).alias("v"))
    t0 = time.perf_counter()
    s = kll_from_dataframe(df, "v", k=200)
    wall = time.perf_counter() - t0
    errs = {}
    for q in (0.01, 0.1, 0.5, 0.9, 0.99):
        est = s.quantile(q)
        true_rank = math.log(est) / 10.0  # the generator's CDF
        errs[q] = abs(true_rank - q)
    worst = max(errs.values())
    print(
        f"kll_build {N:,} rows: {wall:.1f} s "
        f"({N / wall / 1e6:.1f} M rows/s), n={s.n:,}, "
        f"max rank err {worst:.5f} (bound {s.rank_error_bound():.4f}) "
        f"{'PASS' if worst <= s.rank_error_bound() else 'FAIL'}"
    )
    spark.stop()


if __name__ == "__main__":
    main()
