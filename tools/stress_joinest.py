"""Join-size-estimation stress: forecast a skewed many-to-many join's
output cardinality from bounded sketches vs actually counting it.

Left: N rows with Zipf-ish keys (pow-law via pow(rand, alpha)); right:
M rows uniform over the same key range.  The estimate must never
undershoot and stay within the 6x expected-collision budget; the timing
contrast (sketch passes vs count-join) is the operator's reason to
exist at 100 TB.

Usage: python tools/stress_joinest.py [n_left] [n_right] [hash_fn] [width]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from spark_skew_join_spark.operators.joinest import (
    join_size_estimate,
    true_join_size,
)
from spark_skew_join_spark.sources.tables import get_spark

N = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000_000
M = int(sys.argv[2]) if len(sys.argv) > 2 else 10_000_000
HASH_FN = sys.argv[3] if len(sys.argv) > 3 else "xxhash64"
KEYS = 1_000_000
# width should be generous vs distinct keys: nonzero cells are bounded by
# the key count, so a wide sketch costs nothing extra
WIDTH = int(sys.argv[4]) if len(sys.argv) > 4 else 1 << 22


def main():
    spark = get_spark("stress-joinest", cpus=32)
    left = spark.range(N).select(
        (F.pow(F.rand(7), 8.0) * KEYS).cast("long").alias("k")
    )
    right = spark.range(M).select(
        (F.rand(11) * KEYS).cast("long").alias("k")
    )

    t0 = time.time()
    est = join_size_estimate(
        left, right, "k", "k", depth=5, width=WIDTH, hash_fn=HASH_FN
    ).collect()[0][0]
    t_est = time.time() - t0

    t0 = time.time()
    tru = true_join_size(left, right, "k", "k").collect()[0][0]
    t_true = time.time() - t0

    budget = 6.0 * N * M / WIDTH
    print(
        f"left={N:,} right={M:,} hash={HASH_FN} | "
        f"est={est:,} in {t_est:.1f}s | true={tru:,} in {t_true:.1f}s | "
        f"overshoot={(est - tru) / max(tru, 1):.4%} "
        f"(budget {budget / max(tru, 1):.4%}) | "
        f"never_undershoots={est >= tru} within_budget={est <= tru + budget}"
    )


if __name__ == "__main__":
    main()
