"""Scale stress for the KMV theta sketch.

Build a k=4096 sketch over N distinct int keys through the two-level
mapInPandas path, then:

* distinct estimate within 4·RSE of N (RSE = 1/sqrt(k−2) ≈ 1.56%);
* merge mergeability at scale: 8 disjoint slices merged must be
  bit-identical (value array) to the one-shot build;
* set operations against a second N-key set with 50% planted overlap:
  intersection / difference / Jaccard estimates vs ground truth
  (known by construction — no exact distinct job needed at this N);
* grouped build: theta_by_group over 4 groups in ONE pass, each
  group's estimate within envelope.

Usage: python tools/stress_theta.py [n_keys]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from pyspark.sql import functions as F

from spark_skew_join_spark.sketch.theta import (
    difference_estimate,
    intersection_estimate,
    jaccard_estimate,
    theta_by_group,
    theta_from_dataframe,
)
from spark_skew_join_spark.sources.tables import get_spark

N = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000_000
K = 4096


def main() -> None:
    spark = get_spark("stress-theta", cpus=32)
    keys = spark.range(N).select(F.col("id").alias("k"))

    t0 = time.perf_counter()
    sk = theta_from_dataframe(keys, ["k"], k=K)
    build_s = time.perf_counter() - t0
    est = sk.estimate()
    err = abs(est - N) / N
    rse = sk.rse()

    t0 = time.perf_counter()
    slices = [
        theta_from_dataframe(
            keys.where(F.pmod("k", F.lit(8)) == i), ["k"], k=K
        )
        for i in range(8)
    ]
    merged = slices[0]
    for s in slices[1:]:
        merged = merged.merge(s)
    merge_s = time.perf_counter() - t0
    merge_ok = bool(np.array_equal(merged.values, sk.values))

    # second set: [N/2, 3N/2) → true intersection N/2, union 3N/2
    other = spark.range(N // 2, N + N // 2).select(F.col("id").alias("k"))
    t0 = time.perf_counter()
    sk2 = theta_from_dataframe(other, ["k"], k=K)
    set_s = time.perf_counter() - t0
    ti, tu, td = N // 2, N + N // 2, N - N // 2
    ei = intersection_estimate(sk, sk2)
    ed = difference_estimate(sk, sk2)
    ej = jaccard_estimate(sk, sk2)
    i_err, d_err, j_err = (
        abs(ei - ti) / ti, abs(ed - td) / td, abs(ej - ti / tu) / (ti / tu),
    )

    t0 = time.perf_counter()
    grouped_src = keys.withColumn("g", F.pmod("k", F.lit(4)))
    grouped = theta_by_group(grouped_src, "g", ["k"], k=K)
    group_s = time.perf_counter() - t0
    per_group = N // 4
    g_errs = {
        g: abs(s.estimate() - per_group) / per_group
        for g, s in grouped.items()
    }

    print(
        f"theta {N:,} keys (k={K}, rse {rse:.2%}): build {build_s:.1f} s "
        f"({N / build_s / 1e6:.1f} M keys/s), est err {err:.3%}; "
        f"8-slice merge {merge_s:.1f} s value-identical={merge_ok}; "
        f"set ops vs 50%-overlap set (build2 {set_s:.1f} s): "
        f"inter err {i_err:.3%}, diff err {d_err:.3%}, jaccard err "
        f"{j_err:.3%}; grouped 4-way build {group_s:.1f} s, per-group "
        f"errs {{{', '.join(f'{g}: {e:.3%}' for g, e in sorted(g_errs.items()))}}}"
    )
    assert err <= 4 * rse and merge_ok
    assert i_err <= 6 * rse and d_err <= 6 * rse and j_err <= 6 * rse
    assert all(e <= 4 * rse for e in g_errs.values())
    spark.stop()


if __name__ == "__main__":
    main()
