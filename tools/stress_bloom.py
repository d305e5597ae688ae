"""Scale stress for the Bloom membership sketch.

Build over N distinct int keys through the two-level mapInPandas path
(m sized for ~1% fp at N), then:

* no false negatives on a 1M-key inserted probe sample;
* observed fp rate on 1M disjoint keys vs the analytic envelope;
* merge mergeability at scale: filter built as 8 disjoint slices and
  OR-merged must be bit-identical to the one-shot build;
* broadcast prefilter throughput: keep="non_member" over a 2N-row
  probe table (half inserted) — the exact-side guarantee at volume.

Usage: python tools/stress_bloom.py [n_keys]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from spark_skew_join_spark.sketch.bloom import (
    bloom_from_dataframe,
    bloom_prefilter,
)
from spark_skew_join_spark.sources.tables import get_spark

N = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000_000


def main() -> None:
    spark = get_spark("stress-bloom", cpus=32)
    # m for ~1% fp at N keys: m = -n ln p / (ln 2)^2, k = m/n ln 2
    m_bits = 1 << math.ceil(math.log2(-N * math.log(0.01) / math.log(2) ** 2))
    k = max(1, round(m_bits / N * math.log(2)))
    keys = spark.range(N).select(F.col("id").alias("k"))

    t0 = time.perf_counter()
    bloom = bloom_from_dataframe(keys, ["k"], m_bits=m_bits, k=k)
    build_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    slices = [
        bloom_from_dataframe(
            keys.where(F.pmod("k", F.lit(8)) == i), ["k"],
            m_bits=m_bits, k=k,
        )
        for i in range(8)
    ]
    merged = slices[0]
    for s in slices[1:]:
        merged = merged.merge(s)
    merge_s = time.perf_counter() - t0
    merge_ok = bool((merged.bits == bloom.bits).all())

    probe_in = spark.range(0, N, max(1, N // 1_000_000)).select(
        F.col("id").alias("k")
    )
    fn = bloom_prefilter(probe_in, bloom, ["k"], keep="non_member").count()

    probe_out = spark.range(N, N + 1_000_000).select(F.col("id").alias("k"))
    fp = bloom_prefilter(probe_out, bloom, ["k"], keep="member").count()
    fp_rate = fp / 1_000_000
    bound = bloom.fp_bound(N)

    t0 = time.perf_counter()
    mixed = spark.range(N // 2, N + N // 2).select(F.col("id").alias("k"))
    kept = bloom_prefilter(mixed, bloom, ["k"], keep="non_member").count()
    prefilter_s = time.perf_counter() - t0

    print(
        f"bloom {N:,} keys (m=2^{int(math.log2(m_bits))}, k={k}, "
        f"{m_bits // (8 * 1024 * 1024)} MiB): build {build_s:.1f} s "
        f"({N / build_s / 1e6:.1f} M keys/s); 8-slice merge {merge_s:.1f} s "
        f"bit-identical={merge_ok}; false negatives {fn}/1,000,000; "
        f"fp {fp_rate:.4%} vs bound {bound:.4%}; non-member prefilter of "
        f"{N:,} mixed rows kept {kept:,} in {prefilter_s:.1f} s"
    )
    assert fn == 0 and merge_ok
    assert fp_rate <= 2.0 * bound + 1e-3
    spark.stop()


if __name__ == "__main__":
    main()
