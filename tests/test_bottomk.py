"""Bottom-k sketch: determinism, mergeability, quantile accuracy."""

from __future__ import annotations

from pyspark.sql import functions as F

from spark_skew_join_spark.operators.bottomk import (
    bottom_k_sample,
    bottomk_quantiles,
)


def _df(spark, n, shift=0):
    return spark.createDataFrame(
        [(i + shift, float(i + shift)) for i in range(n)], "id long, v double"
    )


def test_sample_deterministic_across_partitionings(spark):
    df = _df(spark, 5000)
    a = sorted(r.id for r in bottom_k_sample(df, "id", 100).collect())
    b = sorted(
        r.id
        for r in bottom_k_sample(df.repartition(13), "id", 100).collect()
    )
    assert a == b


def test_bottom_k_is_mergeable(spark):
    # bottom-k of the union == bottom-k of (bottom-k(A) ∪ bottom-k(B))
    a, b = _df(spark, 3000), _df(spark, 3000, shift=3000)
    whole = sorted(
        r.id for r in bottom_k_sample(a.unionByName(b), "id", 50).collect()
    )
    pieces = bottom_k_sample(a, "id", 50).unionByName(
        bottom_k_sample(b, "id", 50)
    )
    merged = sorted(r.id for r in bottom_k_sample(pieces, "id", 50).collect())
    assert whole == merged


def test_quantile_estimates_close_to_exact(spark):
    df = _df(spark, 20000)  # v uniform on [0, 20000)
    r = bottomk_quantiles(df, "id", "v", 1000, [0.5, 0.9]).collect()[0]
    assert r.sample_n == 1000
    # rank-space stderr ~ sqrt(q(1-q)/k): ±5% is > 3 sigma at k=1000
    assert abs(r.q_50 - 10000) / 20000 < 0.05
    assert abs(r.q_90 - 18000) / 20000 < 0.05
