"""Join-size estimation tests: the CMS inner-product contract (never
undershoots, overshoot within the collision budget), exactness when the
sketch is collision-free, parity between the in-memory sketch and the
relational estimator, and the md5/xxhash64 hash modes."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from spark_skew_join_spark.operators.joinest import (
    bucket_counts,
    join_size_estimate,
    join_size_report,
    true_join_size,
)
from spark_skew_join_spark.sketch.cms import CountMinSketch


def _exact_join_size(left: list, right: list) -> int:
    fa: dict = {}
    fb: dict = {}
    for k in left:
        fa[k] = fa.get(k, 0) + 1
    for k in right:
        fb[k] = fb.get(k, 0) + 1
    return sum(n * fb.get(k, 0) for k, n in fa.items())


def test_sketch_inner_product_contract():
    rng = random.Random(3)
    a = [str(rng.randint(1, 300)) for _ in range(10_000)]
    b = [str(rng.randint(1, 300)) for _ in range(8_000)]
    ca = CountMinSketch(eps=0.0005, delta=1e-6, seed=1).add_all(a)
    cb = CountMinSketch(eps=0.0005, delta=1e-6, seed=1).add_all(b)
    true = _exact_join_size(a, b)
    est = ca.inner_product(cb)
    assert est >= true
    assert est <= true + ca.eps * len(a) * len(b)


def test_sketch_inner_product_rejects_mismatched_params():
    import pytest

    a = CountMinSketch(eps=0.01, delta=1e-4, seed=1)
    b = CountMinSketch(eps=0.001, delta=1e-4, seed=1)
    with pytest.raises(ValueError):
        a.inner_product(b)


def test_relational_estimate_contract_and_true_size(spark):
    rng = random.Random(11)
    left = spark.createDataFrame(
        [(rng.randint(1, 200),) for _ in range(5_000)], "k int"
    )
    right = spark.createDataFrame(
        [(rng.randint(100, 400),) for _ in range(4_000)], "k int"
    )
    plain = left.join(right.withColumnsRenamed({"k": "j"}), F.col("k") == F.col("j"))
    exact = plain.count()
    tru = true_join_size(left, right, "k", "k").collect()[0][0]
    assert tru == exact  # count-product identity, join never materialized
    for hash_fn in ("md5", "xxhash64"):
        est = join_size_estimate(
            left, right, "k", "k", depth=5, width=65536, hash_fn=hash_fn
        ).collect()[0][0]
        assert est >= exact
        # 300 distinct keys into 65536 buckets: collisions possible but the
        # 6x-expected budget must hold with huge margin
        assert est <= exact + 6.0 * 5_000 * 4_000 / 65536 + 1


def test_collision_free_width_is_exact(spark):
    # fewer (depth, key) pairs than width makes a collision unlikely per
    # depth; min over 5 depths is exact unless all 5 collide somewhere.
    left = spark.createDataFrame([(i % 37,) for i in range(1_000)], "k int")
    exact = _exact_join_size(
        [i % 37 for i in range(1_000)], [i % 37 for i in range(1_000)]
    )
    est = join_size_estimate(
        left, left, "k", "k", depth=5, width=1 << 20
    ).collect()[0][0]
    assert est == exact


def test_report_row_and_null_keys(spark):
    left = spark.createDataFrame(
        [(1,), (1,), (2,), (None,), (None,)], "k int"
    )
    right = spark.createDataFrame([(1,), (2,), (2,), (None,)], "k int")
    row = join_size_report(left, right, "k", "k").collect()[0]
    # nulls never equi-match: true = 2*1 + 1*2 = 4
    assert row["true_join_rows"] == 4
    assert row["est_join_rows"] >= 4
    assert row["within_bound"] is True


def test_bucket_counts_bounded_and_disjoint_join_is_zero(spark):
    left = spark.createDataFrame([(i,) for i in range(2_000)], "k int")
    right = spark.createDataFrame([(i + 10_000,) for i in range(2_000)], "k int")
    bc = bucket_counts(left, "k", depth=3, width=256)
    assert bc.count() <= 3 * 256
    assert bc.agg(F.sum("n")).collect()[0][0] == 3 * 2_000
    tru = true_join_size(left, right, "k", "k").collect()[0][0]
    assert tru == 0  # coalesce guard: empty count-join folds to 0, not null


def test_estimate_disjoint_keys_is_zero_not_null(spark):
    """ADVICE r6 #1: a depth whose cell tables share no bucket has dot
    product 0 but vanished from the inner cell join — fully disjoint
    key sets used to yield est_join_rows=NULL. The fixed aggregate
    folds any missing depth to 0."""
    left = spark.createDataFrame([(i,) for i in range(5)], "k int")
    right = spark.createDataFrame([(i + 10_000,) for i in range(5)], "k int")
    (row,) = join_size_estimate(left, right, "k", "k").collect()
    assert row["est_join_rows"] == 0
    rep = join_size_report(left, right, "k", "k").collect()[0]
    assert rep["est_join_rows"] == 0 and rep["true_join_rows"] == 0
    assert rep["within_bound"] is True
    # larger disjoint sets may still collide into shared CMS buckets —
    # the estimate must then be a NUMBER within the collision budget,
    # never NULL (the pre-fix failure mode)
    big_l = spark.createDataFrame([(i,) for i in range(500)], "k int")
    big_r = spark.createDataFrame([(i + 10_000,) for i in range(500)], "k int")
    (row2,) = join_size_estimate(big_l, big_r, "k", "k").collect()
    assert row2["est_join_rows"] is not None
    assert 0 <= row2["est_join_rows"] <= 500 * 500 * (5.0 / 65536)
