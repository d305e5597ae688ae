"""Property-based equivalence tests (SURVEY §5.3): hypothesis-generated key
distributions asserting skew_join ≡ plain join across shapes the fixed
fixtures don't cover. max_examples kept tiny — every example runs Spark jobs.
"""

from __future__ import annotations

import random

from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from spark_skew_join_spark import SkewJoinConf, skew_join
import pytest

_SETTINGS = dict(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
    derandomize=True,
)


@given(
    dist=st.sampled_from(["uniform", "zipf1", "zipf2", "one_hot", "all_same"]),
    how=st.sampled_from(["inner", "left", "full"]),
    seed=st.integers(0, 3),
)
@settings(**_SETTINGS)
@pytest.mark.slow
def test_random_distributions_equivalence(spark, dist, how, seed):
    rng = random.Random(seed)
    n, n_keys = 3000, 40

    def draw():
        if dist == "uniform":
            return rng.randint(1, n_keys)
        if dist == "zipf1":
            return min(int(1 / max(rng.random(), 1e-9)), n_keys)
        if dist == "zipf2":
            return min(int(1 / max(rng.random(), 1e-9) ** 0.5), n_keys)
        if dist == "one_hot":
            return 1 if rng.random() < 0.5 else rng.randint(2, n_keys)
        return 7  # all_same

    left = spark.createDataFrame(
        [(draw(), i) for i in range(n)], "k bigint, v bigint"
    )
    right = spark.createDataFrame(
        [(k, f"r{k}") for k in range(1, n_keys + 1, 2)], "k bigint, t string"
    )
    conf = SkewJoinConf(replication_factor=0.05, hot_threshold=25)
    got = skew_join(left, right, "k", how, conf)
    exp = left.join(right, on=["k"], how=how).select(*got.columns)
    g = sorted(map(tuple, got.collect()))
    e = sorted(map(tuple, exp.collect()))
    assert g == e
