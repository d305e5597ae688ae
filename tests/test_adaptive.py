"""Adaptive join planner tests: each branch's decision, equivalence of
every executed strategy to the plain join, the broadcast plan
assertion, and the capped right-side probe."""

from __future__ import annotations

from pyspark.sql import functions as F

from spark_skew_join_spark.conf import SkewJoinConf
from spark_skew_join_spark.operators.adaptive import adaptive_join, plan_equi_join


def _sides(spark, hot: bool, n_right: int):
    left_rows = [(i % 50 if not hot else (0 if i % 2 else i % 50), i)
                 for i in range(2_000)]
    left = spark.createDataFrame(left_rows, "k int, v int")
    right = spark.createDataFrame(
        [(i, f"r{i}") for i in range(n_right)], "k int, name string"
    )
    return left, right


def test_broadcast_decision_and_equivalence(spark):
    left, right = _sides(spark, hot=False, n_right=40)
    conf = SkewJoinConf(hot_threshold=500)
    plan = plan_equi_join(left, right, "k", conf, broadcast_rows=100)
    assert plan["strategy"] == "broadcast"
    assert plan["n_right_capped"] == 40
    out = adaptive_join(left, right, "k", "inner", conf, broadcast_rows=100)
    assert out.count() == left.join(right, "k").count()
    plan_str = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan_str


def test_shuffle_decision(spark):
    left, right = _sides(spark, hot=False, n_right=500)
    conf = SkewJoinConf(hot_threshold=500)
    plan = plan_equi_join(left, right, "k", conf, broadcast_rows=100)
    assert plan["strategy"] == "shuffle"
    assert plan["n_right_capped"] == 101  # capped probe, not a full count
    out = adaptive_join(left, right, "k", "inner", conf, broadcast_rows=100)
    assert out.count() == left.join(right, "k").count()


def test_skew_decision_and_equivalence(spark):
    left, right = _sides(spark, hot=True, n_right=500)
    conf = SkewJoinConf(hot_threshold=500, replication_factor=0.01)
    plan = plan_equi_join(left, right, "k", conf, broadcast_rows=100)
    assert plan["strategy"] == "skew"
    # key 0 holds all odd i plus the even multiples of 50: 1000 + 40/2
    assert plan["n_hot_keys"] == 1 and plan["max_key_freq"] == 1_040
    out = adaptive_join(left, right, "k", "inner", conf, broadcast_rows=100)
    plain = left.join(right, "k")
    assert out.count() == plain.count()
    a = out.agg(F.sum("v"), F.count(F.lit(1))).collect()[0]
    b = plain.agg(F.sum("v"), F.count(F.lit(1))).collect()[0]
    assert tuple(a) == tuple(b)


def test_pair_keys_and_column_order(spark):
    left = spark.createDataFrame([(1, 10), (2, 20)], "lk int, v int")
    right = spark.createDataFrame([(1, "a"), (3, "c")], "rk int, s string")
    out = adaptive_join(
        left, right, [("lk", "rk")], "inner",
        SkewJoinConf(hot_threshold=100), broadcast_rows=100,
    )
    assert out.columns == ["lk", "v", "s"]  # USING semantics, left names
    assert out.collect() == [tuple([1, 10, "a"])] or out.count() == 1
