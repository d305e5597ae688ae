"""Incremental view maintenance: merge(base, delta) ≡ full recompute."""

from __future__ import annotations

from pyspark.sql import functions as F

from spark_skew_join_spark.operators.ivm import agg_state, merge_agg_states


def test_merge_equals_full_recompute(spark):
    rows = [(i % 7, float(i) + 0.25) for i in range(500)]
    df = spark.createDataFrame(rows, "g int, v double")
    base = agg_state(df.where("v < 300"), ["g"], "v")
    delta = agg_state(df.where("v >= 300"), ["g"], "v")
    merged = merge_agg_states(base, delta, ["g"])
    full = agg_state(df, ["g"], "v")
    assert sorted(merged.collect()) == sorted(full.collect())


def test_merge_handles_groups_missing_from_one_side(spark):
    base = agg_state(
        spark.createDataFrame([(1, 10.0), (1, 5.0)], "g int, v double"),
        ["g"], "v",
    )
    delta = agg_state(
        spark.createDataFrame([(2, 7.0)], "g int, v double"), ["g"], "v"
    )
    out = {r.g: (r.n, float(r.s)) for r in
           merge_agg_states(base, delta, ["g"]).collect()}
    assert out == {1: (2, 15.0), 2: (1, 7.0)}


def test_merge_is_associative_over_three_deltas(spark):
    df = spark.createDataFrame(
        [(i % 3, float(i)) for i in range(90)], "g int, v double"
    )
    parts = [df.where(F.col("v") % 3 == k) for k in range(3)]
    states = [agg_state(p, ["g"], "v") for p in parts]
    left = merge_agg_states(merge_agg_states(states[0], states[1], ["g"]),
                            states[2], ["g"])
    right = merge_agg_states(states[0],
                             merge_agg_states(states[1], states[2], ["g"]),
                             ["g"])
    assert sorted(left.collect()) == sorted(right.collect())
