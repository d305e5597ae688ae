"""Profiling + schema-drift tests: stat correctness vs hand-computed
values, the one-scan plan property, drift detection per change type,
and the no-drift identity."""

from __future__ import annotations

from pyspark.sql import functions as F

from spark_skew_join_spark.operators.profile import profile_table, schema_drift


def _df(spark):
    return spark.createDataFrame(
        [(1, 10.0, "a"), (2, None, "b"), (3, 30.0, "b"), (4, 20.0, None)],
        "id int, v double, s string",
    )


def test_profile_values(spark):
    prof = {r["column"]: r for r in profile_table(_df(spark)).collect()}
    assert prof["id"]["n"] == 4 and prof["id"]["n_null"] == 0
    assert prof["id"]["n_distinct"] == 4
    assert prof["id"]["min_num"] == 1.0 and prof["id"]["max_num"] == 4.0
    assert prof["id"]["mean"] == 2.5
    assert prof["id"]["min_str"] is None
    assert prof["v"]["n_null"] == 1 and prof["v"]["n_distinct"] == 3
    assert prof["v"]["mean"] == 20.0  # mean over non-null values
    assert prof["s"]["min_str"] == "a" and prof["s"]["max_str"] == "b"
    assert prof["s"]["n_distinct"] == 2 and prof["s"]["min_num"] is None
    assert prof["s"]["dtype"] == "string" and prof["id"]["dtype"] == "int"


def test_profile_single_scan_plan(spark):
    df = _df(spark)
    plan = (
        profile_table(df)._jdf.queryExecution().executedPlan().toString()
    )
    # all columns' aggregates plan into one job over one scan (the
    # multi-distinct expands, it does not rescan)
    assert plan.count("ExistingRDD") + plan.count("LocalTableScan") <= 2
    assert "BatchEvalPython" not in plan


def test_profile_column_subset(spark):
    rows = profile_table(_df(spark), ["id"]).collect()
    assert [r["column"] for r in rows] == ["id"]


def test_schema_drift_detects_each_change(spark):
    old = _df(spark)
    new = old.select(
        F.col("id").cast("long").alias("id"),            # dtype change
        F.when(F.col("id") <= 2, None).otherwise(F.col("v")).alias("v"),
        F.lit("z").alias("s2"),                          # added (s removed)
    )
    drift = {
        (r["column"], r["change"]): r["detail"]
        for r in schema_drift(old, new).collect()
    }
    assert drift[("id", "dtype_changed")] == "int -> bigint"
    assert ("s", "column_removed") in drift
    assert ("s2", "column_added") in drift
    assert ("v", "null_rate_drift") in drift  # 0.25 -> 0.5


def test_schema_drift_empty_for_identical(spark):
    df = _df(spark)
    assert schema_drift(df, df).count() == 0


def test_schema_drift_distinct_collapse(spark):
    old = spark.createDataFrame(
        [("a",), ("b",), ("c",), ("d",)], "s string"
    )
    new = old.withColumn("s", F.lit("k"))
    rows = schema_drift(old, new).collect()
    assert [(r["column"], r["change"]) for r in rows] == [
        ("s", "distinct_drift")
    ]
    assert rows[0]["detail"] == "4 -> 1"


def test_ks_drift_identical_and_shifted(spark):
    from spark_skew_join_spark.operators.profile import ks_drift

    import random

    rng = random.Random(41)
    rows_a = [("k", round(rng.gauss(50, 10), 2)) for _ in range(800)]
    rows_b = [("k", round(rng.gauss(50, 10), 2)) for _ in range(800)]
    a = spark.createDataFrame(rows_a, "g string, v double")
    b = spark.createDataFrame(rows_b, "g string, v double")
    same = ks_drift(a, b, "g", "v").collect()[0]
    assert same["n_a"] == same["n_b"] == 800
    assert bool(same["drift"]) is False  # same distribution
    shifted = ks_drift(
        a, b.withColumn("v", F.col("v") + 15.0), "g", "v"
    ).collect()[0]
    assert bool(shifted["drift"]) is True
    assert shifted["ks_d"] > same["ks_d"]


def test_ks_drift_matches_scipy_style_reference(spark):
    from spark_skew_join_spark.operators.profile import ks_drift

    va = [1.0, 2.0, 2.0, 3.0, 9.0]
    vb = [2.0, 3.0, 4.0, 4.0]
    a = spark.createDataFrame([("g", v) for v in va], "g string, v double")
    b = spark.createDataFrame([("g", v) for v in vb], "g string, v double")
    row = ks_drift(a, b, "g", "v").collect()[0]

    def ecdf(vals, x):
        return sum(1 for v in vals if v <= x) / len(vals)

    expected = max(
        abs(ecdf(va, x) - ecdf(vb, x)) for x in sorted(set(va + vb))
    )
    assert abs(row["ks_d"] - expected) < 1e-9
    assert row["ks_d"] == 0.35  # hand-checkable: |3/5 - 1/4| at x=2


def test_ks_drift_identical_input_is_zero(spark):
    from spark_skew_join_spark.operators.profile import ks_drift

    df = spark.createDataFrame(
        [("g", float(i % 7)) for i in range(100)], "g string, v double"
    )
    row = ks_drift(df, df, "g", "v").collect()[0]
    assert row["ks_d"] == 0.0 and bool(row["drift"]) is False
