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
