"""MERGE upsert, snapshot diff, and SCD2 history edge semantics."""

from __future__ import annotations

import pytest

from spark_skew_join_spark.operators.merge import (
    merge_upsert,
    scd2_history,
    snapshot_diff,
)


def test_merge_upsert_source_wins_and_inserts(spark):
    target = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        "k long, status string, v double",
    )
    source = spark.createDataFrame(
        [(2, "B", 99.0), (4, "d", 40.0)], "k long, status string, v double"
    )
    out = {r.k: r for r in merge_upsert(target, source, ["k"]).collect()}
    assert sorted(out) == [1, 2, 3, 4]
    assert out[2].status == "B" and out[2].v == 99.0  # updated
    assert out[4].status == "d"  # inserted
    assert out[1].v == 10.0 and out[3].v == 30.0  # untouched survivors


def test_merge_upsert_rejects_column_mismatch(spark):
    t = spark.createDataFrame([(1, "a")], "k long, s string")
    s = spark.createDataFrame([(1, 2.0)], "k long, v double")
    with pytest.raises(ValueError, match="column sets differ"):
        merge_upsert(t, s, ["k"])


def test_snapshot_diff_classes_and_null_safety(spark):
    old = spark.createDataFrame(
        [(1, 10.0), (2, None), (3, 30.0), (4, 40.0)], "k long, v double"
    )
    new = spark.createDataFrame(
        [(1, 10.0), (2, None), (3, 33.0), (5, 50.0)], "k long, v double"
    )
    out = {r.k: r.change_type for r in
           snapshot_diff(old, new, ["k"], ["v"]).collect()}
    # NULL == NULL is unchanged (null-safe compare), not updated
    assert out == {1: "unchanged", 2: "unchanged", 3: "updated",
                   4: "deleted", 5: "inserted"}


def test_scd2_collapses_consecutive_and_marks_current(spark):
    rows = [
        (1, 100, 1, "x"), (1, 200, 2, "x"), (1, 300, 3, "y"), (1, 400, 4, "x"),
        (2, 100, 5, "z"),
    ]
    df = spark.createDataFrame(rows, "k long, ts long, tie long, attr string")
    out = scd2_history(df, "k", "ts", "tie", "attr").collect()
    k1 = sorted([r for r in out if r.k == 1], key=lambda r: r.valid_from)
    # x@100 (200 collapsed) → y@300 → x@400 (current)
    assert [(r.attr, r.valid_from, r.valid_to) for r in k1] == [
        ("x", 100, 300), ("y", 300, 400), ("x", 400, None)
    ]
    assert [r.is_current for r in k1] == [False, False, True]
    k2 = [r for r in out if r.k == 2]
    assert len(k2) == 1 and k2[0].is_current and k2[0].valid_to is None


def test_temporal_join_exactly_one_regime_per_purchase(spark):
    from pyspark.sql import functions as F

    from spark_skew_join_spark.queries import temporal_join_events
    from spark_skew_join_spark.sources.tables import load_tables

    sf = "/root/testdata/sf0.001"
    out = temporal_join_events(spark, sf)
    n_purchases = (
        load_tables(spark, sf)["events"]
        .where(F.col("event_type") == "purchase")
        .count()
    )
    assert out.count() == n_purchases
    assert out.select("event_id").distinct().count() == n_purchases


def test_scd2_null_attribute_values_form_intervals(spark):
    rows = [
        (1, 100, 1, "a"), (1, 200, 2, None), (1, 300, 3, None),
        (1, 400, 4, "a"),
        (2, 100, 5, None),  # leading NULL attr must still open an interval
    ]
    df = spark.createDataFrame(rows, "k long, ts long, tie long, attr string")
    out = scd2_history(df, "k", "ts", "tie", "attr").collect()
    k1 = sorted([r for r in out if r.k == 1], key=lambda r: r.valid_from)
    # a@100 → NULL@200 (300 collapses into it) → a@400 (current)
    assert [(r.attr, r.valid_from, r.valid_to) for r in k1] == [
        ("a", 100, 200), (None, 200, 400), ("a", 400, None)
    ]
    k2 = [r for r in out if r.k == 2]
    assert len(k2) == 1 and k2[0].attr is None and k2[0].is_current
