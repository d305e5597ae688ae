"""Cohort retention bucketing and RANGE-framed rolling average."""

from __future__ import annotations

from spark_skew_join_spark.queries import (
    cohort_retention_events,
    rolling_avg_events,
)


def _events_df(spark, rows):
    df = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, value double"
    )
    return df.withColumn("ts", df.ts.cast("timestamp"))


def test_cohort_retention_staggered(spark, tmp_path, monkeypatch):
    rows = [
        # user 1 first active week 0 (1970-01-01..07), returns week 2
        (1, "1970-01-02 00:00:00", 1, 1.0),
        (2, "1970-01-16 00:00:00", 1, 1.0),
        # user 2 first active week 1, never returns
        (3, "1970-01-09 00:00:00", 2, 1.0),
        # user 3 also cohort week 0, active weeks 0 and 1
        (4, "1970-01-03 00:00:00", 3, 1.0),
        (5, "1970-01-08 00:00:00", 3, 1.0),
    ]
    import spark_skew_join_spark.queries as q

    df = _events_df(spark, rows)
    monkeypatch.setattr(q, "load_tables", lambda s, d: {"events": df})
    out = {
        (r.cohort_week, r.weeks_since): r.n_users
        for r in cohort_retention_events(spark, "ignored").collect()
    }
    assert out == {(0, 0): 2, (0, 1): 1, (0, 2): 1, (1, 0): 1}


def test_rolling_avg_range_frame_skips_gap_days(spark, monkeypatch):
    # one user, days 0, 1, 10: day 10's trailing-7d window must contain
    # ONLY day 10 (RANGE semantics) — a ROWS frame would wrongly include
    # days 0 and 1
    rows = [
        (1, "1970-01-01 01:00:00", 1, 2.0),
        (2, "1970-01-02 01:00:00", 1, 4.0),
        (3, "1970-01-11 01:00:00", 1, 9.0),
    ]
    import spark_skew_join_spark.queries as q

    df = _events_df(spark, rows)
    monkeypatch.setattr(q, "load_tables", lambda s, d: {"events": df})
    out = {r.day: r for r in rolling_avg_events(spark, "ignored").collect()}
    assert out[0].avg_7d == 2.0
    assert out[1].avg_7d == 3.0  # (2+4)/2
    assert out[10].avg_7d == 9.0  # gap: frame holds only day 10


def test_outlier_stats_flags_planted_tail(spark, monkeypatch):
    import spark_skew_join_spark.queries as q
    from spark_skew_join_spark.queries import outlier_stats_lineitem

    # 200 tight values + one extreme: only the extreme is past 3 sigma
    rows = [("A", 100.0 + (i % 10)) for i in range(200)] + [("A", 10000.0)]
    df = spark.createDataFrame(rows, "l_returnflag string, l_extendedprice double")
    monkeypatch.setattr(q, "load_tables", lambda s, d: {"lineitem": df})
    r = outlier_stats_lineitem(spark, "ignored").collect()[0]
    assert r.n == 201 and r.n_outliers == 1
