"""Data-quality audit semantics on planted violations."""

from __future__ import annotations

from spark_skew_join_spark.operators.dq import dq_metrics, orphan_count


def test_dq_metrics_counts_nulls_and_dup_keys(spark):
    rows = [
        (1, "a"), (2, None), (2, "c"),  # key 2 duplicated, one null v
        (3, None), (None, "e"),         # null key
    ]
    df = spark.createDataFrame(rows, "k long, v string")
    m = dq_metrics(df, ["k"], ["v", "k"]).collect()[0]
    assert m.n_rows == 5
    # struct-distinct counts the NULL key as its own tuple: only the
    # genuine duplicate (key 2 twice) is flagged — a single NULL-key row
    # is a null violation (n_null_k), not a duplicate
    assert m.n_dup_key == 1
    assert m.n_null_v == 2
    assert m.n_null_k == 1


def test_orphan_count_ignores_null_fks(spark):
    child = spark.createDataFrame(
        [(1, 10), (2, 99), (3, None), (4, 20)], "id long, fk long"
    )
    parent = spark.createDataFrame([(10,), (20,)], "pk long")
    o = orphan_count(child, parent, "fk", "pk").collect()[0]
    assert o.n_orphans == 1  # only fk=99; NULL fk is not an orphan


def test_dq_audit_clean_fixture_is_all_zero(spark):
    from spark_skew_join_spark.queries import dq_audit_orders

    r = dq_audit_orders(spark, "/root/testdata/sf0.001").collect()[0]
    assert r.n_rows > 0
    assert (r.n_dup_key, r.n_null_o_custkey, r.n_null_o_orderdate,
            r.n_orphan_lineitems) == (0, 0, 0, 0)
