"""Bounds-check the approximate aggregates against DuckDB's exact answers.

The driver gate keeps `approx_stats` rows-only (sketch internals differ
across engines), but correctness is testable: approx_count_distinct must
land within its configured relative standard deviation of the exact
distinct count, and percentile_approx within a rank neighborhood of the
exact median (VERDICT r1 #6).
"""

from __future__ import annotations

import duckdb

from spark_skew_join_spark.queries import approx_stats

SF = "/root/testdata/sf0.001"


def test_approx_stats_within_error_bounds(spark):
    got = {r["l_returnflag"]: r for r in approx_stats(spark, SF).collect()}
    con = duckdb.connect()
    exact = con.execute(
        f"""
        SELECT l_returnflag,
               COUNT(DISTINCT l_orderkey) AS n_exact,
               QUANTILE_CONT(l_extendedprice, 0.45) AS p45,
               QUANTILE_CONT(l_extendedprice, 0.55) AS p55
        FROM '{SF}/lineitem.parquet'
        GROUP BY l_returnflag
        """
    ).fetchall()
    assert len(exact) == len(got) > 0
    for flag, n_exact, p45, p55 in exact:
        r = got[flag]
        # HLL++ default rsd = 5%; allow 3 sigma (plus 1 for tiny groups)
        assert abs(r["approx_orders"] - n_exact) <= max(3 * 0.05 * n_exact, 1), (
            flag, r["approx_orders"], n_exact
        )
        # percentile_approx (accuracy=10000) returns a data value whose rank
        # is within n/accuracy of the true median — p45..p55 is generous
        assert p45 <= r["approx_med"] <= p55, (flag, r["approx_med"], p45, p55)
        # exact count column is exact by construction
        assert r["n_rows"] > 0
