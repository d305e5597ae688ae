"""ACF and MAD-outlier operators vs numpy/Python references."""

from __future__ import annotations

import math
import random
import statistics

import pytest

from spark_skew_join_spark.operators.profile import mad_outliers
from spark_skew_join_spark.operators.timeseries import acf


def _pearson(xs, ys):
    n = len(xs)
    mx, my = sum(xs) / n, sum(ys) / n
    cov = sum((a - mx) * (b - my) for a, b in zip(xs, ys))
    vx = sum((a - mx) ** 2 for a in xs)
    vy = sum((b - my) ** 2 for b in ys)
    return cov / math.sqrt(vx * vy)


def test_acf_matches_reference(spark):
    rng = random.Random(11)
    rows = []
    series = {}
    for key in ("a", "b"):
        xs = [rng.gauss(0, 1) for _ in range(60)]
        # AR(1)-ify key "a" so lag-1 ACF is clearly positive
        if key == "a":
            for i in range(1, 60):
                xs[i] = 0.8 * xs[i - 1] + 0.2 * xs[i]
        series[key] = xs
        rows += [(key, i, xs[i]) for i in range(60)]
    df = spark.createDataFrame(rows, ["k", "t", "v"])
    got = {
        (r.k, r.lag): (r.n_pairs, r.acf)
        for r in acf(df, "k", ["t"], "v", max_lag=2).collect()
    }
    for key, xs in series.items():
        for lag in (1, 2):
            want = _pearson(xs[lag:], xs[:-lag])
            n, a = got[(key, lag)]
            assert n == 60 - lag
            assert a == pytest.approx(round(want, 6), abs=2e-6)
    assert got[("a", 1)][1] > 0.5  # AR(1) signal visible


def test_acf_short_series_drop_out(spark):
    df = spark.createDataFrame(
        [("k", 0, 1.0), ("k", 1, 2.0)], ["k", "t", "v"]
    )
    res = {(r.k, r.lag) for r in acf(df, "k", ["t"], "v", max_lag=3).collect()}
    assert res == {("k", 1)}  # lags 2,3 have no pairs
    with pytest.raises(ValueError):
        acf(df, "k", ["t"], "v", max_lag=0)


def test_mad_outliers_matches_reference(spark):
    rng = random.Random(5)
    base = [rng.uniform(10, 20) for _ in range(101)]
    spikes = [1000.0, -500.0]
    vals = base + spikes
    df = spark.createDataFrame([("g", v) for v in vals], ["k", "v"])
    (row,) = mad_outliers(df, "k", "v", 3.0).collect()
    med = statistics.median(vals)
    mad = statistics.median([abs(v - med) for v in vals])
    n_out = sum(1 for v in vals if abs(v - med) > 3.0 * mad)
    assert row.n == len(vals)
    assert row.median == pytest.approx(round(med, 6))
    assert row.mad == pytest.approx(round(mad, 6))
    assert row.n_outliers == n_out
    assert n_out >= 2  # spikes caught
    assert row.outlier_frac == pytest.approx(n_out / len(vals))


def test_mad_robust_to_heavy_contamination(spark):
    # 10% contamination: mean/σ rule would widen, MAD cutoff must not
    vals = [float(i % 7) for i in range(90)] + [1e6] * 10
    df = spark.createDataFrame([("g", v) for v in vals], ["k", "v"])
    (row,) = mad_outliers(df, "k", "v", 3.0).collect()
    assert row.n_outliers == 10


def test_theil_sen_recovers_slope_under_contamination(spark):
    from spark_skew_join_spark.operators.timeseries import theil_sen

    # y = 2x + 1 with 20% wild outliers: the median pairwise slope is
    # still an all-clean pair's slope, i.e. exactly 2.0
    rows = []
    for i in range(30):
        y = 2.0 * i + 1.0
        if i % 5 == 0:
            y += 500.0  # 6 corrupted points
        rows.append(("k", float(i), y))
    df = spark.createDataFrame(rows, ["k", "x", "y"])
    (r,) = theil_sen(df, "k", "x", "y", max_points=100).collect()
    assert r.n_points == 30
    assert r.n_pairs == 30 * 29 // 2
    assert r.slope == pytest.approx(2.0, abs=1e-9)
    assert r.intercept == pytest.approx(1.0, abs=1e-6)


def test_theil_sen_skips_vertical_pairs_and_caps_points(spark):
    from spark_skew_join_spark.operators.timeseries import theil_sen

    df = spark.createDataFrame(
        [("k", 1.0, 1.0), ("k", 1.0, 9.0), ("k", 2.0, 3.0), ("k", 3.0, 5.0)],
        ["k", "x", "y"],
    )
    (r,) = theil_sen(df, "k", "x", "y", max_points=4).collect()
    assert r.n_pairs == 5  # C(4,2)=6 minus the vertical (1.0, 1.0)x(1.0, 9.0)
    (r2,) = theil_sen(df, "k", "x", "y", max_points=3).collect()
    assert r2.n_points == 3
    with pytest.raises(ValueError):
        theil_sen(df, "k", "x", "y", max_points=1)


def test_theil_sen_all_equal_x_key_surfaces_null_slope(spark):
    """ADVICE r6 #5: a key whose bounded window has all-equal x (every
    pairwise slope vertical) must not vanish — it surfaces with
    n_pairs=0 and NULL slope/intercept via the left join."""
    from spark_skew_join_spark.operators.timeseries import theil_sen

    rows = [("flat", 5.0, float(y)) for y in range(6)] + [
        ("ok", float(x), 2.0 * x + 1.0) for x in range(6)
    ]
    df = spark.createDataFrame(rows, "k string, x double, y double")
    out = {r["k"]: r for r in theil_sen(df, "k", "x", "y").collect()}
    assert set(out) == {"flat", "ok"}
    f = out["flat"]
    assert f["n_points"] == 6 and f["n_pairs"] == 0
    assert f["slope"] is None and f["intercept"] is None
    assert abs(out["ok"]["slope"] - 2.0) < 1e-9
