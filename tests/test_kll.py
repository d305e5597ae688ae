"""KLL quantile sketch: error bounds, merge behavior, weight
conservation, and the distributed build."""

import functools
import pickle

import numpy as np
import pytest

from spark_skew_join_spark.sketch.kll import KLL, kll_from_dataframe

PROBES = (0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99)


def _max_rank_err(sketch, data):
    srt = np.sort(data)
    errs = []
    for q in PROBES:
        est = sketch.quantile(q)
        errs.append(abs(np.searchsorted(srt, est, side="right") / len(srt) - q))
    return max(errs)


@pytest.mark.parametrize("dist", ["uniform", "pareto", "normal", "discrete"])
def test_rank_error_within_bound(dist):
    rng = np.random.default_rng(17)
    data = {
        "uniform": rng.uniform(0, 1e6, 200_000),
        "pareto": rng.pareto(1.5, 200_000),
        "normal": rng.normal(0, 3, 200_000),
        "discrete": rng.integers(0, 50, 200_000).astype(float),
    }[dist]
    s = KLL(k=200, seed=5)
    for chunk in np.array_split(data, 23):
        s.add(chunk)
    assert s.n == len(data)
    assert _max_rank_err(s, data) <= s.rank_error_bound()


def test_merge_any_order_stays_within_bound():
    """Associativity in the sketch sense: every merge order's estimates
    respect the same rank-error envelope (bitwise equality is not a KLL
    property — compaction is randomized)."""
    rng = np.random.default_rng(29)
    data = rng.uniform(0, 1, 150_000)
    parts = np.array_split(data, 12)
    sketches = []
    for p in parts:
        s = KLL(k=200, seed=11)
        s.add(p)
        sketches.append(s)
    left = functools.reduce(lambda a, b: a.merge(b), sketches)
    right = functools.reduce(lambda a, b: b.merge(a), reversed(sketches))
    # pairwise tree merge
    level = sketches
    while len(level) > 1:
        level = [
            level[i].merge(level[i + 1]) if i + 1 < len(level) else level[i]
            for i in range(0, len(level), 2)
        ]
    tree = level[0]
    for m in (left, right, tree):
        assert m.n == len(data)
        assert _max_rank_err(m, data) <= m.rank_error_bound()


def test_total_weight_conserved_exactly():
    rng = np.random.default_rng(3)
    s = KLL(k=64, seed=2)
    for chunk in np.array_split(rng.normal(size=100_000), 17):
        s.add(chunk)
    weight = sum((1 << h) * len(c) for h, c in enumerate(s.compactors))
    assert weight == s.n == 100_000
    assert s._size() <= s._max_size()


def test_small_stream_is_exact():
    s = KLL(k=200, seed=1)
    s.add(np.arange(100, dtype=float))
    # below capacity nothing compacts: quantiles are exact order stats
    assert s.quantile(0.0) == 0.0
    assert s.quantile(0.5) == 49.0
    assert s.quantile(1.0) == 99.0
    assert s.rank(49.0) == 0.5


def test_nan_skipped_and_guards():
    s = KLL(k=200)
    s.add(np.array([1.0, np.nan, 3.0]))
    assert s.n == 2
    with pytest.raises(ValueError):
        s.quantile(1.5)
    with pytest.raises(ValueError):
        KLL(k=4)
    with pytest.raises(ValueError):
        s.merge(KLL(k=100))
    with pytest.raises(ValueError):
        KLL(k=200).quantile(0.5)  # empty


def test_pickle_roundtrip():
    s = KLL(k=128, seed=9)
    s.add(np.random.default_rng(1).uniform(size=50_000))
    r = pickle.loads(pickle.dumps(s))
    assert r.n == s.n and r.k == s.k
    assert all(np.array_equal(a, b) for a, b in zip(r.compactors, s.compactors))


def test_distributed_build_matches_exact_quantiles(spark):
    df = spark.range(0, 100_000).selectExpr("CAST(id AS DOUBLE) AS v")
    s = kll_from_dataframe(df, "v", k=200)
    assert s.n == 100_000
    for q in (0.1, 0.5, 0.9):
        assert abs(s.quantile(q) / 100_000 - q) <= s.rank_error_bound()


def test_kll_by_group_estimates_within_bound(spark):
    """Grouped two-level fold (ADVICE r5 #4): per-group estimates honor
    the sketch's rank-error envelope even when groups straddle
    partitions (each partition folds only its slice of each group)."""
    from spark_skew_join_spark.sketch.kll import kll_by_group

    df = spark.range(0, 90_000).selectExpr(
        "CAST(id % 3 AS STRING) AS grp", "CAST(id AS DOUBLE) AS v"
    ).repartition(11)
    grouped = kll_by_group(df, "grp", "v", k=200)
    assert sorted(grouped) == ["0", "1", "2"]
    for g, s in grouped.items():
        assert s.n == 30_000
        # group g holds values {g, g+3, g+6, ...}: quantile q ≈ 90000*q
        for q in (0.1, 0.5, 0.9):
            assert abs(s.quantile(q) / 90_000 - q) <= s.rank_error_bound()
