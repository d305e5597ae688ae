"""KMV/theta sketch: estimate envelopes, EXACT unsaturated mode, set
operations, mergeability ≡ one-shot (the KMV k-smallest-of-union
identity), order-insensitivity, and the md5-compat determinism that
backs the theta_sketch_events EXACT oracle."""

from __future__ import annotations

import numpy as np
import pytest

from spark_skew_join_spark.sketch.theta import (
    ThetaSketch,
    difference_estimate,
    intersection_estimate,
    jaccard_estimate,
    theta_by_group,
    theta_from_dataframe,
)


def _uniform(rng, n):
    return rng.integers(0, 2 ** 64, n, dtype=np.uint64).astype(np.int64)


def _build(x, k=1024):
    s = ThetaSketch(k)
    for chunk in np.array_split(x, 5):
        s.add_hashed(chunk)
    return s


def test_unsaturated_is_exact():
    s = ThetaSketch(k=256)
    s.add_hashed(np.arange(100, dtype=np.int64))
    assert s.estimate() == 100.0
    assert s.theta_raw == 2 ** 64


def test_estimate_envelope_and_set_ops():
    rng = np.random.default_rng(11)
    a = _uniform(rng, 150_000)
    b = np.concatenate([a[:60_000], _uniform(rng, 90_000)])
    sa, sb = _build(a), _build(b)
    au, bu = a.view(np.uint64), b.view(np.uint64)
    ta, tb = len(np.unique(au)), len(np.unique(bu))
    ti = len(np.intersect1d(au, bu))
    tu = len(np.unique(np.concatenate([au, bu])))
    rse = sa.rse()
    assert abs(sa.estimate() - ta) <= 4 * rse * ta
    assert abs(sb.estimate() - tb) <= 4 * rse * tb
    assert abs(sa.merge(sb).estimate() - tu) <= 4 * rse * tu
    # intersection/difference inherit a larger relative error at weak
    # overlap — gate at 6·RSE of the TRUE value (J ≈ 0.25 here)
    assert abs(intersection_estimate(sa, sb) - ti) <= 6 * rse * ti
    td = ta - ti
    assert abs(difference_estimate(sa, sb) - td) <= 6 * rse * td
    tj = ti / tu
    assert abs(jaccard_estimate(sa, sb) - tj) <= 6 * rse * tj


def test_merge_equals_oneshot_and_order_insensitive():
    rng = np.random.default_rng(3)
    a, b = _uniform(rng, 40_000), _uniform(rng, 40_000)
    merged = _build(a).merge(_build(b))
    oneshot = _build(np.concatenate([a, b]))
    assert np.array_equal(merged.values, oneshot.values)
    reordered = _build(a[::-1].copy())
    assert np.array_equal(_build(a).values, reordered.values)


def test_merge_param_mismatch_rejected():
    with pytest.raises(ValueError):
        ThetaSketch(k=64).merge(ThetaSketch(k=128))
    with pytest.raises(ValueError):
        ThetaSketch(k=64, hash_bits=64).merge(ThetaSketch(k=64, hash_bits=60))


def test_disjoint_intersection_is_zero():
    s1 = ThetaSketch(k=64)
    s1.add_hashed(np.arange(0, 1000, dtype=np.int64))
    s2 = ThetaSketch(k=64)
    s2.add_hashed(np.arange(5000, 6000, dtype=np.int64))
    assert intersection_estimate(s1, s2) == 0.0
    assert jaccard_estimate(s1, s2) == 0.0


def test_spark_build_matches_local(spark):
    """Distributed two-level fold ≡ local fold over the same JVM
    hashes — and the estimate is within envelope of the true count."""
    n = 30_000
    df = spark.createDataFrame([(i,) for i in range(n)], "k bigint")
    sk = theta_from_dataframe(df, ["k"], k=512)
    assert abs(sk.estimate() - n) <= 4 * sk.rse() * n
    # half/half merge ≡ one-shot bit-for-bit
    left = theta_from_dataframe(df.where("k % 2 = 0"), ["k"], k=512)
    right = theta_from_dataframe(df.where("k % 2 = 1"), ["k"], k=512)
    assert np.array_equal(left.merge(right).values, sk.values)


def test_theta_by_group_matches_per_group_build(spark):
    rows = [(i % 3, i % 997) for i in range(20_000)]
    df = spark.createDataFrame(rows, "g int, k bigint")
    grouped = theta_by_group(df, "g", ["k"], k=256)
    assert set(grouped) == {"0", "1", "2"}
    for g in ("0", "1", "2"):
        solo = theta_from_dataframe(df.where(f"g = {g}"), ["k"], k=256)
        assert np.array_equal(grouped[g].values, solo.values)


def test_md5_compat_unsaturated_exact(spark):
    """The md5 hash path: 60-bit space, unsaturated sketch counts
    exactly, and values match a driver-side md5 recomputation."""
    import hashlib

    vals = list(range(50))
    df = spark.createDataFrame([(v,) for v in vals], "k bigint")
    sk = theta_from_dataframe(df, ["k"], k=256, hash_fn="md5")
    assert sk.hash_bits == 60
    assert sk.estimate() == 50.0
    expect = np.sort(np.array(
        [int(hashlib.md5(str(v).encode()).hexdigest()[:15], 16)
         for v in vals], dtype=np.uint64,
    ))
    assert np.array_equal(sk.values, expect)


def test_null_group_caller_pattern(spark):
    """ADVICE r7 #1: the query callers must survive a NULL group key —
    None-first ordering instead of sorted() (TypeError on None/str mix)
    and exact-dict alignment (exact must NOT filter the NULL group out
    when the sketch keeps it)."""
    import itertools

    from pyspark.sql import functions as F

    from spark_skew_join_spark.queries import _null_first
    from spark_skew_join_spark.sketch.theta import (
        intersection_estimate, theta_by_group,
    )

    assert _null_first({"b": 1, None: 2, "a": 3}) == [None, "a", "b"]
    assert _null_first(["z", "y"]) == ["y", "z"]

    rows = ([(None, i) for i in range(300)]
            + [("p1", i) for i in range(200)]
            + [("p2", i + 100) for i in range(200)])
    df = spark.createDataFrame(rows, "g string, k bigint")
    sk = theta_by_group(df, "g", ["k"], k=256, hash_fn="md5")
    assert set(sk) == {None, "p1", "p2"}
    # the exact comparator mirrors queries.theta_sketch_orders: keep the
    # NULL group, drop only NULL key values
    exact = {
        r["g"]: r["n"]
        for r in df.where(F.col("k").isNotNull())
        .groupBy("g").agg(F.countDistinct("k").alias("n")).collect()
    }
    for g, s in sk.items():
        assert abs(s.estimate() - exact[g]) <= 4.0 * s.rse() * exact[g] + 1e-9
    pairs = list(itertools.combinations(_null_first(sk), 2))
    assert pairs[0][0] is None and len(pairs) == 3
    for a, b in pairs:
        assert intersection_estimate(sk[a], sk[b]) >= 0.0
