"""Embedding covariance + PCA projection (operators/pca.py)."""

from __future__ import annotations

import math
import random

import numpy as np
import pytest

from spark_skew_join_spark.operators.pca import embedding_covariance, pca_project


def _synth(spark, n=300, dim=8, seed=23):
    rng = random.Random(seed)
    # anisotropic cloud: dim 0 has 5x the spread of the rest, plus a
    # correlated pair (2, 3) — gives PCA something real to find
    rows = []
    for i in range(n):
        base = [rng.gauss(0, 1) for _ in range(dim)]
        base[0] *= 5.0
        base[3] = 0.8 * base[2] + 0.2 * base[3]
        rows.append((i, [float(x) for x in base]))
    return spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")


def test_covariance_matches_numpy(spark):
    df = _synth(spark)
    rows = embedding_covariance(df, dim=8).collect()
    assert len(rows) == 8 * 9 // 2
    x = np.array([r["embedding"] for r in df.collect()], dtype=np.float64)
    xq = np.round(x, 6)  # the operator's documented quantization
    ref = np.cov(xq, rowvar=False, bias=True)  # /n, like the operator
    for r in rows:
        assert r["n_vecs"] == 300
        assert math.isclose(
            r["cov"], round(ref[r["i"], r["j"]], 6), abs_tol=2e-6
        ), (r["i"], r["j"], r["cov"], ref[r["i"], r["j"]])
    with pytest.raises(ValueError):
        embedding_covariance(df, dim=1)


def test_covariance_outer_matches_decimal_path(spark):
    """The Arrow outer-product fold (the dim-in-the-thousands scale
    path: one d²-float partial per partition, no per-row fan-out) must
    agree with the exact decimal path to float precision."""
    from spark_skew_join_spark.operators.pca import covariance_outer

    df = _synth(spark).repartition(7)
    n, mu, cov = covariance_outer(df, dim=8)
    assert n == 300
    rows = embedding_covariance(df, dim=8).collect()
    for r in rows:
        # decimal path quantizes inputs to 6 decimals; 1e-5 absorbs it
        assert math.isclose(
            r["cov"], cov[r["i"], r["j"]], abs_tol=1e-5
        ), (r["i"], r["j"])
    with pytest.raises(ValueError):
        covariance_outer(df, dim=1)
    with pytest.raises(ValueError):
        covariance_outer(df.where("vec_id < 0"), dim=8)


def test_pca_project_matches_numpy_and_orders_variance(spark):
    df = _synth(spark)
    out, evr = pca_project(df, n_components=3, dim=8)
    got = {r["vec_id"]: list(r["pc"]) for r in out.collect()}
    assert len(got) == 300 and len(next(iter(got.values()))) == 3
    # explained variance: descending, dominated by the 5x dimension
    assert evr[0] > evr[1] > evr[2] > 0
    assert evr[0] > 0.5
    # projections' per-component variance matches the eigenvalue order
    pcs = np.array([got[i] for i in range(300)])
    v = pcs.var(axis=0)
    assert v[0] > v[1] > v[2]
    # component 1 is essentially dimension 0 (the 5x axis): |corr| ~ 1
    x = np.array([r["embedding"] for r in df.collect()], dtype=np.float64)
    corr = np.corrcoef(pcs[:, 0], x[:, 0])[0, 1]
    assert abs(corr) > 0.95, corr
    # deterministic across runs (sign fixed, same quantized covariance)
    out2, evr2 = pca_project(df, n_components=3, dim=8)
    got2 = {r["vec_id"]: list(r["pc"]) for r in out2.collect()}
    assert got == got2 and evr == evr2
    with pytest.raises(ValueError):
        pca_project(df, n_components=0, dim=8)


def test_covariance_overflow_guard_is_ansi_independent(spark):
    """The loud-failure contract must not depend on spark.sql.ansi.enabled:
    inputs whose micro-unit sum envelope crosses 2^63 raise in-plan via
    raise_error even with ANSI off (silent-wrap regime)."""
    import pytest as _pt

    from spark_skew_join_spark.operators.pca import embedding_covariance

    old = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "false")
    try:
        big = spark.createDataFrame(
            [([1e7, 1e7],), ([1e7, 1e7],)], "embedding array<double>"
        )
        with _pt.raises(Exception, match="covariance_outer|int64"):
            embedding_covariance(big, dim=2).collect()
        # sane inputs still pass under the same setting
        ok = spark.createDataFrame(
            [([0.5, 0.25],), ([0.75, 1.0],)], "embedding array<double>"
        )
        assert embedding_covariance(ok, dim=2).count() == 3
    finally:
        spark.conf.set("spark.sql.ansi.enabled", old)


def test_covariance_quantize_range_guard(spark):
    """|x| >= 1e12 exceeds decimal(18,6): under ANSI-off the cast would
    NULL silently (NULLs skip sum/max, blinding the envelope guard —
    ADVICE r11 #2); the element expression must raise in-plan instead."""
    import pytest as _pt

    from spark_skew_join_spark.operators.pca import embedding_covariance

    old = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "false")
    try:
        big = spark.createDataFrame(
            [([1.5e12, 0.0],), ([0.0, 1.0],)], "embedding array<double>"
        )
        with _pt.raises(Exception, match="decimal\\(18,6\\)|covariance_outer"):
            embedding_covariance(big, dim=2).collect()
        nan = spark.createDataFrame(
            [([float("nan"), 0.0],), ([0.0, 1.0],)], "embedding array<double>"
        )
        with _pt.raises(Exception, match="decimal\\(18,6\\)|covariance_outer"):
            embedding_covariance(nan, dim=2).collect()
        # sane values still pass the new element guard under the same
        # setting — collect(), not count(): count prunes the guarded
        # columns and would vacuously pass
        ok = spark.createDataFrame(
            [([0.5, 0.25],), ([0.75, 1.0],)], "embedding array<double>"
        )
        assert len(embedding_covariance(ok, dim=2).collect()) == 3
    finally:
        spark.conf.set("spark.sql.ansi.enabled", old)
