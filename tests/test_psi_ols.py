"""psi_drift and ols_trend unit tests (round-8 monitoring additions)."""
import math

import pytest

from spark_skew_join_spark.operators.profile import psi_drift
from spark_skew_join_spark.operators.timeseries import ols_trend


def _mk(spark, rows):
    return spark.createDataFrame(rows, "k string, v double")


def test_psi_identical_distributions_is_zero(spark):
    rows = [("a", float(i % 20)) for i in range(400)]
    a, b = _mk(spark, rows), _mk(spark, rows)
    out = psi_drift(a, b, "k", "v").collect()
    assert len(out) == 1
    r = out[0]
    assert r["psi"] == 0.0 and not r["drift"]
    assert r["n_a"] == r["n_b"] == 400


def test_psi_matches_python_replay_and_flags_shift(spark):
    # reference uniform on [0, 9.75]; candidate concentrated in [8, 9.9]
    av = [(i % 40) * 0.25 for i in range(400)]
    bv = [8.0 + (i % 20) / 10.0 for i in range(200)]
    a = _mk(spark, [("a", v) for v in av])
    b = _mk(spark, [("a", v) for v in bv])
    r = psi_drift(a, b, "k", "v", bins=10, eps=1e-6).collect()[0]

    # exact Python replay of the operator's arithmetic
    mn, mx = min(av), max(av)
    width = (mx - mn) / 10.0

    def bin_of(v):
        return min(max(int(math.floor((v - mn) / width)), 0), 9)

    na = [0] * 10
    nb = [0] * 10
    for v in av:
        na[bin_of(v)] += 1
    for v in bv:
        nb[bin_of(v)] += 1
    psi = sum(
        (max(na[i] / 400.0, 1e-6) - max(nb[i] / 200.0, 1e-6))
        * math.log(max(na[i] / 400.0, 1e-6) / max(nb[i] / 200.0, 1e-6))
        for i in range(10)
    )
    assert r["psi"] == round(psi, 6)
    assert r["drift"]


def test_psi_degenerate_reference_single_value(spark):
    a = _mk(spark, [("a", 5.0)] * 50)
    b = _mk(spark, [("a", 5.0)] * 30 + [("a", 9.0)] * 10)
    r = psi_drift(a, b, "k", "v").collect()[0]
    # max == min: everything lands in bin 0 on both sides -> psi 0
    assert r["psi"] == 0.0 and r["n_b"] == 40


def test_psi_candidate_out_of_range_clamps(spark):
    a = _mk(spark, [("a", float(i)) for i in range(10)])
    b = _mk(spark, [("a", -100.0), ("a", 100.0)])
    r = psi_drift(a, b, "k", "v").collect()[0]
    assert r["n_b"] == 2  # nothing dropped — clamped into edge bins


def test_ols_recovers_exact_line(spark):
    rows = [("a", float(x), 2.5 * x + 1.0) for x in range(50)]
    df = spark.createDataFrame(rows, "k string, x double, y double")
    r = ols_trend(df, "k", "x", "y").collect()[0]
    assert r["slope"] == 2.5 and r["intercept"] == 1.0 and r["r2"] == 1.0
    assert r["n_points"] == 50


def test_ols_matches_numpy_on_noisy_data(spark):
    import numpy as np

    rng = [(i * 37 % 101) / 10.0 for i in range(80)]
    xs = [float(i) for i in range(80)]
    ys = [0.7 * x + 3.0 + n for x, n in zip(xs, rng)]
    df = spark.createDataFrame(
        [("a", x, y) for x, y in zip(xs, ys)], "k string, x double, y double"
    )
    r = ols_trend(df, "k", "x", "y").collect()[0]
    slope, intercept = np.polyfit(xs, ys, 1)
    cc = np.corrcoef(xs, ys)[0, 1]
    assert r["slope"] == pytest.approx(slope, abs=1e-6)
    assert r["intercept"] == pytest.approx(intercept, abs=1e-6)
    assert r["r2"] == pytest.approx(cc * cc, abs=1e-6)


def test_ols_degenerate_keys(spark):
    rows = (
        [("vertical", 1.0, float(i)) for i in range(5)]       # all-equal x
        + [("flat", float(i), 7.0) for i in range(5)]          # var(y)=0
    )
    df = spark.createDataFrame(rows, "k string, x double, y double")
    got = {r["k"]: r for r in ols_trend(df, "k", "x", "y").collect()}
    v = got["vertical"]
    assert v["slope"] is None and v["intercept"] is None and v["r2"] is None
    f = got["flat"]
    assert f["slope"] == 0.0 and f["intercept"] == 7.0 and f["r2"] is None


def test_hard_negatives_excludes_same_label(spark):
    from spark_skew_join_spark.operators.similarity import hard_negatives

    rows = [(i, [1.0 if j == i % 4 else 0.1 for j in range(4)],
             f"s{i % 2}") for i in range(20)]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label string"
    )
    out = hard_negatives(df, df.where("vec_id < 3"), k=5, dim=4)
    got = out.collect()
    assert all(r["query_label"] != r["neighbor_label"] for r in got)
    assert {r["query_id"] for r in got} == {0, 1, 2}
    per_q = {}
    for r in got:
        per_q.setdefault(r["query_id"], []).append(r["rank"])
    assert all(sorted(v) == list(range(1, 6)) for v in per_q.values())


def test_hard_negatives_null_label_mismatch_semantics(spark):
    """NULL labels: eqNullSafe — a NULL-labeled anchor treats NULL
    neighbors as SAME (excluded) and labeled neighbors as different."""
    from spark_skew_join_spark.operators.similarity import hard_negatives

    rows = [(0, [1.0, 0.0], None), (1, [0.9, 0.1], None),
            (2, [0.8, 0.2], "x")]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label string"
    )
    out = hard_negatives(df, df.where("vec_id = 0"), k=5, dim=2).collect()
    assert [r["neighbor_id"] for r in out] == [2]


def test_weighted_quantiles_inverted_cdf(spark):
    from spark_skew_join_spark.operators.profile import weighted_quantiles

    # values 1..4 with weights 1, 1, 6, 2 (total 10)
    rows = [("a", 1.0, 1.0), ("a", 2.0, 1.0), ("a", 3.0, 6.0),
            ("a", 4.0, 2.0)]
    df = spark.createDataFrame(rows, "k string, v double, w double")
    out = {r["q"]: r for r in
           weighted_quantiles(df, "k", "v", "w", qs=[0.2, 0.5, 0.8, 1.0])
           .collect()}
    # cum: 1->1, 2->2, 3->8, 4->10
    assert out[0.2]["value"] == 2.0   # need cw >= 2
    assert out[0.5]["value"] == 3.0   # need cw >= 5
    assert out[0.8]["value"] == 3.0   # need cw >= 8 (exactly)
    assert out[1.0]["value"] == 4.0
    assert out[0.5]["total_weight"] == 10.0
    # duplicate values merge their weights first
    df2 = spark.createDataFrame(
        [("a", 1.0, 4.0), ("a", 1.0, 4.0), ("a", 9.0, 2.0)],
        "k string, v double, w double",
    )
    r = {x["q"]: x["value"]
         for x in weighted_quantiles(df2, "k", "v", "w", qs=[0.8, 0.9])
         .collect()}
    assert r[0.8] == 1.0 and r[0.9] == 9.0


def test_weighted_quantiles_rejects_bad_q(spark):
    import pytest

    from spark_skew_join_spark.operators.profile import weighted_quantiles

    df = spark.createDataFrame([("a", 1.0, 1.0)], "k string, v double, w double")
    with pytest.raises(ValueError):
        weighted_quantiles(df, "k", "v", "w", qs=[0.0])
    with pytest.raises(ValueError):
        weighted_quantiles(df, "k", "v", "w", qs=[])


def test_token_budget_sample_cut_semantics(spark):
    from spark_skew_join_spark.operators.sampling import token_budget_sample

    # weights in take order (w desc, id): 10, 8, 5, 3, 1 -> prefix
    # 0, 10, 18, 23, 26; budget 20 selects prefix < 20 = first three
    rows = [(1, 10.0), (2, 8.0), (3, 5.0), (4, 3.0), (5, 1.0)]
    df = spark.createDataFrame(rows, "doc_id bigint, w double")
    out = token_budget_sample(df, 20.0, "w", "w", n_buckets=4)
    got = {r["doc_id"]: r["__cum_before"] for r in out.collect()}
    assert got == {1: 0.0, 2: 10.0, 3: 18.0}
    # crossing row included: budget 11 -> prefixes 0, 10 < 11
    out2 = token_budget_sample(df, 11.0, "w", "w", n_buckets=4)
    assert {r["doc_id"] for r in out2.collect()} == {1, 2}
    # budget beyond total takes everything
    out3 = token_budget_sample(df, 1000.0, "w", "w", n_buckets=4)
    assert out3.count() == 5
    # degenerate: all order values equal (single bucket window)
    df2 = spark.createDataFrame(
        [(i, 5.0) for i in range(6)], "doc_id bigint, w double"
    )
    out4 = token_budget_sample(df2, 12.0, "w", "w", n_buckets=8)
    assert sorted(r["doc_id"] for r in out4.collect()) == [0, 1, 2]

    import pytest

    with pytest.raises(ValueError):
        token_budget_sample(df, 0.0, "w", "w")


def test_token_budget_matches_global_window(spark):
    """The bucketed implementation must equal the naive global-order
    cumulative cut row for row, including __cum_before."""
    from pyspark.sql import Window, functions as F

    from spark_skew_join_spark.operators.sampling import token_budget_sample

    rows = [(i, float((i * 37) % 50 + 1), float((i * 13) % 23))
            for i in range(500)]
    df = spark.createDataFrame(rows, "doc_id bigint, w double, q double")
    budget = 2000.0
    got = sorted(
        (r["doc_id"], r["__cum_before"])
        for r in token_budget_sample(df, budget, "w", "q",
                                     n_buckets=16).collect()
    )
    wspec = (
        Window.orderBy(F.col("q").desc(), F.col("doc_id").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    naive = (
        df.withColumn("cb", F.coalesce(F.sum("w").over(wspec), F.lit(0.0)))
        .where(F.col("cb") < budget)
    )
    want = sorted((r["doc_id"], r["cb"]) for r in naive.collect())
    assert got == want


def test_hard_negatives_candidate_path_equals_brute(spark):
    """VERDICT r8 #3: the wired candidate path. With a candidate set
    that covers each anchor's true differing-label top-k, the
    candidate-joined result is IDENTICAL to the broadcast-crossJoin
    brute path (the label filter and the per-anchor cut commute with
    candidate restriction)."""
    import random

    from spark_skew_join_spark.operators.similarity import (
        cosine_topk, hard_negatives,
    )

    rng = random.Random(11)
    rows = [
        (i, [rng.gauss(0, 1) for _ in range(8)], f"s{i % 3}")
        for i in range(60)
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label string"
    )
    anchors = df.where("vec_id < 4")
    brute = hard_negatives(df, anchors, k=5, dim=8)
    # cover: per anchor at most 20 same-label rows, so the overall
    # top-25 neighbors contain the differing-label top-5
    cand = cosine_topk(df, anchors, k=25, dim=8)
    via_cand = hard_negatives(df, anchors, k=5, dim=8, candidates=cand)
    key = lambda r: (r["query_id"], r["rank"])
    a = sorted(brute.collect(), key=key)
    b = sorted(via_cand.collect(), key=key)
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
    # an UNDER-covering candidate set still ranks densely 1..k over
    # what it was given (the cut is over candidates, recall is the ANN
    # stage's contract, not this operator's)
    small = cosine_topk(df, anchors, k=7, dim=8)
    out = hard_negatives(df, anchors, k=5, dim=8, candidates=small).collect()
    per_q = {}
    for r in out:
        assert r["query_label"] != r["neighbor_label"]
        per_q.setdefault(r["query_id"], []).append(r["rank"])
    assert all(v == sorted(v) == list(range(1, len(v) + 1))
               for v in per_q.values())
