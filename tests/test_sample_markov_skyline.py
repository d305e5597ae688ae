"""weighted_sample / markov_transitions / skyline unit+property tests."""

from __future__ import annotations

import itertools
import random

import pytest

from spark_skew_join_spark.operators.funnel import markov_transitions
from spark_skew_join_spark.operators.sampling import weighted_sample
from spark_skew_join_spark.operators.skyline import skyline


# ---------------------------------------------------------------- sampling

def test_weighted_sample_exact_k_deterministic(spark):
    rows = [(i, f"g{i % 5}", float(1 + i % 7)) for i in range(200)]
    df = spark.createDataFrame(rows, ["id", "g", "w"])
    a = weighted_sample(df, "id", "w", k=6, group_col="g")
    b = weighted_sample(df, "id", "w", k=6, group_col="g")
    got_a = sorted((r.g, r.id) for r in a.collect())
    got_b = sorted((r.g, r.id) for r in b.collect())
    assert got_a == got_b  # same hash race, same winners
    per_group = {g: 0 for g in {r[0] for r in got_a}}
    for g, _ in got_a:
        per_group[g] += 1
    assert all(v == 6 for v in per_group.values())


def test_weighted_sample_bias_toward_heavy(spark):
    # two items per group, weight 9 vs 1: heavy one should win the
    # 1-slot draw in roughly 90% of groups (exact binomial, hash-fixed)
    rows = []
    for g in range(400):
        rows.append((2 * g, g, 9.0))
        rows.append((2 * g + 1, g, 1.0))
    df = spark.createDataFrame(rows, ["id", "g", "w"])
    got = weighted_sample(df, "id", "w", k=1, group_col="g").collect()
    heavy = sum(1 for r in got if r.id % 2 == 0)
    assert len(got) == 400
    assert 320 <= heavy <= 390  # E=360, sd≈6


def test_weighted_sample_zero_weight_excluded_and_ungrouped(spark):
    df = spark.createDataFrame(
        [(1, 0.0), (2, -3.0), (3, 5.0), (4, 5.0)], ["id", "w"]
    )
    got = weighted_sample(df, "id", "w", k=10).collect()
    assert sorted(r.id for r in got) == [3, 4]
    with pytest.raises(ValueError):
        weighted_sample(df, "id", "w", k=0)


# ------------------------------------------------------------------ markov

def test_markov_counts_and_probs(spark):
    # user 1: a->b->a->c   user 2: b->b
    rows = [
        (1, 1, "a"), (1, 2, "b"), (1, 3, "a"), (1, 4, "c"),
        (2, 1, "b"), (2, 2, "b"),
    ]
    df = spark.createDataFrame(rows, ["uid", "t", "s"])
    got = {
        (r.from_state, r.to_state): (r.n_transitions, r.n_from, r.prob)
        for r in markov_transitions(df, "uid", ["t"], "s").collect()
    }
    assert got[("a", "b")] == (1, 2, 0.5)
    assert got[("a", "c")] == (1, 2, 0.5)
    assert got[("b", "a")] == (1, 2, 0.5)
    assert got[("b", "b")] == (1, 2, 0.5)
    assert len(got) == 4  # no cross-user transition (1:"c" -> 2:"b")


def test_markov_single_event_users_contribute_nothing(spark):
    df = spark.createDataFrame(
        [(u, 1, "x") for u in range(5)], ["uid", "t", "s"]
    )
    assert markov_transitions(df, "uid", ["t"], "s").count() == 0


# ----------------------------------------------------------------- skyline

def _brute_skyline(pts, n_min):
    out = []
    for p in pts:
        dominated = False
        for q in pts:
            le = all(
                (q[d] <= p[d]) if d < n_min else (q[d] >= p[d])
                for d in range(len(p))
            )
            lt = any(
                (q[d] < p[d]) if d < n_min else (q[d] > p[d])
                for d in range(len(p))
            )
            if le and lt:
                dominated = True
                break
        if not dominated:
            out.append(p)
    return sorted(out)


@pytest.mark.parametrize("seed,dims_min,dims_max", [(3, 1, 1), (4, 2, 1)])
def test_skyline_matches_brute_force(spark, seed, dims_min, dims_max):
    rng = random.Random(seed)
    d = dims_min + dims_max
    pts = [
        tuple(float(rng.randint(0, 20)) for _ in range(d)) for _ in range(150)
    ]
    cols = [f"c{i}" for i in range(d)]
    df = spark.createDataFrame(pts, cols).repartition(7)
    got = sorted(
        tuple(r[c] for c in cols)
        for r in skyline(
            df, minimize=cols[:dims_min], maximize=cols[dims_min:]
        ).collect()
    )
    assert got == _brute_skyline(pts, dims_min)


def test_skyline_keeps_tied_duplicates(spark):
    df = spark.createDataFrame(
        [(1, 1.0, 5), (2, 1.0, 5), (3, 2.0, 4)], ["id", "price", "size"]
    )
    got = sorted(
        r.id
        for r in skyline(df, minimize=["price"], maximize=["size"]).collect()
    )
    assert got == [1, 2]  # equal pair mutually non-dominating; 3 dominated
    with pytest.raises(ValueError):
        skyline(df)
