"""Association rules vs a Python brute force (operators/assoc.py)."""

from __future__ import annotations

import itertools
import random

import pytest

from spark_skew_join_spark.operators.assoc import association_rules


def _brute(baskets: dict[int, set[str]], min_pair: int, min_conf: float):
    n = len(baskets)
    icount: dict[str, int] = {}
    for s in baskets.values():
        for it in s:
            icount[it] = icount.get(it, 0) + 1
    pair: dict[tuple[str, str], int] = {}
    for s in baskets.values():
        for a, b in itertools.combinations(sorted(s), 2):
            pair[(a, b)] = pair.get((a, b), 0) + 1
    rules = {}
    for (a, b), c in pair.items():
        if c < min_pair:
            continue
        for ante, cons in ((a, b), (b, a)):
            conf = c / icount[ante]
            if conf >= min_conf:
                rules[(ante, cons)] = (
                    c,
                    icount[ante],
                    icount[cons],
                    c / n,
                    conf,
                    c * n / (icount[ante] * icount[cons]),
                )
    return rules


def test_assoc_matches_brute_force(spark):
    rng = random.Random(7)
    items = [f"i{k}" for k in range(12)]
    baskets = {
        b: set(rng.sample(items, rng.randint(1, 5))) for b in range(80)
    }
    rows = [(b, it) for b, s in baskets.items() for it in s]
    # duplicate (basket, item) rows must not inflate counts
    rows += rows[:10]
    df = spark.createDataFrame(rows, ["basket", "item"])
    got = {
        (r.antecedent, r.consequent): (
            r.pair_count,
            r.n_antecedent,
            r.n_consequent,
            r.support,
            r.confidence,
            r.lift,
        )
        for r in association_rules(
            df, "basket", "item", min_pair_count=2, min_confidence=0.3
        ).collect()
    }
    want = _brute(baskets, 2, 0.3)
    assert set(got) == set(want)
    for k, (c, na, nb, sup, conf, lift) in want.items():
        gc, gna, gnb, gsup, gconf, glift = got[k]
        assert (gc, gna, gnb) == (c, na, nb)
        assert gsup == pytest.approx(sup, rel=1e-12)
        assert gconf == pytest.approx(conf, rel=1e-12)
        assert glift == pytest.approx(lift, rel=1e-12)


def test_assoc_min_pair_prunes_and_validates(spark):
    df = spark.createDataFrame(
        [(1, "a"), (1, "b"), (2, "a"), (2, "b"), (3, "a"), (3, "c")],
        ["basket", "item"],
    )
    got = association_rules(df, "basket", "item", min_pair_count=2).collect()
    assert {(r.antecedent, r.consequent) for r in got} == {
        ("a", "b"),
        ("b", "a"),
    }
    (ab,) = [r for r in got if r.antecedent == "a"]
    assert ab.pair_count == 2 and ab.n_antecedent == 3
    assert ab.confidence == pytest.approx(2 / 3)
    assert ab.lift == pytest.approx(2 * 3 / (3 * 2))
    with pytest.raises(ValueError):
        association_rules(df, "basket", "item", min_pair_count=0)
