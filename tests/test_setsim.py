"""Prefix-filtered set-similarity join vs brute force (operators/setsim.py).

The prefix filter's guarantee is 100% recall — every pair with Jaccard
>= t must survive candidate generation. We check it against a Python
brute force over randomized corpora (word unigrams and bigrams), plus
the boundary cases: threshold 1.0 (exact word-set duplicates only) and
documents too short to form a bigram.
"""

from __future__ import annotations

import itertools
import random

import pytest

from spark_skew_join_spark.operators.setsim import (
    set_similarity_join,
    word_ngrams,
)


def _brute(docs: list[tuple[int, str]], t: float, n: int):
    """Brute-force reference: {(a, b): jaccard} for pairs >= t."""

    def grams(text: str):
        words = [w for w in text.lower().split(" ") if w]
        if n == 1:
            return set(words)
        return {
            " ".join(words[i : i + n]) for i in range(len(words) - n + 1)
        }

    sets = {i: grams(s) for i, s in docs}
    out = {}
    for (a, sa), (b, sb) in itertools.combinations(sets.items(), 2):
        if not sa or not sb:
            continue
        inter = len(sa & sb)
        union = len(sa) + len(sb) - inter
        if union and inter / union >= t:
            out[(min(a, b), max(a, b))] = inter / union
    return out


def _rand_docs(seed: int, n_docs: int = 50, vocab: int = 30):
    rng = random.Random(seed)
    words = [f"w{i}" for i in range(vocab)]
    docs = []
    for i in range(n_docs):
        k = rng.randint(1, 14)
        docs.append((i, " ".join(rng.choice(words) for _ in range(k))))
    # plant some exact / near duplicates
    for j in range(5):
        base = docs[j][1]
        docs.append((n_docs + j, base))
        docs.append((n_docs + 5 + j, base + " extraword"))
    return docs


@pytest.mark.parametrize("seed,t,n", [(1, 0.6, 1), (2, 0.5, 2), (3, 0.8, 1)])
def test_setsim_matches_brute_force(spark, seed, t, n):
    docs = _rand_docs(seed)
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    got = {
        (r.id_a, r.id_b): r.jaccard
        for r in set_similarity_join(df, t, ngram=n).collect()
    }
    want = _brute(docs, t, n)
    assert set(got) == set(want)
    for pair, j in want.items():
        assert got[pair] == pytest.approx(j, abs=1e-12)


def test_threshold_one_is_exact_set_equality(spark):
    docs = [
        (1, "a b c"),
        (2, "c b a a"),  # same word set, different order/multiplicity
        (3, "a b d"),
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    got = {(r.id_a, r.id_b) for r in set_similarity_join(df, 1.0).collect()}
    assert got == {(1, 2)}


def test_short_docs_yield_no_bigrams(spark):
    df = spark.createDataFrame(
        [(1, "solo"), (2, "solo"), (3, "two words"), (4, "two words")],
        ["doc_id", "text"],
    )
    toks = word_ngrams(df, 2).collect()
    assert {r._ss_id for r in toks} == {3, 4}
    pairs = {
        (r.id_a, r.id_b)
        for r in set_similarity_join(df, 0.5, ngram=2).collect()
    }
    assert pairs == {(3, 4)}


def test_pruning_ceils_never_overshoot_exact_bounds():
    """ADVICE r12: the derived ratios 2t/(1+t) and t/(1+t) are double-
    rounded, so a bare ceil can exceed the exact rational bound by 1
    (t=0.015, na+nb=1015 → 16 vs exact 15). The epsilon-guarded ceils
    the operator uses must never overshoot (recall-safe); the bare
    version must overshoot somewhere in the sweep (documents the bug
    the guard exists for)."""
    import math
    from fractions import Fraction

    eps = 1e-6
    bare_overshoots = 0
    for tv in (0.015, 0.1, 0.3, 0.5, 0.7, 0.85):
        ft = Fraction(tv)  # the threshold double's exact rational value
        r_alpha, r_short = ft / (1 + ft), 2 * ft / (1 + ft)
        d_alpha, d_short = tv / (1.0 + tv), 2.0 * tv / (1.0 + tv)
        for n in range(1, 1301):
            for d, r in (
                (d_alpha * n, r_alpha * n),  # alpha / long-side bound
                (d_short * n, r_short * n),  # a-prefix bound
                (tv * n, ft * n),  # b-prefix + length filter
            ):
                exact = math.ceil(r)
                if math.ceil(d) > exact:
                    bare_overshoots += 1
                assert math.ceil(d - eps) <= exact, (tv, n)
    assert bare_overshoots > 0


def test_recall_at_known_alpha_overshoot_pair(spark):
    """End-to-end planted pair AT the documented overshoot point:
    t=0.015, sizes (500, 515), overlap 15 → jaccard = 15/1000 = t
    exactly, alpha_exact = 15 but the unguarded double ceil gives 16,
    which drops the pair at the positional filter. Must be found."""
    t = 0.015
    shared = [f"s{i:02d}" for i in range(15)]
    a_own = [f"a{i:03d}" for i in range(485)]
    b_own = [f"b{i:03d}" for i in range(500)]
    docs = [
        (1, " ".join(a_own + shared)),
        (2, " ".join(b_own + shared)),
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    rows = set_similarity_join(df, t, cache_ordered=False).collect()
    assert [(r.id_a, r.id_b) for r in rows] == [(1, 2)]
    assert rows[0].inter == 15
    assert rows[0].jaccard == pytest.approx(0.015, abs=1e-12)


def test_bad_threshold_rejected(spark):
    df = spark.createDataFrame([(1, "a")], ["doc_id", "text"])
    with pytest.raises(ValueError):
        set_similarity_join(df, 0.0)
    with pytest.raises(ValueError):
        set_similarity_join(df, 1.5)
