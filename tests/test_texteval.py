"""texteval + doremi operators: BLEU/ROUGE, readability, domain reweight."""

from __future__ import annotations

import math

from spark_skew_join_spark.operators.doremi import domain_reweight
from spark_skew_join_spark.operators.texteval import (
    corpus_bleu_rouge,
    readability,
)


def test_bleu_rouge_hand_computed(spark):
    # 14 tokens -> candidate drops positions 7 and 14 (1-based): 12 tokens.
    # ref:  a b c d e f g h i j k l m n
    # cand: a b c d e f h i j k l m   (g and n dropped)
    docs = spark.createDataFrame(
        [(1, "a b c d e f g h i j k l m n", "A")],
        "doc_id bigint, text string, source string",
    )
    row = corpus_bleu_rouge(docs).collect()[0]
    assert row["n_docs"] == 1
    assert row["ref_tokens"] == 14
    assert row["cand_tokens"] == 12
    # unigrams: every cand token appears once in ref -> clip1 = 12
    assert row["rouge1_recall"] == round(12 / 14, 6)
    # cand bigrams: 11 of them; 'f h' is novel (not in ref) -> clip2 = 10
    # ref bigrams: 13
    assert row["rouge2_recall"] == round(10 / 13, 6)
    p1, p2 = 12 / 12, 10 / 11
    bp = math.exp(min(0.0, 1.0 - 14 / 12))
    want = round(bp * math.exp(0.5 * math.log(p1) + 0.5 * math.log(p2)), 6)
    assert row["bleu2"] == want


def test_bleu_identity_when_nothing_dropped(spark):
    # < 7 tokens: candidate == reference -> perfect precision/recall,
    # BP = 1, BLEU-2 = 1
    docs = spark.createDataFrame(
        [(1, "u v w x y z", "A"), (2, "u v w", "A")],
        "doc_id bigint, text string, source string",
    )
    row = corpus_bleu_rouge(docs).collect()[0]
    assert row["cand_tokens"] == row["ref_tokens"] == 9
    assert row["bleu2"] == 1.0
    assert row["rouge1_recall"] == 1.0
    assert row["rouge2_recall"] == 1.0


def test_readability_hand_computed(spark):
    # doc: "strength a table value" -> syllables: strength 1 ([e]),
    # a 1, table 2 ([a],[e]), value 2 ([a],[ue]) = 6; words 4;
    # sentences = ceil(4/15) = 1
    docs = spark.createDataFrame(
        [(1, "strength a table value", "A")],
        "doc_id bigint, text string, source string",
    )
    row = readability(docs).collect()[0]
    assert row["words"] == 4
    assert row["syllables"] == 6
    assert row["sentences"] == 1
    wps, spw = 4 / 1, 6 / 4
    assert row["flesch"] == round(206.835 - 1.015 * wps - 84.6 * spw, 6)
    assert row["fk_grade"] == round(0.39 * wps + 11.8 * spw - 15.59, 6)


def test_readability_consonant_word_floor(spark):
    # a vowel-free token still counts >= 1 syllable
    docs = spark.createDataFrame(
        [(1, "xyzzw bcd", "A")], "doc_id bigint, text string, source string"
    )
    row = readability(docs).collect()[0]
    # xyzzw has [y] -> 1; bcd has none -> floor 1
    assert row["syllables"] == 2


def test_domain_reweight_orders_and_normalizes(spark):
    # domain B repeats one bigram (predictable); domain A is all-novel
    # bigrams -> A has higher mean NLL -> excess > 0 -> weight(A) >
    # weight(B); weights sum to ~1.
    docs = spark.createDataFrame(
        [
            (1, "p q r s t u", "A"),
            (2, "m m m m m m", "B"),
            (3, "m m m m m m", "B"),
        ],
        "doc_id bigint, text string, source string",
    )
    rows = {r["source"]: r.asDict() for r in domain_reweight(docs).collect()}
    assert rows["A"]["mean_nll"] > rows["B"]["mean_nll"]
    assert rows["B"]["excess_nll"] == 0.0
    assert rows["A"]["excess_nll"] == round(
        rows["A"]["mean_nll"] - rows["B"]["mean_nll"], 6
    )
    assert rows["A"]["weight"] > rows["B"]["weight"]
    total = sum(r["weight"] for r in rows.values())
    assert abs(total - 1.0) < 1e-5
    # uniform floor: alpha/k = 0.1 per domain is a hard lower bound
    assert all(r["weight"] > 0.2 / 2 for r in rows.values())


def test_domain_reweight_uniform_on_identical_domains(spark):
    # identical text in every domain -> zero excess everywhere ->
    # exactly uniform weights
    docs = spark.createDataFrame(
        [(1, "a b c", "A"), (2, "a b c", "B"), (3, "a b c", "C")],
        "doc_id bigint, text string, source string",
    )
    for r in domain_reweight(docs).collect():
        assert r["excess_nll"] == 0.0
        assert r["weight"] == round(1 / 3, 6)


def test_domain_reweight_mw_trajectory_replay(spark):
    # replay the multiplicative-weights recurrence in pure Python from
    # the operator's own per-epoch excess columns: every weight_e{t}
    # must match the recurrence with per-step round-6 (the same
    # recurrence the SQL oracle unrolls)
    from spark_skew_join_spark.operators.doremi import domain_reweight_mw

    docs = spark.createDataFrame(
        [
            (i, t, s)
            for i, (t, s) in enumerate(
                [
                    ("p q r s t u v w", "A"),
                    ("m m m m m m m m", "B"),
                    ("m m n n m m n n", "B"),
                    ("p q r s p q r s", "A"),
                    ("u v w u v w u v", "A"),
                    ("n n n n m m m m", "B"),
                ]
            )
        ],
        "doc_id bigint, text string, source string",
    )
    rows = {
        r["source"]: r.asDict()
        for r in domain_reweight_mw(docs, epochs=3).collect()
    }
    k, eta, alpha = 2, 0.5, 0.2
    w_prev = {g: round(1.0 / k, 6) for g in rows}
    for t in (1, 2, 3):
        s = {
            g: round(w_prev[g] * math.exp(eta * rows[g][f"excess_e{t}"]), 9)
            for g in rows
        }
        z = sum(s.values())
        w_now = {
            g: round((1 - alpha) * (s[g] / z) + alpha / k, 6) for g in rows
        }
        for g in rows:
            assert rows[g][f"weight_e{t}"] == w_now[g], (t, g)
        w_prev = w_now
    for g in rows:
        assert rows[g]["weight"] == rows[g]["weight_e3"]
    assert abs(sum(r["weight"] for r in rows.values()) - 1.0) < 1e-5


def test_domain_reweight_mw_uniform_fixpoint(spark):
    # identical text in every domain and epoch slice -> zero excess at
    # every step -> the uniform mixture is a fixpoint of the recurrence
    from spark_skew_join_spark.operators.doremi import domain_reweight_mw

    docs = spark.createDataFrame(
        [(i, "a b c a b c", f"S{i // 3}") for i in range(9)],
        "doc_id bigint, text string, source string",
    )
    for r in domain_reweight_mw(docs, epochs=3).collect():
        for t in (1, 2, 3):
            assert r[f"excess_e{t}"] == 0.0
            assert r[f"weight_e{t}"] == round(1 / 3, 6)


from hypothesis import HealthCheck, given, settings, strategies as st  # noqa: E402


def _bleu_rouge_reference(token_lists):
    """Pure-Python corpus BLEU-2 / ROUGE-1/2 for the deletion candidate
    (drop every 7th 1-based token) — an independent implementation with
    explicit clip joins for BOTH n (no unigram-identity shortcut)."""
    from collections import Counter

    c1 = c2 = t1c = t2c = t1r = t2r = 0
    for w in token_lists:
        cand = [t for i, t in enumerate(w) if (i + 1) % 7 != 0]
        for n in (1, 2):
            rg = Counter(tuple(w[i:i + n]) for i in range(len(w) - n + 1))
            cg = Counter(
                tuple(cand[i:i + n]) for i in range(len(cand) - n + 1)
            )
            clip = sum(min(c, rg[g]) for g, c in cg.items())
            if n == 1:
                c1 += clip
                t1c += len(cand)
                t1r += len(w)
            else:
                c2 += clip
                t2c += max(len(cand) - 1, 0)
                t2r += max(len(w) - 1, 0)
    import math as m

    p1, p2 = c1 / t1c, c2 / t2c if t2c else 0.0
    bp = m.exp(min(0.0, 1.0 - t1r / t1c))
    bleu = (
        round(bp * m.exp(0.5 * m.log(p1) + 0.5 * m.log(p2)), 6)
        if c1 > 0 and c2 > 0
        else 0.0
    )
    return {
        "cand_tokens": t1c,
        "ref_tokens": t1r,
        "bleu2": bleu,
        "rouge1_recall": round(c1 / t1r, 6),
        "rouge2_recall": round(c2 / t2r, 6) if t2r else None,
    }


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    docs=st.lists(
        st.lists(
            st.sampled_from(["a", "b", "c", "d", "e"]),
            min_size=2, max_size=30,
        ),
        min_size=1, max_size=12,
    )
)
def test_bleu_rouge_matches_python_reference(spark, docs):
    # single group: the Spark operator (WITH the unigram-identity
    # shortcut) must match an independent Python implementation that
    # clips every n explicitly — re-proving the identity on arbitrary
    # token multisets, not just the fixtures
    df = spark.createDataFrame(
        [(i, " ".join(w), "G") for i, w in enumerate(docs)],
        "doc_id bigint, text string, source string",
    )
    got = corpus_bleu_rouge(df).collect()[0].asDict()
    want = _bleu_rouge_reference(docs)
    for k, v in want.items():
        assert got[k] == v, (k, got[k], v)


def test_doremi_plans_are_window_free(spark):
    """VERDICT r11 #4: the D-row recurrence must not use the global
    Window.partitionBy() idiom — the packed-row HOF plan has no
    WindowExec at all (and the only BNLJ is the allowlisted 1-row
    vocabulary scalar broadcast)."""
    from spark_skew_join_spark.operators.doremi import (
        domain_reweight,
        domain_reweight_mw,
    )

    docs = spark.createDataFrame(
        [
            (i, f"src{i % 3}", "tok%d tok%d tok%d" % (i % 5, i % 7, i % 3))
            for i in range(30)
        ],
        "doc_id bigint, source string, text string",
    )
    for df in (domain_reweight(docs), domain_reweight_mw(docs, epochs=2)):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Window" not in plan, plan
        assert plan.count("BroadcastNestedLoopJoin") <= 1, plan


def test_domain_reweight_single_domain_edge(spark):
    """k=1 edge of the packed-row recurrence: one domain means zero
    excess everywhere and weight exactly (1-α)·1 + α/1 = 1.0 in both
    variants (array_repeat/posexplode paths degenerate to one element)."""
    from spark_skew_join_spark.operators.doremi import (
        domain_reweight,
        domain_reweight_mw,
    )

    docs = spark.createDataFrame(
        [(i, "only", "tok%d tok%d tok1" % (i % 3, i % 5)) for i in range(12)],
        "doc_id bigint, source string, text string",
    )
    one = domain_reweight(docs).collect()
    assert len(one) == 1
    assert one[0]["excess_nll"] == 0.0 and one[0]["weight"] == 1.0
    mw = domain_reweight_mw(docs, epochs=2).collect()
    assert len(mw) == 1
    r = mw[0]
    assert r["excess_e1"] == 0.0 and r["excess_e2"] == 0.0
    assert r["weight_e1"] == 1.0 and r["weight"] == 1.0
