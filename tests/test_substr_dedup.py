"""Planted-duplicate recall + offset-exactness tests for the
exact-substring dedup pass (operators/substr_dedup.py)."""

import random

import pytest

from spark_skew_join_spark.operators.substr_dedup import (
    exact_substring_runs,
    token_windows,
)

VOCAB = [f"w{i:03d}" for i in range(400)]


def _rand_tokens(rng, n):
    return [rng.choice(VOCAB) for _ in range(n)]


def _make_corpus(rng, n_docs=40, planted_pairs=6, plant_len=60):
    """Random-token docs with `planted_pairs` pairs sharing an exact
    `plant_len`-token run at independent random offsets."""
    docs, plants = [], []
    for i in range(n_docs):
        docs.append(_rand_tokens(rng, rng.randint(120, 200)))
    for p in range(planted_pairs):
        a, b = 2 * p, 2 * p + 1
        run = _rand_tokens(rng, plant_len)
        off_a = rng.randint(0, len(docs[a]) - plant_len)
        off_b = rng.randint(0, len(docs[b]) - plant_len)
        docs[a][off_a:off_a + plant_len] = run
        docs[b][off_b:off_b + plant_len] = run
        plants.append((a, b, off_a, off_b))
    rows = [(i, " ".join(t)) for i, t in enumerate(docs)]
    return rows, plants


def test_planted_runs_all_recalled_with_offsets(spark):
    rng = random.Random(7)
    rows, plants = _make_corpus(rng)
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = exact_substring_runs(df, k=16, min_tokens=32).collect()
    found = {(r["doc_a"], r["doc_b"]): r for r in out}
    texts = dict(rows)
    for a, b, off_a, off_b in plants:
        key = (min(a, b), max(a, b))
        assert key in found, f"planted pair {key} missed"
        r = found[key]
        # detected span sits inside the plant, grid slack < k each side
        assert off_a <= r["a_start_tok"] < off_a + 16
        assert r["n_tokens"] >= 60 - 2 * 15
        assert r["b_start_tok"] - off_b == r["a_start_tok"] - off_a
        # char offsets are exact: the two substrings are identical
        sa = texts[r["doc_a"]][r["a_start_char"]:r["a_start_char"] + r["n_chars"]]
        sb = texts[r["doc_b"]][r["b_start_char"]:r["b_start_char"] + r["n_chars"]]
        assert sa == sb and len(sa) == r["n_chars"]
    # no spurious pairs beyond the planted ones (random 400-word vocab
    # cannot produce a 32-token exact run by chance)
    assert set(found) == {(min(a, b), max(a, b)) for a, b, *_ in plants}


def test_run_merge_spans_whole_plant_on_grid(spark):
    """A plant aligned to doc_a's grid is recovered at FULL length."""
    rng = random.Random(11)
    run = _rand_tokens(rng, 64)
    a = run + _rand_tokens(rng, 40)           # plant at pos 0 (grid-aligned)
    b = _rand_tokens(rng, 23) + run + _rand_tokens(rng, 30)
    df = spark.createDataFrame(
        [(0, " ".join(a)), (1, " ".join(b))], "doc_id long, text string"
    )
    [r] = exact_substring_runs(df, k=16, min_tokens=32).collect()
    assert (r["a_start_tok"], r["b_start_tok"], r["n_tokens"]) == (0, 23, 64)


def test_min_tokens_must_exceed_k(spark):
    df = spark.createDataFrame([(0, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError, match="min_tokens"):
        exact_substring_runs(df, k=16, min_tokens=16)


def test_max_window_df_drops_boilerplate_windows(spark):
    """A window shared by every doc is excluded from seeding when capped,
    so pure-boilerplate pairs disappear while real plants survive."""
    rng = random.Random(3)
    boiler = _rand_tokens(rng, 40)
    docs = [(i, " ".join(boiler + _rand_tokens(rng, 80))) for i in range(10)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    dense = exact_substring_runs(df, k=16, min_tokens=32)
    capped = exact_substring_runs(df, k=16, min_tokens=32, max_window_df=5)
    assert dense.count() == 45          # all C(10,2) pairs share the header
    assert capped.count() == 0


def test_token_windows_counts(spark):
    df = spark.createDataFrame(
        [(0, " ".join(f"t{i}" for i in range(20))), (1, "a b")],
        "doc_id long, text string",
    )
    w = token_windows(df, k=16).collect()
    assert len(w) == 5                  # 20-16+1 windows; short doc skipped
    assert {r["doc_id"] for r in w} == {0}


def test_remove_duplicate_spans_cuts_larger_id_copy(spark):
    from spark_skew_join_spark.operators.substr_dedup import (
        exact_substring_runs,
        remove_duplicate_spans,
    )

    rng = random.Random(21)
    run = _rand_tokens(rng, 48)
    a = _rand_tokens(rng, 30) + run + _rand_tokens(rng, 25)
    b = _rand_tokens(rng, 10) + run + _rand_tokens(rng, 40)
    c = _rand_tokens(rng, 50)  # untouched bystander
    df = spark.createDataFrame(
        [(0, " ".join(a)), (1, " ".join(b)), (2, " ".join(c))],
        "doc_id long, text string",
    )
    runs = exact_substring_runs(df, k=16, min_tokens=32)
    out = {r["doc_id"]: r for r in
           remove_duplicate_spans(df, runs=runs).collect()}
    # doc 0 (smaller id) keeps its copy; doc 2 untouched
    assert out[0]["n_removed"] == 0 and out[0]["clean_text"] == " ".join(a)
    assert out[2]["n_removed"] == 0 and out[2]["clean_text"] == " ".join(c)
    # doc 1 loses exactly the detected span's tokens, in place
    [span] = [r for r in runs.collect()]
    exp_kept = b[:span["b_start_tok"]] + b[span["b_start_tok"] + span["n_tokens"]:]
    assert out[1]["n_removed"] == span["n_tokens"]
    assert out[1]["clean_text"] == " ".join(exp_kept)


def test_remove_duplicate_spans_full_duplicate_empties_doc(spark):
    rng = random.Random(2)
    run = _rand_tokens(rng, 64)
    df = spark.createDataFrame(
        [(0, " ".join(run + _rand_tokens(rng, 20))), (1, " ".join(run))],
        "doc_id long, text string",
    )
    from spark_skew_join_spark.operators.substr_dedup import (
        remove_duplicate_spans,
    )

    out = {r["doc_id"]: r for r in remove_duplicate_spans(df).collect()}
    assert out[1]["clean_text"] == "" and out[1]["n_removed"] == 64
    assert out[0]["n_removed"] == 0
