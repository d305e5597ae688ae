"""Incremental dedup (operators/incremental.py): store classification,
state-update closure, and the fuzzy new-vs-history increment."""

from pyspark.sql import functions as F

from spark_skew_join_spark.operators.incremental import (
    band_table,
    fingerprint_store,
    incremental_exact_dedup,
    incremental_minhash_dups,
)


def test_exact_increment_classifies_and_extends(spark):
    hist = spark.createDataFrame(
        [(0, "alpha"), (1, "beta"), (2, "alpha")],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [(10, "beta"), (11, "gamma"), (12, "gamma"), (13, "delta")],
        "doc_id long, text string",
    )
    store = fingerprint_store(hist)
    out = {r["doc_id"]: r for r in
           incremental_exact_dedup(new, store).collect()}
    # beta already in history -> rep 1; gamma dups within batch -> rep 11
    assert out[10]["hist_rep"] == 1 and not out[10]["is_new"]
    assert out[11]["hist_rep"] is None and out[11]["batch_rep"] == 11
    assert out[11]["is_new"] and not out[12]["is_new"]
    assert out[13]["is_new"]
    # state update closure: appending is_new rows then re-running the
    # batch classifies EVERYTHING as seen
    appended = store.unionByName(
        spark.createDataFrame(
            [(r["fp"], r["doc_id"]) for r in out.values() if r["is_new"]],
            store.schema,
        ).select("fp", "rep_id")
    )
    again = incremental_exact_dedup(new, appended)
    assert again.where("is_new").count() == 0


def test_minhash_increment_finds_cross_dups_only(spark):
    base = "the quick brown fox jumps over the lazy dog again and again"
    hist = spark.createDataFrame(
        [(0, base), (1, "completely unrelated text about spark engines")],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [(10, base + " tail"), (11, "another unrelated new document body")],
        "doc_id long, text string",
    )
    out = incremental_minhash_dups(new, hist, threshold=0.5, n=5).collect()
    assert {(r["hist_id"], r["new_id"]) for r in out} == {(0, 10)}
    [r] = out
    assert r["jaccard"] >= 0.5 and r["size_hist"] > 0 and r["size_new"] > 0


def test_minhash_increment_never_pairs_history_with_itself(spark):
    dup = "identical historical text shared by two history docs exactly"
    hist = spark.createDataFrame(
        [(0, dup), (1, dup)], "doc_id long, text string"
    )
    new = spark.createDataFrame(
        [(10, "fresh unrelated content only here")],
        "doc_id long, text string",
    )
    assert incremental_minhash_dups(new, hist, threshold=0.5).count() == 0


def test_persisted_band_table_is_reusable(spark):
    docs = spark.createDataFrame(
        [(0, "some historical document text body"),
         (1, "other historical text entirely")],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [(10, "some historical document text body plus")],
        "doc_id long, text string",
    )
    hb = band_table(docs)
    live = incremental_minhash_dups(new, docs, threshold=0.5)
    stored = incremental_minhash_dups(new, docs, threshold=0.5, hist_bands=hb)
    key = lambda df: {(r["hist_id"], r["new_id"], r["jaccard"])  # noqa: E731
                      for r in df.collect()}
    assert key(live) == key(stored) != set()


def test_hot_history_bucket_capped(spark):
    """A degenerate historical bucket (many identical docs) is dropped
    from banding when over the cap, bounding the fan-out."""
    boiler = "exact same boilerplate text in every historical document"
    hist = spark.createDataFrame(
        [(i, boiler) for i in range(20)], "doc_id long, text string"
    )
    new = spark.createDataFrame(
        [(100, boiler)], "doc_id long, text string"
    )
    uncapped = incremental_minhash_dups(new, hist, max_bucket_size=None)
    capped = incremental_minhash_dups(new, hist, max_bucket_size=5)
    assert uncapped.count() == 20
    assert capped.count() == 0  # entire bucket over cap -> skipped


from hypothesis import HealthCheck, given, settings, strategies as st  # noqa: E402

_TEXTS = [f"text body {i}" for i in range(8)]


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    hist=st.lists(st.sampled_from(_TEXTS), min_size=0, max_size=12),
    new=st.lists(st.sampled_from(_TEXTS), min_size=1, max_size=12),
)
def test_exact_increment_matches_python_reference(spark, hist, new):
    hist_rows = [(i, t) for i, t in enumerate(hist)]
    new_rows = [(100 + i, t) for i, t in enumerate(new)]
    hdf = spark.createDataFrame(hist_rows, "doc_id long, text string") \
        if hist_rows else spark.createDataFrame([], "doc_id long, text string")
    ndf = spark.createDataFrame(new_rows, "doc_id long, text string")
    got = {r["doc_id"]: (r["hist_rep"], r["batch_rep"], r["is_new"])
           for r in incremental_exact_dedup(
               ndf, fingerprint_store(hdf)).collect()}
    # python reference
    hist_min = {}
    for i, t in hist_rows:
        hist_min[t] = min(hist_min.get(t, i), i)
    batch_min = {}
    for i, t in new_rows:
        batch_min[t] = min(batch_min.get(t, i), i)
    for i, t in new_rows:
        hr = hist_min.get(t)
        exp = (hr, batch_min[t], hr is None and batch_min[t] == i)
        assert got[i] == exp, (i, t, got[i], exp)
