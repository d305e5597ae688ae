"""Tests for the round-4 pipeline-scale operators: hashed prefilter join,
Misra-Gries heavy hitters, contamination check, shard export."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import Row, functions as F

from spark_skew_join_spark.operators.contamination import (
    contamination_report,
    token_ngrams,
)
from spark_skew_join_spark.operators.heavy import heavy_hitters
from spark_skew_join_spark.operators.prefilter import prefilter_fact, prefiltered_join
from spark_skew_join_spark.operators.sampling import shard_id, write_sharded
from spark_skew_join_spark.testing import assert_df_equal


@pytest.fixture(scope="module")
def fact_dim(spark):
    fact = spark.createDataFrame(
        [Row(k=i % 100, payload=i) for i in range(5000)]
    )
    dim = spark.createDataFrame(
        [Row(k=i, name=f"d{i}") for i in range(0, 100, 7)]  # selective: 15/100 keys
    )
    return fact, dim


def test_prefiltered_join_equals_plain_join(fact_dim):
    fact, dim = fact_dim
    got = prefiltered_join(fact, dim, [("k", "k")])
    want = fact.join(dim.withColumnRenamed("k", "dk"), F.col("k") == F.col("dk")).drop(
        "dk"
    )
    assert_df_equal(got, want)


def test_prefilter_fact_is_superset_and_prunes(fact_dim):
    fact, dim = fact_dim
    filtered = prefilter_fact(fact, dim, [("k", "k")], bits=1 << 16, n_seeds=2)
    matching = fact.join(dim.select("k").distinct(), "k", "left_semi")
    n_match, n_filtered, n_fact = matching.count(), filtered.count(), fact.count()
    # superset of true matches, strictly smaller than the unfiltered fact
    assert n_match <= n_filtered < n_fact
    # with 15 keys in 2^16 buckets and 2 seeds, false positives ≈ 0 here
    assert n_filtered == n_match


def test_prefiltered_join_rejects_outer():
    with pytest.raises(ValueError, match="inner/semi"):
        prefiltered_join(None, None, [("k", "k")], how="left")


def test_heavy_hitters_exact_under_mg_pruning(spark):
    # 3 genuinely hot keys + a long uniform tail; k small enough that every
    # partition prunes (forces the MG subtraction path)
    rows = (
        [Row(k="hot1")] * 600
        + [Row(k="hot2")] * 400
        + [Row(k="hot3")] * 300
        + [Row(k=f"t{i % 500}") for i in range(2000)]
    )
    df = spark.createDataFrame(rows).repartition(8)
    phi = 0.06  # threshold = ceil(0.06 * 3300) = 198
    got = {r["k"]: r["n_rows"] for r in heavy_hitters(df, ["k"], phi=phi, k=32).collect()}
    total = len(rows)
    thr = math.ceil(phi * total)
    want = {
        r["k"]: r["count"]
        for r in df.groupBy("k").count().where(F.col("count") >= thr).collect()
    }
    assert want == {"hot1": 600, "hot2": 400, "hot3": 300}
    assert got == want


def test_heavy_hitters_exact_with_per_batch_compress(spark):
    """ADVICE r3: the MG summary compresses whenever the counter dict
    exceeds 4k (bounded memory), not just at partition end. Force many
    small Arrow batches so several compressions fire per partition and
    check the output is still exactly GROUP BY/HAVING."""
    rows = (
        [Row(k="hot1")] * 900
        + [Row(k="hot2")] * 500
        + [Row(k=f"t{i}") for i in range(3000)]  # 3000 singleton keys
    )
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "100")
    try:
        df = spark.createDataFrame(rows).repartition(4)
        phi, k = 0.1, 16  # 4k = 64 < distinct/batch at 100-row batches
        got = {
            r["k"]: r["n_rows"]
            for r in heavy_hitters(df, ["k"], phi=phi, k=k).collect()
        }
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)
    thr = math.ceil(phi * len(rows))
    want = {
        r["k"]: r["count"]
        for r in df.groupBy("k").count().where(F.col("count") >= thr).collect()
    }
    assert want == {"hot1": 900, "hot2": 500}
    assert got == want


def test_heavy_hitters_multi_col_and_guard(spark):
    df = spark.createDataFrame(
        [Row(a=1, b="x")] * 50 + [Row(a=i, b="y") for i in range(40)]
    )
    got = heavy_hitters(df, ["a", "b"], phi=0.5, k=8).collect()
    assert [(r["a"], r["b"], r["n_rows"]) for r in got] == [(1, "x", 50)]
    with pytest.raises(ValueError, match="must exceed"):
        heavy_hitters(df, ["a"], phi=0.001, k=10)


def test_token_ngrams_short_docs_excluded(spark):
    df = spark.createDataFrame(
        [Row(doc_id=1, text="a b c d"), Row(doc_id=2, text="a b")]
    )
    got = token_ngrams(df, n=3).collect()
    assert sorted((r["doc_id"], r["gram"]) for r in got) == [
        (1, "a b c"),
        (1, "b c d"),
    ]


def test_contamination_report_counts(spark):
    bench = spark.createDataFrame([Row(doc_id=100, text="q w e r t y u i")])
    corpus = spark.createDataFrame(
        [
            # contains the benchmark 3-gram "q w e" and "w e r"
            Row(doc_id=1, text="x q w e r z z z"),
            Row(doc_id=2, text="no overlap here at all friend"),
        ]
    )
    got = {r["doc_id"]: r for r in contamination_report(corpus, bench, n=3).collect()}
    assert list(got) == [1]
    assert got[1]["n_hits"] == 2  # "q w e", "w e r"
    assert got[1]["n_grams"] == 6
    assert abs(got[1]["contamination"] - 2 / 6) < 1e-12


def test_contamination_broadcast_guard_falls_back_to_shuffle(spark):
    """VERDICT r3 #7: an over-cap benchmark gram set must not be force-
    broadcast — the semi-join falls back to a shuffle join, with identical
    results."""
    from pyspark.sql import functions as F

    # 60 benchmark docs x ~13 grams each -> well over a cap of 100
    bench = spark.createDataFrame(
        [Row(doc_id=i, text=" ".join(f"t{i}_{j}" for j in range(16))) for i in range(60)]
    )
    corpus = spark.createDataFrame(
        [
            Row(doc_id=1, text=" ".join(f"t7_{j}" for j in range(16))),  # = bench doc 7
            Row(doc_id=2, text="clean words only nothing shared here at all"),
        ]
    )
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        guarded = contamination_report(corpus, bench, n=3, max_broadcast_grams=100)
        forced = contamination_report(corpus, bench, n=3, max_broadcast_grams=None)
        plan = guarded._jdf.queryExecution().executedPlan().toString()
        # with auto-broadcast off and no hint, the over-cap semi join must
        # not be a broadcast join (the per-doc count joins don't broadcast
        # either under this conf, so the whole plan is broadcast-free)
        assert "BroadcastHashJoin" not in plan, plan
        g = {r["doc_id"]: r for r in guarded.collect()}
        f_ = {r["doc_id"]: r for r in forced.collect()}
        assert list(g) == [1] and list(f_) == [1]
        assert g[1]["n_hits"] == f_[1]["n_hits"] == 14
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_quota_sample_caps_and_is_deterministic(spark):
    from spark_skew_join_spark.operators.sampling import quota_sample

    df = spark.createDataFrame(
        [Row(g="big", i=i) for i in range(100)] + [Row(g="small", i=i) for i in range(3)]
    )
    kept = quota_sample(df, "g", "i", cap=5)
    by_g = {r["g"]: r["count"] for r in kept.groupBy("g").count().collect()}
    assert by_g == {"big": 5, "small": 3}
    # deterministic: same members on a differently-partitioned input
    a = sorted((r["g"], r["i"]) for r in kept.collect())
    b = sorted(
        (r["g"], r["i"])
        for r in quota_sample(df.repartition(7), "g", "i", cap=5).collect()
    )
    assert a == b


def test_shard_id_deterministic_and_bounded(spark):
    df = spark.createDataFrame([Row(doc_id=i) for i in range(1000)])
    shards = df.select(shard_id("doc_id", 16).alias("s")).groupBy("s").count()
    rows = {r["s"]: r["count"] for r in shards.collect()}
    assert set(rows) <= set(range(16))
    assert sum(rows.values()) == 1000
    # deterministic: same assignment on recompute
    again = {r["s"]: r["count"] for r in shards.collect()}
    assert rows == again
    with pytest.raises(ValueError):
        shard_id("doc_id", 1000)


def test_write_sharded_layout(spark, tmp_path):
    df = spark.createDataFrame([Row(doc_id=i, v=str(i)) for i in range(500)])
    out = str(tmp_path / "shards")
    write_sharded(df, out, "doc_id", n_shards=8)
    back = spark.read.parquet(out)
    assert back.count() == 500
    # shard column survives as partition dir and matches the assignment expr
    mismatch = back.where(
        F.col("shard").cast("int") != shard_id("doc_id", 8)
    ).count()
    assert mismatch == 0
