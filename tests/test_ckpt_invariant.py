"""ADVICE r14 #1 (medium): ckpt-mode session-cache release safety.

A ``_session_cache(mode="ckpt")`` frame is a localCheckpoint — releasing
its blocks truncates lineage IRRECOVERABLY, so any path that releases
entries and then re-executes the same DataFrame crashes. bench.py's
``_cold_noop`` retry for NON-eager cache-warm lines does exactly that
(release, then re-run the same plan) — safe only while no non-eager
line registers a ckpt entry. This test pins that invariant over the
whole registry: constructing every non-EAGER query must register zero
ckpt entries.
"""

from __future__ import annotations

import os

import pytest

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.mark.slow
def test_non_eager_queries_register_no_ckpt_entries(spark):
    from spark_skew_join_spark import queries as q
    from spark_skew_join_spark.operators import dedup as dd

    # bench builds every family in its own timed line BEFORE the
    # consumer lines run, so family-build ckpt registrations are never
    # attributed to (or released by) a consumer line — mirror that
    # order here, otherwise the first consumer constructed triggers
    # the family build and inherits its ckpt entries
    for fam in q.FAMILY_CONSUMERS:
        q.build_family(fam, spark, SF_DIR)
    bad = []
    for name, fn in q.QUERIES.items():
        if name in q.EAGER_QUERIES:
            continue
        snap = dd.cache_snapshot()
        ck = dd.ckpt_snapshot()
        fn(spark, SF_DIR)  # construction only — non-eager lines are lazy
        if dd.ckpt_entries_since(ck):
            bad.append(name)
        dd.release_entries(*dd.entries_since(snap))
    for fam in q.FAMILY_CONSUMERS:
        q.release_family(fam)
    q.clear_dedup_cache()
    assert not bad, (
        "non-EAGER queries registered ckpt session-cache entries — "
        "bench.py's _cold_noop retry would re-execute a released "
        f"localCheckpoint: {bad}"
    )


def test_release_df_unpersists_checkpoint_blocks(spark):
    """_release_df on a ckpt entry drops the wrapped RDD's blocks (the
    r14 mechanism) — re-collecting the released frame is NOT supported;
    this documents the one-way contract the invariant above protects."""
    from spark_skew_join_spark.operators import dedup as dd

    df = spark.range(0, 10).toDF("x")
    ck = dd._session_cache(df, mode="ckpt")
    assert ck.collect()  # consumable before release
    jrdd = ck._jdf.queryExecution().analyzed().rdd()
    assert jrdd.getStorageLevel().useMemory()
    dd._release_df(ck)
    assert not jrdd.getStorageLevel().useMemory()
