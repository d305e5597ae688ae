"""Property-based invariants for the MERGE / snapshot-diff pair.

Random target/changeset shapes assert the algebra the fixed fixtures
can't: MERGE idempotence, key conservation, and the round-trip law
diff(old, merge(old, src)) ≡ the changeset's own classification.
max_examples tiny — every example runs Spark jobs.
"""

from __future__ import annotations

import random

from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from spark_skew_join_spark.operators.merge import merge_upsert, snapshot_diff
import pytest

_SETTINGS = dict(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
    derandomize=True,
)


def _tables(spark, seed):
    rng = random.Random(seed)
    n_target, keyspace = 300, 120
    target_keys = rng.sample(range(keyspace), k=min(n_target, keyspace))
    target = spark.createDataFrame(
        [(k, float(rng.randint(0, 5))) for k in target_keys],
        "k bigint, v double",
    )
    # changeset: some overlapping keys (updates), some fresh (inserts),
    # and some updates that set the SAME value (must classify unchanged)
    src_rows = []
    for k in rng.sample(target_keys, k=len(target_keys) // 3):
        src_rows.append((k, float(rng.randint(0, 5))))
    for k in range(keyspace, keyspace + 30):
        if rng.random() < 0.5:
            src_rows.append((k, float(rng.randint(0, 5))))
    source = spark.createDataFrame(src_rows, "k bigint, v double")
    return target, source


@given(seed=st.integers(0, 9))
@settings(**_SETTINGS)
@pytest.mark.slow
def test_merge_idempotent_and_conserves_keys(spark, seed):
    target, source = _tables(spark, seed)
    once = merge_upsert(target, source, ["k"])
    twice = merge_upsert(once, source, ["k"])
    assert sorted(once.collect()) == sorted(twice.collect())
    got_keys = {r.k for r in once.select("k").collect()}
    want_keys = {r.k for r in target.select("k").collect()} | {
        r.k for r in source.select("k").collect()
    }
    assert got_keys == want_keys


@given(seed=st.integers(0, 9))
@settings(**_SETTINGS)
def test_diff_of_merge_recovers_changeset(spark, seed):
    target, source = _tables(spark, seed)
    merged = merge_upsert(target, source, ["k"])
    d = snapshot_diff(target, merged, ["k"], ["v"])
    classes = {r.k: r.change_type for r in d.collect()}
    tgt = {r.k: r.v for r in target.collect()}
    src = {r.k: r.v for r in source.collect()}
    for k, ct in classes.items():
        if k in src and k not in tgt:
            assert ct == "inserted", (k, ct)
        elif k in src and src[k] != tgt[k]:
            assert ct == "updated", (k, ct)
        else:
            # untouched target rows AND same-value updates
            assert ct == "unchanged", (k, ct)
    assert set(classes) == set(tgt) | set(src)  # no deletes from a merge
