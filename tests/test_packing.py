"""Training-mix operators (operators/packing.py): temperature sampling
determinism + mixture math, greedy sequence-packing invariants."""

import pytest
from pyspark.sql import functions as F

from spark_skew_join_spark.operators.packing import (
    sequence_packing,
    temperature_mix,
)


def _docs(spark, sizes):
    """sizes: dict source -> n docs (10..39 tokens each, deterministic)."""
    rows, i = [], 0
    for src, n in sizes.items():
        for _ in range(n):
            rows.append((i, src, " ".join(["t"] * (10 + i % 30))))
            i += 1
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


def test_temperature_flattens_mixture(spark):
    df = _docs(spark, {"big": 400, "small": 25})
    nat = temperature_mix(df, alpha=1.0, total=100)
    flat = temperature_mix(df, alpha=0.0, total=100)
    mid = temperature_mix(df, alpha=0.5, total=100)

    def share(out, src):
        return out.where(F.col("source") == src).count()

    # alpha=1 ~ natural share; alpha=0 ~ uniform (capped by availability)
    assert share(nat, "small") <= 10
    assert share(flat, "small") == 25  # wants 50, capped at the 25 available
    assert share(nat, "small") < share(mid, "small") <= share(flat, "small")


def test_temperature_mix_deterministic_and_capped(spark):
    df = _docs(spark, {"a": 30, "b": 60})
    one = {r["doc_id"] for r in temperature_mix(df, 0.5, 40).collect()}
    two = {r["doc_id"] for r in
           temperature_mix(df.repartition(7), 0.5, 40).collect()}
    assert one == two  # hash-rank membership is partitioning-independent
    out = temperature_mix(df, 0.5, 10_000)
    # target capped at availability: never oversamples a source
    assert out.count() == 90
    with pytest.raises(ValueError, match="alpha"):
        temperature_mix(df, 1.5, 10)


def test_sequence_packing_invariants(spark):
    df = _docs(spark, {"x": 40, "y": 17})
    out = sequence_packing(df, capacity=64, group_col="source")
    rows = out.collect()
    assert len(rows) == 57
    # no bin overflows; offsets are consistent with in-bin order
    by_bin = {}
    for r in rows:
        by_bin.setdefault((r["source"], r["bin_id"]), []).append(r)
    for (_, _), members in by_bin.items():
        members.sort(key=lambda r: r["bin_offset"])
        pos = 0
        for m in members:
            assert m["bin_offset"] == pos
            pos += m["n_tokens"]
        assert pos <= 64
    # bins are dense (0..max) per group
    for src in ("x", "y"):
        bins = sorted({r["bin_id"] for r in rows if r["source"] == src})
        assert bins == list(range(len(bins)))


def test_sequence_packing_string_doc_ids(spark):
    """ADVICE r5 #3 regression: a non-bigint id_col (string doc ids,
    as streaming_funnel supports) must pack — the accumulator schema
    derives the id field's type from the input instead of hard-coding
    long."""
    rows = [("d-a", " ".join(["t"] * 30)), ("d-b", " ".join(["t"] * 30)),
            ("d-c", " ".join(["t"] * 30))]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    out = {r["doc_id"]: r for r in
           sequence_packing(df, capacity=64).collect()}
    assert out["d-a"]["bin_id"] == 0 and out["d-b"]["bin_id"] == 0
    assert out["d-c"]["bin_id"] == 1 and out["d-c"]["bin_offset"] == 0


def test_sequence_packing_oversized_doc_gets_own_bin(spark):
    rows = [
        (0, " ".join(["t"] * 10)),
        (1, " ".join(["t"] * 100)),  # exceeds capacity
        (2, " ".join(["t"] * 10)),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in
           sequence_packing(df, capacity=64).collect()}
    assert out[0]["bin_id"] == 0
    assert out[1]["bin_id"] == 1 and out[1]["bin_offset"] == 0
    assert out[2]["bin_id"] == 2
    with pytest.raises(ValueError, match="capacity"):
        sequence_packing(df, capacity=0)


from hypothesis import HealthCheck, given, settings, strategies as st  # noqa: E402


def _greedy_reference(sizes, capacity):
    """Pure-Python greedy packing: (bin_id, bin_offset) per doc in order."""
    out, bin_id, offset = [], 0, 0
    for i, n in enumerate(sizes):
        if i > 0 and offset + n > capacity:
            bin_id, offset = bin_id + 1, 0
        out.append((bin_id, offset))
        offset += n
    return out


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    sizes=st.lists(st.integers(min_value=1, max_value=90), min_size=1,
                   max_size=60),
    capacity=st.integers(min_value=32, max_value=128),
)
def test_packing_matches_python_reference(spark, sizes, capacity):
    rows = [(i, " ".join(["t"] * n)) for i, n in enumerate(sizes)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["bin_id"], r["bin_offset"])
        for r in sequence_packing(df, capacity=capacity).collect()
    }
    exp = dict(enumerate(_greedy_reference(sizes, capacity)))
    assert got == exp
