"""Bloom filter sketch: no false negatives, fp envelope, exact
mergeability (bitwise OR), and the broadcast prefilter's two sides."""

from __future__ import annotations

import numpy as np
import pytest

from spark_skew_join_spark.sketch.bloom import (
    BloomFilter,
    bloom_from_dataframe,
    bloom_prefilter,
)


def _hashes(spark, values):
    """(h1, h2) numpy arrays for ``values`` via the SAME JVM xxhash64
    path the distributed build uses."""
    from pyspark.sql import functions as F

    from spark_skew_join_spark.sketch.bloom import _SEED1, _SEED2
    from spark_skew_join_spark.sketch.cms import spark_key_expr

    df = spark.createDataFrame([(v,) for v in values], "k bigint").select(
        F.xxhash64(spark_key_expr(["k"]), F.lit(_SEED1)).alias("h1"),
        F.xxhash64(spark_key_expr(["k"]), F.lit(_SEED2)).alias("h2"),
    )
    pdf = df.toPandas()
    return pdf["h1"].to_numpy(), pdf["h2"].to_numpy()


def test_no_false_negatives_and_fp_bound(spark):
    keys = list(range(20_000))
    df = spark.createDataFrame([(k,) for k in keys], "k bigint")
    bloom = bloom_from_dataframe(df, ["k"], m_bits=1 << 18, k=5)
    h1, h2 = _hashes(spark, keys)
    assert bloom.contains_hashed(h1, h2).all(), "false negative"
    # disjoint probe keys: observed fp within 2x the analytic envelope
    probe = list(range(100_000, 140_000))
    p1, p2 = _hashes(spark, probe)
    fp = float(bloom.contains_hashed(p1, p2).mean())
    assert fp <= 2.0 * bloom.fp_bound(len(keys)) + 1e-3


def test_merge_equals_oneshot_bit_for_bit(spark):
    df = spark.createDataFrame([(k,) for k in range(10_000)], "k bigint")
    left = bloom_from_dataframe(df.where("k % 2 = 0"), ["k"])
    right = bloom_from_dataframe(df.where("k % 2 = 1"), ["k"])
    oneshot = bloom_from_dataframe(df, ["k"])
    assert (left.merge(right).bits == oneshot.bits).all()


def test_merge_param_mismatch_rejected():
    with pytest.raises(ValueError):
        BloomFilter(1 << 10, 3).merge(BloomFilter(1 << 12, 3))


def test_prefilter_sides(spark):
    inserted = spark.createDataFrame([(k,) for k in range(5_000)], "k bigint")
    bloom = bloom_from_dataframe(inserted, ["k"])
    probe = spark.createDataFrame(
        [(k,) for k in range(2_500, 9_000)], "k bigint"
    )
    member = bloom_prefilter(probe, bloom, ["k"], keep="member")
    non_member = bloom_prefilter(probe, bloom, ["k"], keep="non_member")
    member_keys = {r["k"] for r in member.collect()}
    non_member_keys = {r["k"] for r in non_member.collect()}
    # partition of the probe set
    assert member_keys | non_member_keys == set(range(2_500, 9_000))
    assert not (member_keys & non_member_keys)
    # one-sided guarantees: every inserted key claimed member; every
    # claimed non-member genuinely uninserted
    assert set(range(2_500, 5_000)) <= member_keys
    assert non_member_keys.isdisjoint(range(2_500, 5_000))


def test_positions_match_numpy_reference():
    """Kirsch-Mitzenmacher probe derivation pinned against a direct
    uint64 computation (overflow semantics are the subtle part)."""
    bloom = BloomFilter(1 << 16, 4)
    h1 = np.array([-5, 123456789, 2**63 - 1], dtype=np.int64)
    h2 = np.array([7, -987654321, -1], dtype=np.int64)
    got = bloom._positions(h1, h2)
    for r, (a, b) in enumerate(zip(h1, h2)):
        ua, ub = np.uint64(a).item(), np.uint64(b).item()
        for i in range(4):
            assert got[r, i] == (ua + i * ub) % (2**64) % bloom.m


def test_positions_even_stride_forced_odd():
    """ADVICE r6 #4: with m a power of two an even h2 collapses probe
    positions (worst case h2 % m == 0 puts all k probes on one bit).
    The stride is forced odd (h2 | 1) so the k probes stay distinct."""
    bloom = BloomFilter(1 << 16, 4)
    h1 = np.array([12345], dtype=np.int64)
    h2 = np.array([1 << 16], dtype=np.int64)  # h2 % m == 0, worst case
    got = bloom._positions(h1, h2)
    assert len(set(got[0].tolist())) == 4  # all probes distinct
    ua, ub = np.uint64(12345).item(), (np.uint64(1 << 16) | np.uint64(1)).item()
    for i in range(4):
        assert got[0, i] == (ua + i * ub) % (2**64) % bloom.m


def test_pickle_format_versioned():
    """ADVICE r7 #5: the pickle carries the probe-layout version; a
    blob from a different layout must be rejected, not silently probed."""
    import pickle

    import pytest

    from spark_skew_join_spark.sketch.bloom import (
        BloomFilter, _FORMAT_VERSION, _rebuild_bloom,
    )

    b = BloomFilter(1 << 10, 3)
    rt = pickle.loads(pickle.dumps(b))
    assert (rt.m, rt.k) == (b.m, b.k)
    with pytest.raises(ValueError, match="probe layout"):
        _rebuild_bloom(b.m, b.k, b.bits, _FORMAT_VERSION - 1)


def test_hash_fn_recorded_and_enforced(spark):
    """ADVICE r8 #1: the filter records which hash built it; merging or
    probing across hash functions is rejected, and bloom_prefilter
    derives its probe hashes from the record so a caller can't void the
    no-false-negative guarantee with a mismatched parameter."""
    import pickle

    df = spark.createDataFrame([(k,) for k in range(2_000)], "k bigint")
    md5f = bloom_from_dataframe(df, ["k"], hash_fn="md5")
    assert md5f.hash_fn == "md5"
    assert pickle.loads(pickle.dumps(md5f)).hash_fn == "md5"
    with pytest.raises(ValueError, match="hash_fn"):
        md5f.merge(bloom_from_dataframe(df, ["k"]))  # xxhash64 default
    with pytest.raises(ValueError, match="no-false-negative"):
        bloom_prefilter(df, md5f, ["k"], hash_fn="xxhash64")
    # derived probing (no hash_fn argument): every inserted key claimed
    kept = {r["k"] for r in bloom_prefilter(df, md5f, ["k"]).collect()}
    assert kept == set(range(2_000))
    # explicitly passing the MATCHING hash_fn still works
    same = bloom_prefilter(df, md5f, ["k"], hash_fn="md5")
    assert {r["k"] for r in same.collect()} == set(range(2_000))
