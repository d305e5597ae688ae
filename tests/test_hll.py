"""HyperLogLog accuracy, merge associativity, and the Spark build path."""

from __future__ import annotations

import numpy as np
import pytest

from spark_skew_join_spark.sketch.hll import HyperLogLog, hll_from_dataframe


def _hashes(n, seed):
    rng = np.random.default_rng(seed)
    return rng.integers(-(2**63), 2**63 - 1, size=n, dtype=np.int64)


def test_hll_estimate_within_3sigma():
    # p=14 → rsd ≈ 0.81%; 3 sigma ≈ 2.5%
    for n, seed in ((1_000, 1), (50_000, 2), (500_000, 3)):
        h = HyperLogLog(14)
        h.add_hashed(_hashes(n, seed))
        assert abs(h.estimate() - n) / n < 0.025, (n, h.estimate())


def test_hll_merge_equals_single_build():
    all_h = _hashes(80_000, 7)
    whole = HyperLogLog(12)
    whole.add_hashed(all_h)
    acc = HyperLogLog(12)
    for part in np.array_split(all_h, 5):
        piece = HyperLogLog(12)
        piece.add_hashed(part)
        acc = acc.merge(piece)
    assert np.array_equal(acc.registers, whole.registers)
    # duplicates never move the estimate (max is idempotent)
    again = acc.merge(whole)
    assert np.array_equal(again.registers, whole.registers)


def test_hll_rejects_mismatched_p():
    with pytest.raises(ValueError):
        HyperLogLog(10).merge(HyperLogLog(11))
    with pytest.raises(ValueError):
        HyperLogLog(3)


def test_hll_spark_build_matches_exact(spark):
    from pyspark.sql import functions as F

    from spark_skew_join_spark.sources.tables import load_tables

    li = load_tables(spark, "/root/testdata/sf0.001")["lineitem"]
    exact = li.agg(F.countDistinct("l_orderkey", "l_linenumber")).collect()[0][0]
    est = hll_from_dataframe(li, ["l_orderkey", "l_linenumber"]).estimate()
    assert abs(est - exact) / exact < 0.025, (est, exact)


def test_per_source_merge_equals_whole_corpus_build(spark):
    """Mergeability is EXACT, not approximate: max-merging per-group
    sketches yields bit-identical registers to one whole-corpus build
    (same hashes, same max fold) — the property hll_union_sources
    showcases as a query."""
    import numpy as np

    from spark_skew_join_spark.sketch.hll import HyperLogLog, hll_from_dataframe

    df = spark.range(30_000).selectExpr(
        "CAST(id % 3 AS STRING) AS grp", "CAST(id % 7919 AS STRING) AS k"
    )
    whole = hll_from_dataframe(df, ["k"])
    merged = HyperLogLog(14)
    for g in ("0", "1", "2"):
        merged = merged.merge(
            hll_from_dataframe(df.where(f"grp = '{g}'"), ["k"])
        )
    assert np.array_equal(whole.registers, merged.registers)
    assert whole.estimate() == merged.estimate()


def test_hll_by_group_matches_per_group_builds(spark):
    """Grouped two-level fold (ADVICE r5 #4): hll_by_group must produce
    bit-identical registers to separate whole-group builds — partition
    slicing changes WHERE rows fold, never the max-merge result."""
    import numpy as np

    from spark_skew_join_spark.sketch.hll import hll_by_group, hll_from_dataframe

    df = spark.range(30_000).selectExpr(
        "CAST(id % 3 AS STRING) AS grp", "CAST(id % 7919 AS STRING) AS k"
    ).repartition(11)  # groups straddle partitions
    grouped = hll_by_group(df, "grp", ["k"])
    assert sorted(grouped) == ["0", "1", "2"]
    for g in ("0", "1", "2"):
        solo = hll_from_dataframe(df.where(f"grp = '{g}'"), ["k"])
        assert np.array_equal(grouped[g].registers, solo.registers)


def test_hll_by_group_null_group_not_dropped(spark):
    """ADVICE r6 #2: rows whose group is NULL must form their own group
    under key None (pandas groupby default dropna=True used to discard
    them), and the tag must not collide with real values 'n'/'v...'."""
    from spark_skew_join_spark.sketch.hll import hll_by_group, hll_from_dataframe

    df = spark.createDataFrame(
        [(None, str(i)) for i in range(400)]
        + [("n", str(i)) for i in range(100)]
        + [("va", str(i)) for i in range(50)],
        "grp string, k string",
    )
    grouped = hll_by_group(df, "grp", ["k"])
    assert set(grouped) == {None, "n", "va"}
    solo = hll_from_dataframe(df.where("grp IS NULL"), ["k"])
    assert np.array_equal(grouped[None].registers, solo.registers)


def test_md5_mode_registers_match_python_replay(spark):
    """hash_bits=60 (md5-compat): registers must equal a driver-side
    replay of index/rank from the same md5-derived 60-bit values — the
    property the SQL oracle relies on."""
    import hashlib

    from spark_skew_join_spark.sketch.hll import HyperLogLog, hll_from_dataframe

    vals = [str(v) for v in range(3000)]
    df = spark.createDataFrame([(v,) for v in vals], "k string")
    sk = hll_from_dataframe(df, ["k"], p=10, hash_fn="md5")
    assert sk.hash_bits == 60

    expect = HyperLogLog(10, 60)
    import numpy as np

    hs = np.array(
        [int(hashlib.md5(v.encode()).hexdigest()[:15], 16) for v in vals],
        dtype=np.uint64,
    )
    expect.add_hashed(hs)
    assert np.array_equal(sk.registers, expect.registers)
    # rank arithmetic replay (what the SQL does with bin()/length)
    p = 10
    regs = {}
    for h in map(int, hs):
        idx = h >> (60 - p)
        tail = h & ((1 << (60 - p)) - 1)
        rank = (60 - p) + 1 if tail == 0 else (60 - p) - tail.bit_length() + 1
        regs[idx] = max(regs.get(idx, 0), rank)
    for i, r in regs.items():
        assert sk.registers[i] == r
    # estimate within the p=10 envelope
    assert abs(sk.estimate() - 3000) / 3000 < 0.11


def test_md5_mode_merge_guard(spark):
    import pytest

    from spark_skew_join_spark.sketch.hll import HyperLogLog

    with pytest.raises(ValueError, match="hash_bits"):
        HyperLogLog(14, 60).merge(HyperLogLog(14, 64))
    with pytest.raises(ValueError):
        HyperLogLog(14, 61)


def test_hll_pickle_version_guard():
    """ADVICE r8 #2: the pickle carries the hash-space version (the
    bloom.py pattern); a legacy blob built from the pre-seed hash space
    must be rejected at load, never silently merged."""
    import pickle

    from spark_skew_join_spark.sketch.hll import _FORMAT_VERSION, _rebuild_hll

    h = HyperLogLog(8)
    h.add_hashed(_hashes(1_000, seed=7))
    rt = pickle.loads(pickle.dumps(h))
    assert (rt.p, rt.hash_bits) == (h.p, h.hash_bits)
    assert (rt.registers == h.registers).all()
    with pytest.raises(ValueError, match="hash seed/space"):
        _rebuild_hll(h.p, h.registers, h.hash_bits, _FORMAT_VERSION - 1)
