"""Perceptual-hash tests: dHash invariants, the pigeonhole banding
recall guarantee, exact Hamming verification, hot-bucket capping, and
the stub plumbing path."""

from __future__ import annotations

import random

import numpy as np
import pytest

from pyspark.sql import functions as F

from spark_skew_join_spark.operators.multimodal import (
    dhash64,
    dhash_images,
    encode_bmp,
    phash_near_dup,
)


def _img(seed: int, h: int = 16, w: int = 16) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.integers(0, 200, size=(h, w, 3), dtype=np.uint8)


def _hamming(a: int, b: int) -> int:
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


def test_dhash_monotonic_brightness_invariance():
    px = _img(1)
    assert dhash64(px) == dhash64(px + 10)  # no clipping below 210
    assert dhash64(px) == dhash64(px + 55)  # still ≤ 254


def test_dhash_single_pixel_flip_is_local():
    px = _img(2)
    v = px.copy()
    v[6, 7] = 255  # sampled grid point for 16x16 → 9x8
    assert 0 < _hamming(dhash64(px), dhash64(v)) <= 2


def test_dhash_distinct_images_far_apart():
    hs = [dhash64(_img(s)) for s in range(30)]
    for i in range(len(hs)):
        for j in range(i + 1, len(hs)):
            assert _hamming(hs[i], hs[j]) > 10


def test_dhash_resolution_independence_signed_range():
    # any resolution ≥ 9x8 hashes through the same 9x8 grid; value must
    # fit signed int64
    for h, w in ((8, 9), (16, 16), (33, 47)):
        v = dhash64(_img(5, h, w))
        assert -(1 << 63) <= v < (1 << 63)


def test_banding_recall_guarantee_exhaustive():
    # any pair at hamming ≤ 3 shares at least one of 4 16-bit bands
    rng = random.Random(9)
    for _ in range(200):
        a = rng.getrandbits(64)
        b = a
        for bit in rng.sample(range(64), rng.randint(1, 3)):
            b ^= 1 << bit
        shared = any(
            ((a >> (16 * i)) & 0xFFFF) == ((b >> (16 * i)) & 0xFFFF)
            for i in range(4)
        )
        assert shared


def test_phash_near_dup_finds_planted_only(spark):
    base = [_img(s) for s in range(40)]
    rows = []
    for i, px in enumerate(base):
        rows.append((i, bytearray(encode_bmp(px))))
        if i % 4 == 0:
            v = px + 10
            v[6, 7] = 255
            rows.append((i + 1000, bytearray(encode_bmp(v))))
    df = spark.createDataFrame(rows, "doc_id long, content binary")
    hashes = dhash_images(df, decoder="bmp")
    pairs = phash_near_dup(hashes, max_hamming=3, n_bands=4).collect()
    found = {(r["id_a"], r["id_b"]) for r in pairs}
    assert found == {(i, i + 1000) for i in range(0, 40, 4)}
    assert all(r["hamming"] <= 2 for r in pairs)


def test_phash_rejects_bad_params(spark):
    df = spark.createDataFrame([(1, 1)], "doc_id long, dhash long")
    with pytest.raises(ValueError):
        phash_near_dup(df, max_hamming=4, n_bands=4)
    with pytest.raises(ValueError):
        phash_near_dup(df, max_hamming=2, n_bands=5)


def test_phash_band_cap_star_preserves_duplicate_groups(spark):
    # 30 identical hashes (a degenerate bucket) + 2 distinct: with a cap
    # of 5 the group collapses to an anchor star but every member still
    # pairs with the anchor at hamming 0
    rows = [(i, 42) for i in range(30)] + [(100, 1 << 40), (101, -5)]
    df = spark.createDataFrame(rows, "doc_id long, dhash long")
    pairs = phash_near_dup(
        df, max_hamming=3, n_bands=4, band_bucket_cap=5
    ).collect()
    ids = {(r["id_a"], r["id_b"]) for r in pairs}
    assert {(0, i) for i in range(1, 30)} <= ids  # anchor star intact
    assert all(r["hamming"] == 0 for r in pairs if r["id_b"] < 100)
    assert not any(100 in p or 101 in p for p in ids)


def test_dhash_stub_plumbing(spark):
    df = spark.createDataFrame(
        [(1, bytearray(b"abc")), (2, bytearray(b"abc")), (3, bytearray(b"xyz"))],
        "doc_id long, content binary",
    )
    out = {r["doc_id"]: r["dhash"] for r in dhash_images(df, decoder="stub").collect()}
    assert out[1] == out[2] != out[3]
    with pytest.raises(NotImplementedError):
        dhash_images(df, decoder="pil")


def test_phash_plan_is_udf_free_after_hashing(spark):
    # everything downstream of dhash must stay in codegen: banding,
    # join, bit_count verify
    df = spark.createDataFrame([(i, i * 7919) for i in range(50)],
                               "doc_id long, dhash long")
    plan = phash_near_dup(df)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


# -- audio fingerprint ------------------------------------------------

from spark_skew_join_spark.operators.multimodal import (  # noqa: E402
    awhash64,
    awhash_audio,
    decode_wav,
    encode_wav,
)


def _clip(seed: int, boost_band: int | None = None) -> np.ndarray:
    rng = np.random.default_rng(seed)
    sr, n_frames, frame_len, n_bands = 8000, 9, 400, 8
    t = np.arange(n_frames * frame_len) / sr
    freqs = (25 * np.arange(n_bands) + 12) * (sr / frame_len)
    env = rng.uniform(0.2, 1.0, size=(n_frames, n_bands))
    if boost_band is not None:
        env[4, boost_band] *= 3.0
    mono = (np.repeat(env, frame_len, axis=0)
            * np.sin(2 * np.pi * freqs[None, :] * t[:, None])).sum(axis=1)
    return mono / n_bands


def test_awhash_amplitude_invariance_through_pcm():
    mono = _clip(3)
    h1 = awhash64(decode_wav(encode_wav(mono))[0])
    h2 = awhash64(decode_wav(encode_wav(mono * 0.5))[0])
    h3 = awhash64(decode_wav(encode_wav(mono * 0.05))[0])
    assert h1 == h2 == h3


def test_awhash_band_boost_is_local():
    rng = random.Random(4)
    for seed in range(5):
        base = awhash64(decode_wav(encode_wav(_clip(seed)))[0])
        b = rng.randint(0, 7)
        var = awhash64(decode_wav(encode_wav(_clip(seed, boost_band=b) * 0.6))[0])
        assert _hamming(base, var) <= 2


def test_awhash_distinct_clips_far_apart():
    hs = [awhash64(decode_wav(encode_wav(_clip(s)))[0]) for s in range(15)]
    for i in range(len(hs)):
        for j in range(i + 1, len(hs)):
            assert _hamming(hs[i], hs[j]) > 10


def test_awhash_rejects_bad_geometry():
    with pytest.raises(ValueError):
        awhash64(np.zeros(900), n_frames=10, n_bands=8)


def test_awhash_spark_matcher_end_to_end(spark):
    rows = []
    for i in range(12):
        rows.append((i, bytearray(encode_wav(_clip(i)))))
        if i % 3 == 0:
            rows.append((i + 500, bytearray(encode_wav(_clip(i, boost_band=i % 8) * 0.7))))
    df = spark.createDataFrame(rows, "doc_id long, content binary")
    from spark_skew_join_spark.operators.multimodal import phash_near_dup

    pairs = phash_near_dup(
        awhash_audio(df), hash_col="awhash", max_hamming=3, n_bands=4
    ).collect()
    assert {(r["id_a"], r["id_b"]) for r in pairs} == {
        (i, i + 500) for i in range(0, 12, 3)
    }
