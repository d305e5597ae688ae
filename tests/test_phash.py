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


# ---- stdlib-zlib PNG codec (VERDICT r12 #4) --------------------------

import struct  # noqa: E402
import zlib  # noqa: E402

from spark_skew_join_spark.operators.multimodal import (  # noqa: E402
    decode_bmp,
    decode_png,
    encode_png,
)


def _png_chunk(typ: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data)) + typ + data
        + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
    )


def _raw_png(w, h, ctype, scanlines, extra=b""):
    raw = b"".join(bytes([f]) + bytes(line) for f, line in scanlines)
    return (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0))
        + extra
        + _png_chunk(b"IDAT", zlib.compress(raw))
        + _png_chunk(b"IEND", b"")
    )


def test_png_roundtrip_random_rgb():
    rng = np.random.default_rng(5)
    px = rng.integers(0, 256, (23, 17, 3), dtype=np.uint8)
    assert np.array_equal(decode_png(encode_png(px)), px)


def test_png_unfilter_matches_scalar_reference():
    """Every filter type (None/Sub/Up/Average/Paeth) against a
    straight-from-the-spec scalar reconstruction."""

    def ref(ftypes, scan, w, ch):
        h, stride = len(ftypes), w * ch
        recon = np.zeros((h, stride), np.int32)
        for y in range(h):
            for x in range(stride):
                a = recon[y, x - ch] if x >= ch else 0
                b = recon[y - 1, x] if y > 0 else 0
                c = recon[y - 1, x - ch] if (y > 0 and x >= ch) else 0
                v, f = int(scan[y][x]), ftypes[y]
                if f == 0:
                    r = v
                elif f == 1:
                    r = v + a
                elif f == 2:
                    r = v + b
                elif f == 3:
                    r = v + ((a + b) >> 1)
                else:
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (
                        b if pb <= pc else c
                    )
                    r = v + pred
                recon[y, x] = r & 0xFF
        return recon.astype(np.uint8).reshape(h, w, ch)

    rng = np.random.default_rng(9)
    w, h, ch = 11, 9, 3
    ftypes = [0, 1, 2, 3, 4, 4, 3, 2, 1]
    scan = rng.integers(0, 256, (h, w * ch), dtype=np.uint8)
    png = _raw_png(w, h, 2, [(ftypes[y], scan[y].tobytes()) for y in range(h)])
    assert np.array_equal(decode_png(png), ref(ftypes, scan, w, ch))


def test_png_gray_alpha_palette_types():
    rng = np.random.default_rng(3)
    w, h = 7, 5
    gray = rng.integers(0, 256, (h, w), dtype=np.uint8)
    png0 = _raw_png(w, h, 0, [(0, gray[y].tobytes()) for y in range(h)])
    out0 = decode_png(png0)
    assert np.array_equal(out0[:, :, 0], gray)
    assert np.array_equal(out0[:, :, 0], out0[:, :, 2])
    rgba = rng.integers(0, 256, (h, w, 4), dtype=np.uint8)
    png6 = _raw_png(
        w, h, 6, [(0, rgba[y].tobytes()) for y in range(h)]
    )
    assert np.array_equal(decode_png(png6), rgba[:, :, :3])
    pal = rng.integers(0, 256, (16, 3), dtype=np.uint8)
    idx = rng.integers(0, 16, (h, w), dtype=np.uint8)
    png3 = _raw_png(
        w, h, 3, [(0, idx[y].tobytes()) for y in range(h)],
        extra=_png_chunk(b"PLTE", pal.tobytes()),
    )
    assert np.array_equal(decode_png(png3), pal[idx])


def test_png_rejects_malformed_payloads():
    with pytest.raises(ValueError, match="signature"):
        decode_png(b"nope")
    # 16-bit depth unsupported
    bad = _raw_png(4, 4, 2, [(0, bytes(12))] * 4).replace(
        struct.pack(">IIBBBBB", 4, 4, 8, 2, 0, 0, 0),
        struct.pack(">IIBBBBB", 4, 4, 16, 2, 0, 0, 0),
    )
    with pytest.raises(ValueError, match="8-bit"):
        decode_png(bad)
    # pixel payload shorter than h*(stride+1)
    trunc = (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", struct.pack(">IIBBBBB", 4, 4, 8, 2, 0, 0, 0))
        + _png_chunk(b"IDAT", zlib.compress(b"\x00" * 10))
        + _png_chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="size mismatch"):
        decode_png(trunc)


def test_png_dhash_parity_with_bmp_and_spark_paths(spark):
    """Same pixels through both containers must dHash identically —
    unit-level, then through the Arrow-batched Spark stage."""
    rng = np.random.default_rng(21)
    imgs = [rng.integers(0, 200, (16, 16, 3), dtype=np.uint8) for _ in range(6)]
    for px in imgs:
        assert dhash64(decode_png(encode_png(px))) == dhash64(
            decode_bmp(encode_bmp(px))
        )
    rows_bmp = [(i, encode_bmp(px)) for i, px in enumerate(imgs)]
    rows_png = [(i, encode_png(px)) for i, px in enumerate(imgs)]
    hb = dhash_images(
        spark.createDataFrame(rows_bmp, ["doc_id", "content"]), decoder="bmp"
    ).collect()
    hp = dhash_images(
        spark.createDataFrame(rows_png, ["doc_id", "content"]), decoder="png"
    ).collect()
    assert sorted((r.doc_id, r.dhash) for r in hb) == sorted(
        (r.doc_id, r.dhash) for r in hp
    )


def test_png_resize_and_features_spark_paths(spark):
    from spark_skew_join_spark.operators.multimodal import (
        extract_features,
        resize_images,
    )

    rng = np.random.default_rng(2)
    px = rng.integers(0, 256, (16, 12, 3), dtype=np.uint8)
    df = spark.createDataFrame([(1, encode_png(px))], ["doc_id", "content"])
    r = resize_images(df, 8, 6, decoder="png").collect()[0]
    out = decode_png(bytes(r.resized))
    assert out.shape == (6, 8, 3)
    # nearest-neighbor grid must match the BMP path on the same pixels
    dfb = spark.createDataFrame([(1, encode_bmp(px))], ["doc_id", "content"])
    rb = resize_images(dfb, 8, 6, decoder="bmp").collect()[0]
    assert np.array_equal(out, decode_bmp(bytes(rb.resized)))
    f = extract_features(df, decoder="png").collect()[0]
    fb = extract_features(dfb, decoder="bmp").collect()[0]
    assert f.features == fb.features


def test_phash_cache_hashes_equivalence_and_plan(spark):
    # r14: cache_hashes persists the (id, hash) relation before the
    # band fan-out — output must equal the uncached form, and the
    # cached plan must read the hashes through one InMemoryRelation
    from spark_skew_join_spark.operators.dedup import clear_band_cache

    rows = [(i, (i * 7919) ^ (i << 3)) for i in range(60)]
    rows += [(1000 + i, rows[i][1] ^ 1) for i in range(10)]  # 1-bit twins
    df = spark.createDataFrame(rows, "doc_id long, dhash long")
    got = sorted(
        map(tuple, phash_near_dup(df, max_hamming=3, n_bands=4).collect())
    )
    want = sorted(map(tuple, phash_near_dup(
        df, max_hamming=3, n_bands=4, cache_hashes=False
    ).collect()))
    assert got == want and len(got) >= 10
    plan = phash_near_dup(df)._jdf.queryExecution().optimizedPlan().toString()
    assert "InMemoryRelation" in plan
    clear_band_cache()
