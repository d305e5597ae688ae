"""Pure-numpy baseline JPEG codec (operators/jpeg.py) + its
multimodal wiring. The encoder and decoder check each other (the
decoder parses quantization/Huffman tables from the stream), so a
wrong table constant or bit-layout bug breaks these round-trips
loudly."""

from __future__ import annotations

import numpy as np
import pytest

from spark_skew_join_spark.operators.jpeg import decode_jpeg, encode_jpeg


def _psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = np.mean((a.astype(float) - b.astype(float)) ** 2)
    return 99.0 if mse == 0 else 10 * np.log10(255.0 ** 2 / mse)


def _smooth(h: int = 32, w: int = 24) -> np.ndarray:
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack([
        128 + 80 * np.sin(2 * np.pi * (xx / w + 0.3)),
        128 + 60 * np.cos(2 * np.pi * (yy / h)),
        128 + 50 * np.sin(2 * np.pi * ((xx + yy) / 40.0)),
    ], axis=2).clip(0, 255).astype(np.uint8)


def test_roundtrip_quality_scaling():
    img = _smooth()
    last = 0.0
    for q in (70, 90, 95):
        dec = decode_jpeg(encode_jpeg(img, quality=q))
        assert dec.shape == img.shape
        p = _psnr(img, dec)
        assert p > last  # higher quality → strictly better fidelity
        last = p
    assert last > 45.0  # q=95 on smooth content is near-transparent


def test_roundtrip_noise_and_flat():
    rng = np.random.default_rng(3)
    noise = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    assert _psnr(noise, decode_jpeg(encode_jpeg(noise, quality=95))) > 30
    flat = np.full((17, 13, 3), 130, dtype=np.uint8)
    assert np.array_equal(decode_jpeg(encode_jpeg(flat, quality=90)), flat)


def test_subsampled_420_and_odd_sizes():
    rng = np.random.default_rng(9)
    img = _smooth(33, 18)
    dec = decode_jpeg(encode_jpeg(img, quality=90, subsampling="420"))
    assert dec.shape == img.shape
    assert _psnr(img, dec) > 28
    odd = rng.integers(0, 256, (9, 11, 3), dtype=np.uint8)
    assert decode_jpeg(
        encode_jpeg(odd, quality=90, subsampling="420")
    ).shape == (9, 11, 3)


def test_restart_markers_change_nothing():
    """RSTn handling: byte-aligned markers + DC predictor resets must
    reproduce the EXACT pixels of the no-restart stream."""
    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (24, 40, 3), dtype=np.uint8)
    plain = decode_jpeg(encode_jpeg(img, quality=85))
    for ri in (1, 2, 5):
        enc = encode_jpeg(img, quality=85, restart_interval=ri)
        assert b"\xff\xdd" in enc
        assert np.array_equal(decode_jpeg(enc), plain), ri
    img420 = rng.integers(0, 256, (33, 18, 3), dtype=np.uint8)
    assert np.array_equal(
        decode_jpeg(encode_jpeg(img420, quality=85, subsampling="420",
                                restart_interval=1)),
        decode_jpeg(encode_jpeg(img420, quality=85, subsampling="420")),
    )


def test_rejects_malformed_and_nonbaseline():
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"nope")
    enc = encode_jpeg(_smooth())
    with pytest.raises(ValueError):
        decode_jpeg(enc[:50])  # truncated before SOS
    with pytest.raises(ValueError, match="progressive"):
        decode_jpeg(enc.replace(b"\xff\xc0", b"\xff\xc2", 1))
    with pytest.raises(ValueError):
        encode_jpeg(_smooth(), subsampling="422")


def test_dc_gradient_and_texture_survive():
    """The statistics the jpeg_decode_stats registry entry relies on:
    mean within ±1, half-image tilt sign, variance class."""
    xx, yy = np.meshgrid(np.arange(16), np.arange(16))
    sin2d = np.sin(2 * np.pi * xx / 8.0) * np.sin(2 * np.pi * yy / 8.0)
    for k in range(8):
        for s in (1, -1):
            for a in range(3):
                v = 108.0 + 8 * k + s * 3.0 * (xx - 7.5) \
                    + (32.0 + 16 * a) * sin2d
                px = np.round(v).clip(0, 255).astype(np.uint8)
                dec = decode_jpeg(
                    encode_jpeg(np.repeat(px[:, :, None], 3, axis=2),
                                quality=97)
                ).astype(np.float64)
                lum = dec[:, :, 0]
                assert int((lum.mean() - 104.0) // 8) == k, (k, s, a)
                hd = lum[:, :8].mean() - lum[:, 8:].mean()
                assert (1 if hd < 0 else -1) == s, (k, s, a)
                var = lum.var()
                a_hat = 0 if var < 607.25 else (1 if var < 991.25 else 2)
                assert a_hat == a, (k, s, a, var)


def test_multimodal_jpeg_wiring(spark):
    from spark_skew_join_spark.operators.multimodal import (
        dhash64,
        dhash_images,
        extract_features,
        resize_images,
    )

    img = _smooth(16, 16)
    df = spark.createDataFrame(
        [(1, encode_jpeg(img, quality=95))], ["doc_id", "content"]
    )
    hrow = dhash_images(df, decoder="jpeg").collect()[0]
    assert hrow.dhash == dhash64(decode_jpeg(encode_jpeg(img, quality=95)))
    r = resize_images(df, 8, 8, decoder="jpeg").collect()[0]
    assert decode_jpeg(bytes(r.resized)).shape == (8, 8, 3)
    f = extract_features(df, decoder="jpeg").collect()[0]
    assert len(f.features) == 16
    # mean luminance feature tracks the real pixels through the codec
    assert abs(f.features[0] * 255 - img[:, :, 0].mean()) < 3.0


def test_truncated_entropy_raises_value_error():
    """ADVICE r13: a segment cut before any trailing marker must raise
    the documented ValueError, not IndexError."""
    from spark_skew_join_spark.operators.jpeg import _BitReader

    r = _BitReader(b"\x12", 0)
    assert r.bits(8) == 0x12
    with pytest.raises(ValueError, match="entropy data truncated"):
        r.bit()
    # end-to-end: strip the EOI and most of the entropy segment
    enc = encode_jpeg(_smooth())
    sos = enc.index(b"\xff\xda")
    with pytest.raises(ValueError):
        decode_jpeg(enc[: sos + 16])


def test_non_divisible_sampling_rejected():
    """ADVICE r13: truncating chroma upsample ratios silently misalign
    planes — a legal-but-unsupported sampling grid must error."""
    enc = bytearray(encode_jpeg(_smooth()))
    sof = bytes(enc).index(b"\xff\xc0")
    # comp entries start at sof+10; bytes are (id, h<<4|v, tq)
    assert enc[sof + 11] == 0x11 and enc[sof + 14] == 0x11  # 4:4:4
    enc[sof + 11] = 0x33  # Y  -> 3x3
    enc[sof + 14] = 0x22  # Cb -> 2x2: 3 % 2 != 0
    with pytest.raises(ValueError, match="non-divisible"):
        decode_jpeg(bytes(enc))


def test_fast_engine_bit_for_bit_equals_bitserial():
    """VERDICT r13 #5: the block-batched LUT decoder is certified
    against the bit-serial reference on every fixture shape — exact
    array equality, not PSNR."""
    rng = np.random.default_rng(11)
    cases = [
        encode_jpeg(_smooth(), quality=70),
        encode_jpeg(_smooth(), quality=95),
        encode_jpeg(_smooth(33, 18), quality=90, subsampling="420"),
        encode_jpeg(
            rng.integers(0, 256, (9, 11, 3), dtype=np.uint8),
            quality=90, subsampling="420",
        ),
        encode_jpeg(
            rng.integers(0, 256, (16, 16, 3), dtype=np.uint8), quality=95
        ),
        encode_jpeg(_smooth(64, 48), quality=85, subsampling="420",
                    restart_interval=4),
    ]
    for i, enc in enumerate(cases):
        a = decode_jpeg(enc, engine="bitserial")
        b = decode_jpeg(enc, engine="fast")
        assert np.array_equal(a, b), i
    with pytest.raises(ValueError, match="engine"):
        decode_jpeg(cases[0], engine="warp")
