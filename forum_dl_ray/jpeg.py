"""Real baseline JPEG codec (ITU-T T.81), pure numpy + stdlib.

Replaces the round-4 ``FJPG`` deterministic stand-in with an actual
JPEG implementation — JFIF container, Annex K quantization and
Huffman tables, 8x8 FDCT/IDCT, zigzag, DC-prediction + AC run-length
entropy coding, 0xFF byte stuffing, restart-marker tolerance on
decode. Encoded output is a standards-conforming baseline JFIF file
(SOI APP0 DQT SOF0 DHT SOS ... EOI, 3 components, 4:4:4, 8-bit).

Honesty note (container limits): no reference JPEG library exists in
this environment (no PIL/imageio/libjpeg), so conformance is
*self-verified*: the decoder is written independently from the spec
text rather than as the encoder's inverse (separate bitstream parser,
LUT Huffman decode, its own IDCT path), plus structural marker checks
and PSNR oracles in tests/test_jpeg.py. Decoding third-party
baseline JFIF files is supported for 8-bit 1- or 3-component scans
without chroma subsampling; subsampled (4:2:0) files raise
NotImplementedError rather than decoding wrongly.

Reference parity: the upstream project fetches real <img> payloads
as opaque bytes (reference: forum_dl/extractors/common.py file
handling); decoding them is this repo's added image-curation surface
(SURVEY.md §2.9).
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["encode_jpeg", "decode_jpeg", "JPEG_MAGIC"]

JPEG_MAGIC = b"\xff\xd8"

# ------------------------------------------------------------------ tables
# Annex K.1 / K.2 base quantization tables (natural row-major order).
_QT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int32)
_QT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int32)

# Zigzag: _ZIGZAG[k] = natural index of the k-th zigzag coefficient.
def _zigzag_order() -> np.ndarray:
    idx = np.arange(64).reshape(8, 8)
    out = []
    for s in range(15):
        diag = [(i, s - i) for i in range(max(0, s - 7), min(8, s + 1))]
        if s % 2 == 0:
            diag.reverse()
        out.extend(idx[i, j] for i, j in diag)
    return np.array(out, dtype=np.int64)


_ZIGZAG = _zigzag_order()
_UNZIGZAG = np.argsort(_ZIGZAG)

# Annex K.3 standard Huffman tables: (BITS[1..16], HUFFVAL).
_DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_LUMA_VALS = list(range(12))
_DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
_DC_CHROMA_VALS = list(range(12))
_AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]
_AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
_AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
    0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
    0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
    0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
    0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
    0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """val -> (code, length) per T.81 Annex C code assignment."""
    out: dict[int, tuple[int, int]] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


_ENC_DC = (_canonical_codes(_DC_LUMA_BITS, _DC_LUMA_VALS),
           _canonical_codes(_DC_CHROMA_BITS, _DC_CHROMA_VALS))
_ENC_AC = (_canonical_codes(_AC_LUMA_BITS, _AC_LUMA_VALS),
           _canonical_codes(_AC_CHROMA_BITS, _AC_CHROMA_VALS))

_DCT8 = None


def _dct8() -> np.ndarray:
    """Orthonormal 8-point DCT-II matrix — identical scaling to the
    T.81 A.3.3 FDCT (1/4·C(u)C(v)·Σ = orthonormal for N=8)."""
    global _DCT8
    if _DCT8 is None:
        k = np.arange(8)[:, None].astype(np.float64)
        x = np.arange(8)[None, :].astype(np.float64)
        m = np.cos(np.pi * (2 * x + 1) * k / 16.0) * 0.5
        m[0] *= 1.0 / np.sqrt(2.0)
        _DCT8 = m
    return _DCT8


def _quality_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    """libjpeg-compatible quality scaling of the Annex K tables."""
    q = min(100, max(1, int(quality)))
    scale = 5000 // q if q < 50 else 200 - 2 * q
    def sc(base: np.ndarray) -> np.ndarray:
        return np.clip((base * scale + 50) // 100, 1, 255).astype(np.int32)
    return sc(_QT_LUMA), sc(_QT_CHROMA)


# ------------------------------------------------------------------ colorspace
def _rgb_to_ycbcr(px: np.ndarray) -> np.ndarray:
    f = px.astype(np.float64)
    r, g, b = f[..., 0], f[..., 1], f[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168735892 * r - 0.331264108 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418687589 * g - 0.081312411 * b + 128.0
    return np.stack([y, cb, cr], axis=-1)


def _ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    y, cb, cr = ycc[..., 0], ycc[..., 1] - 128.0, ycc[..., 2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136286 * cb - 0.714136286 * cr
    b = y + 1.772 * cb
    return np.clip(np.stack([r, g, b], axis=-1).round(), 0, 255).astype(np.uint8)


def _to_blocks(plane: np.ndarray) -> np.ndarray:
    """(H, W) with H,W multiples of 8 → (n_blocks, 8, 8) row-major MCUs."""
    h, w = plane.shape
    return (plane.reshape(h // 8, 8, w // 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(-1, 8, 8))


def _from_blocks(blocks: np.ndarray, h: int, w: int) -> np.ndarray:
    return (blocks.reshape(h // 8, w // 8, 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(h, w))


# ------------------------------------------------------------------ bit writer
class _BitWriter:
    __slots__ = ("buf", "acc", "nbits")

    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.acc >> self.nbits) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:  # T.81 F.1.2.3 byte stuffing
                self.buf.append(0x00)
        self.acc &= (1 << self.nbits) - 1

    def pad_to_byte(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.put((1 << pad) - 1, pad)  # 1-fill per F.1.2.3

    def raw_marker(self, m: int) -> None:
        """Append a marker (never byte-stuffed). Call pad_to_byte first."""
        self.buf += bytes((0xFF, m))

    def flush(self) -> bytes:
        self.pad_to_byte()
        return bytes(self.buf)


def _category(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


# ------------------------------------------------------------------ encoder
def encode_jpeg(pixels: np.ndarray, quality: int = 98,
                restart_interval: int = 0) -> bytes:
    """Encode 8-bit RGB (h, w, 3) → baseline JFIF bytes (4:4:4).

    ``restart_interval`` > 0 emits a DRI segment and RSTn markers
    every N MCUs (T.81 §B.2.4.4) — the standard mechanism that lets a
    decoder resynchronize mid-scan (and, at scale, decode segments in
    parallel)."""
    assert pixels.ndim == 3 and pixels.shape[2] == 3 and pixels.dtype == np.uint8
    h, w = pixels.shape[:2]
    assert 0 < h <= 65535 and 0 < w <= 65535
    qt_l, qt_c = _quality_tables(quality)

    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    padded = np.pad(pixels, ((0, ph - h), (0, pw - w), (0, 0)), mode="edge")
    ycc = _rgb_to_ycbcr(padded)

    m = _dct8()
    qts = (qt_l, qt_c, qt_c)
    coeffs = []
    for c in range(3):
        blocks = _to_blocks(ycc[..., c]) - 128.0
        d = np.einsum("ij,njk,lk->nil", m, blocks, m)
        q = qts[c].reshape(8, 8).astype(np.float64)
        coeffs.append(np.round(d / q).astype(np.int32).reshape(-1, 64))

    # zigzag-reorder every block of every component in one shot
    zz = [c[:, _ZIGZAG] for c in coeffs]

    bw = _BitWriter()
    pred = [0, 0, 0]
    n_mcu = (ph // 8) * (pw // 8)
    for i in range(n_mcu):
        if restart_interval and i and i % restart_interval == 0:
            bw.pad_to_byte()
            bw.raw_marker(0xD0 + ((i // restart_interval - 1) % 8))
            pred = [0, 0, 0]
        for c in range(3):
            t = 0 if c == 0 else 1
            dc_tbl, ac_tbl = _ENC_DC[t], _ENC_AC[t]
            blk = zz[c][i]
            diff = int(blk[0]) - pred[c]
            pred[c] = int(blk[0])
            cat = _category(diff)
            code, ln = dc_tbl[cat]
            bw.put(code, ln)
            if cat:
                bw.put(diff if diff >= 0 else diff + (1 << cat) - 1, cat)
            run = 0
            nz = np.nonzero(blk[1:])[0]
            last = int(nz[-1]) + 1 if len(nz) else 0
            for k in range(1, last + 1):
                v = int(blk[k])
                if v == 0:
                    run += 1
                    continue
                while run >= 16:
                    code, ln = ac_tbl[0xF0]  # ZRL
                    bw.put(code, ln)
                    run -= 16
                cat = _category(v)
                code, ln = ac_tbl[(run << 4) | cat]
                bw.put(code, ln)
                bw.put(v if v >= 0 else v + (1 << cat) - 1, cat)
                run = 0
            if last < 63:
                code, ln = ac_tbl[0x00]  # EOB
                bw.put(code, ln)
    scan = bw.flush()

    out = bytearray()
    out += b"\xff\xd8"  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    for tid, qt in ((0, qt_l), (1, qt_c)):
        out += b"\xff\xdb" + struct.pack(">HB", 67, tid) + bytes(int(x) for x in qt[_ZIGZAG])
    out += b"\xff\xc0" + struct.pack(">HBHHB", 17, 8, h, w, 3)
    for cid, qid in ((1, 0), (2, 1), (3, 1)):
        out += struct.pack("BBB", cid, 0x11, qid)  # h1v1 — 4:4:4
    for cls, tid, bits, vals in (
        (0, 0, _DC_LUMA_BITS, _DC_LUMA_VALS),
        (0, 1, _DC_CHROMA_BITS, _DC_CHROMA_VALS),
        (1, 0, _AC_LUMA_BITS, _AC_LUMA_VALS),
        (1, 1, _AC_CHROMA_BITS, _AC_CHROMA_VALS),
    ):
        out += b"\xff\xc4" + struct.pack(">HB", 3 + 16 + len(vals), (cls << 4) | tid)
        out += bytes(bits) + bytes(vals)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    out += b"\xff\xda" + struct.pack(">HB", 12, 3)
    for cid, tbl in ((1, 0x00), (2, 0x11), (3, 0x11)):
        out += struct.pack("BB", cid, tbl)
    out += b"\x00\x3f\x00"  # Ss=0 Se=63 Ah/Al=0
    out += scan
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ------------------------------------------------------------------ decoder
def _decode_lut(bits: list[int], vals: list[int]) -> tuple[np.ndarray, np.ndarray]:
    """16-bit-peek LUT: for every 16-bit window, (code length, symbol)."""
    ln_lut = np.zeros(1 << 16, dtype=np.uint8)
    val_lut = np.zeros(1 << 16, dtype=np.uint8)
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            lo = code << (16 - length)
            hi = lo + (1 << (16 - length))
            ln_lut[lo:hi] = length
            val_lut[lo:hi] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return ln_lut, val_lut


# LRU-capped: real-world encoders (libjpeg -optimize, mozjpeg) emit
# per-image Huffman tables, so an unbounded dict keyed on (bits, vals)
# grows with every distinct crawled image inside long-lived decode
# actors. 32 entries covers the standard Annex K set plus a healthy
# working set of optimized tables at ~3 MB/entry worst case.
import functools as _functools


@_functools.lru_cache(maxsize=32)
def _decode_lut_cached(bits: tuple, vals: tuple) -> tuple[np.ndarray, np.ndarray]:
    return _decode_lut(list(bits), list(vals))


# Combined symbol+value LUTs (libjpeg's "fast path" idea, taken one
# step further): when a Huffman code AND its appended value bits fit
# the 16-bit peek window together (ln + cat <= 16 — true for nearly
# every symbol the Annex K tables produce), the full signed
# coefficient is a pure function of the peek, so one lookup replaces
# the two-stage decode.  step=0 marks the rare slow-path entries
# (ln + cat > 16, or an invalid code).
#   AC `run` encoding: 0..15 = zero run before the coefficient,
#   16 = ZRL, 255 = EOB.
# LRU-capped for the same reason as _decode_lut_cached, and more so:
# the coef list is ~2.6 MB per entry.


@_functools.lru_cache(maxsize=32)
def _combined_lut(bits: tuple, vals: tuple, is_ac: bool) -> tuple[bytes, bytes, list[int]]:
    ln_lut, val_lut = _decode_lut_cached(bits, vals)
    ln = ln_lut.astype(np.int32)
    sym = val_lut.astype(np.int32)
    peek = np.arange(1 << 16, dtype=np.int32)
    if is_ac:
        run = sym >> 4
        cat = sym & 0x0F
    else:
        run = np.zeros_like(sym)
        cat = sym
    total = ln + cat
    fits = (ln > 0) & (total <= 16)
    # value bits immediately follow the code inside the same window
    raw = (peek >> np.maximum(16 - total, 0)) & ((1 << cat) - 1)
    coef = np.where(raw >= (1 << np.maximum(cat - 1, 0)),
                    raw, raw - (1 << cat) + 1)
    coef = np.where(cat == 0, 0, coef)
    step = np.where(fits, total, 0)
    run_out = run.copy()
    if is_ac:
        zero_cat = fits & (cat == 0)
        run_out = np.where(zero_cat & (sym == 0xF0), 16, run_out)
        run_out = np.where(zero_cat & (sym == 0x00), 255, run_out)
    return (step.astype(np.uint8).tobytes(),
            run_out.astype(np.uint8).tobytes(),
            coef.astype(np.int32).tolist())


def decode_jpeg(data: bytes) -> np.ndarray:
    """Decode baseline JFIF (8-bit, 1 or 3 components, no chroma
    subsampling) → (h, w, 3) uint8 RGB. Restart markers honored."""
    assert data[:2] == JPEG_MAGIC, "not a JPEG (no SOI)"
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    htabs: dict[int, tuple[tuple, tuple]] = {}  # tid -> (bits, vals)
    restart_interval = 0
    h = w = 0
    comps: list[tuple[int, int, int]] = []  # (cid, sampling, qid)
    scan_comps: list[tuple[int, int, int]] = []  # (cid, dc_tid, ac_tid)
    scan_start = -1

    while pos < len(data):
        assert data[pos] == 0xFF, f"marker expected at {pos}"
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue  # standalone
        (seglen,) = struct.unpack_from(">H", data, pos)
        seg = data[pos + 2 : pos + seglen]
        pos += seglen
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0x0F
                assert pq == 0, "8-bit quant tables only"
                tbl = np.frombuffer(seg[p + 1 : p + 65], dtype=np.uint8).astype(np.int32)
                qtabs[tq] = tbl[_UNZIGZAG]  # store natural order
                p += 65
        elif marker in (0xC0, 0xC1):  # SOF0/1 (baseline / ext. sequential)
            prec, h, w, nc = struct.unpack_from(">BHHB", seg, 0)
            assert prec == 8, "8-bit precision only"
            for i in range(nc):
                cid, hv, qid = struct.unpack_from("BBB", seg, 6 + 3 * i)
                if hv != 0x11:
                    raise NotImplementedError(
                        "chroma-subsampled JPEG (sampling != 1x1) unsupported")
                comps.append((cid, hv, qid))
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise NotImplementedError(f"non-baseline SOF marker 0x{marker:02x}")
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc_th = seg[p]
                bits = tuple(seg[p + 1 : p + 17])
                nv = sum(bits)
                vals = tuple(seg[p + 17 : p + 17 + nv])
                htabs[tc_th] = (bits, vals)
                p += 17 + nv
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", seg, 0)
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            for i in range(ns):
                cid, tbl = seg[1 + 2 * i], seg[2 + 2 * i]
                scan_comps.append((cid, tbl >> 4, tbl & 0x0F))
            scan_start = pos
            break
        # APPn/COM and anything else: skipped

    assert h and w and comps and scan_start >= 0, "truncated JPEG"
    nc = len(comps)
    assert nc in (1, 3), f"{nc}-component scans unsupported"

    # Destuff entropy data up to the next real marker (handling RSTn).
    # Fast path (the common case — this encoder never emits RSTn):
    # find the scan end vectorized, then one C-level bytes.replace.
    arr = np.frombuffer(data, dtype=np.uint8, offset=scan_start)
    ff = np.nonzero(arr[:-1] == 0xFF)[0]
    nxt_b = arr[ff + 1]
    is_stuff = nxt_b == 0x00
    is_rst = (nxt_b >= 0xD0) & (nxt_b <= 0xD7)
    real = ff[~(is_stuff | is_rst)]
    end = int(real[0]) if len(real) else len(arr)
    rst_positions: list[int] = []
    if not is_rst[ff < end].any():
        raw = data[scan_start : scan_start + end].replace(b"\xff\x00", b"\xff")
    else:
        # slow path: per-byte walk that records restart offsets in
        # destuffed coordinates
        buf = bytearray()
        p = scan_start
        n = len(data)
        while p < n:
            b = data[p]
            if b != 0xFF:
                buf.append(b)
                p += 1
                continue
            nxt = data[p + 1] if p + 1 < n else 0xD9
            if nxt == 0x00:
                buf.append(0xFF)
                p += 2
            elif 0xD0 <= nxt <= 0xD7:
                rst_positions.append(len(buf))
                p += 2
            else:
                break  # EOI or other marker ends the scan
        raw = bytes(buf)

    mcu_w, mcu_h = -(-w // 8), -(-h // 8)
    n_mcu = mcu_w * mcu_h
    # scan decode: left-aligned 64-bit bit buffer (valid bits live at
    # the TOP, so a peek is one shift and stale low bits never leak
    # into it), 4-byte refills, and combined symbol+value LUTs — one
    # lookup yields the signed coefficient for nearly every symbol.
    # This loop runs per coefficient inside the curation chain's
    # ImageDecodeStage actors and the crawl/steady asset stage, so
    # constant-factor CPython work here is throughput.
    data_b = bytes(raw) + b"\x00" * 8  # refill slices never run short
    comp_tabs = []
    for c in range(nc):
        _, dc_tid, ac_tid = scan_comps[c]
        d_bits, d_vals = htabs[0x00 | dc_tid]
        a_bits, a_vals = htabs[0x10 | ac_tid]
        dstep, _drun, dcoef = _combined_lut(d_bits, d_vals, is_ac=False)
        astep, arun, acoef = _combined_lut(a_bits, a_vals, is_ac=True)
        dlen, dval = _decode_lut_cached(d_bits, d_vals)
        alen, aval = _decode_lut_cached(a_bits, a_vals)
        comp_tabs.append((dstep, dcoef, astep, arun, acoef,
                          dlen.tobytes(), dval.tobytes(),
                          alen.tobytes(), aval.tobytes()))
    planes = [np.zeros((n_mcu, 64), dtype=np.int32) for _ in range(nc)]
    pred = [0] * nc
    rst_iter = iter(rst_positions)
    next_rst = next(rst_iter, None)
    M64 = (1 << 64) - 1
    ifb = int.from_bytes
    buf = 0  # valid bits occupy [64 - nbits, 64)
    nbits = 0
    pos = 0

    for i in range(n_mcu):
        if restart_interval and i and i % restart_interval == 0:
            # byte-align and reset DC prediction at each restart
            buf, nbits = 0, 0
            if next_rst is not None:
                pos = next_rst
                next_rst = next(rst_iter, None)
            pred = [0] * nc
        for c in range(nc):
            (dstep, dcoef, astep, arun, acoef,
             dlen, dval, alen, aval) = comp_tabs[c]
            if nbits < 16:
                buf |= ifb(data_b[pos:pos + 4], "big") << (32 - nbits)
                pos += 4
                nbits += 32
            peek = buf >> 48
            st = dstep[peek]
            if st:
                buf = (buf << st) & M64
                nbits -= st
                pred[c] += dcoef[peek]
            else:  # slow path: code+value spill past the 16-bit window
                ln = dlen[peek]
                assert ln, "invalid DC Huffman code"
                cat = dval[peek]
                buf = (buf << ln) & M64
                nbits -= ln
                if cat:
                    if nbits < cat:
                        buf |= ifb(data_b[pos:pos + 4], "big") << (32 - nbits)
                        pos += 4
                        nbits += 32
                    v = buf >> (64 - cat)
                    buf = (buf << cat) & M64
                    nbits -= cat
                    pred[c] += v if v >= (1 << (cat - 1)) else v - (1 << cat) + 1
            blk = [0] * 64  # python-int staging row (faster than ndarray scatter)
            blk[0] = pred[c]
            k = 1
            while k < 64:
                if nbits < 16:
                    buf |= ifb(data_b[pos:pos + 4], "big") << (32 - nbits)
                    pos += 4
                    nbits += 32
                peek = buf >> 48
                st = astep[peek]
                if st:
                    buf = (buf << st) & M64
                    nbits -= st
                    run = arun[peek]
                    if run < 16:
                        k += run
                        if k < 64:
                            blk[k] = acoef[peek]
                        k += 1
                    elif run == 16:  # ZRL
                        k += 16
                    else:  # EOB
                        break
                else:
                    ln = alen[peek]
                    assert ln, "invalid AC Huffman code"
                    rs = aval[peek]
                    buf = (buf << ln) & M64
                    nbits -= ln
                    k += rs >> 4
                    cat = rs & 0x0F
                    if cat and k < 64:
                        if nbits < cat:
                            buf |= ifb(data_b[pos:pos + 4], "big") << (32 - nbits)
                            pos += 4
                            nbits += 32
                        v = buf >> (64 - cat)
                        buf = (buf << cat) & M64
                        nbits -= cat
                        blk[k] = v if v >= (1 << (cat - 1)) else v - (1 << cat) + 1
                    k += 1
            planes[c][i] = blk

    m = _dct8()
    ph, pw = mcu_h * 8, mcu_w * 8
    out_planes = []
    for c in range(nc):
        qid = comps[c][2]
        q = qtabs[qid].astype(np.float64).reshape(8, 8)
        blocks = planes[c][:, _UNZIGZAG].reshape(-1, 8, 8).astype(np.float64)
        blocks *= q[None, :, :]
        spat = np.einsum("ji,njk,kl->nil", m, blocks, m) + 128.0
        out_planes.append(_from_blocks(spat, ph, pw)[:h, :w])

    if nc == 1:
        g = np.clip(out_planes[0].round(), 0, 255).astype(np.uint8)
        return np.stack([g, g, g], axis=-1)
    ycc = np.stack(out_planes, axis=-1)
    return _ycbcr_to_rgb(ycc)
