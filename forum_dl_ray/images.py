"""Image payload codecs, perceptual hash, and map_batches stages.

The payload table shape is authoritative from BASELINE.json
``input_hint``: ``(image_id string, bytes binary, w int32, h int32,
fmt string, caption string, phash int64)``. The per-row oracle is
decoded-pixel allclose (PSNR >= 40 dB for lossy formats) + caption
equality.

No image libraries exist in this container (no PIL / imageio), so
both codecs are implemented here from their public specs:

- ``png`` is a REAL PNG codec (pure python: zlib + struct). The
  encoder emits 8-bit RGB filter-0 rows; the decoder handles all five
  scanline filters (None/Sub/Up/Average/Paeth) and color types
  0/2/4/6 at bit depth 8, so third-party 8-bit PNGs decode too.
- ``jpeg`` is a REAL baseline JPEG codec (ITU-T T.81 + JFIF,
  ``forum_dl_ray/jpeg.py``): Annex K tables, FDCT/IDCT, Huffman
  entropy coding, byte stuffing. Default quality 98 keeps the
  decoded-pixel PSNR >= 40 dB oracle satisfied with margin
  (measured ≈ 43.8 dB on the synthetic corpus). The round-4 ``FJPG``
  quantize+zlib stand-in remains decodable for old payloads.

The Ray-side plumbing (schemas, batch sizes, actor-pool stages) is
real and tested: decode/phash/resize run as vectorized-per-row kernels
inside ``map_batches`` callable classes with setup in ``__init__``.
"""

from __future__ import annotations

import hashlib
import struct
import zlib

import numpy as np
import pyarrow as pa

from .jpeg import JPEG_MAGIC, decode_jpeg, encode_jpeg

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
FJPG_MAGIC = b"FJPG"
_QUANT_SHIFT = 2  # 6-bit quantization → step 4 → PSNR ≈ 46.9 dB

# Bumped whenever encode_image output bytes change for the same
# pixels (fixture caches under /tmp/fdr_fixtures key on this through
# FixtureSpec.digest): v2 = real T.81 JPEG replaced the FJPG stand-in.
CODEC_VERSION = 2


# --------------------------------------------------------------------- codecs
def encode_png(pixels: np.ndarray) -> bytes:
    """Minimal PNG encoder: 8-bit RGB, no interlace, filter 0 rows."""
    h, w, c = pixels.shape
    assert c == 3 and pixels.dtype == np.uint8

    def chunk(tag: bytes, payload: bytes) -> bytes:
        return (
            struct.pack(">I", len(payload))
            + tag
            + payload
            + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)  # 8-bit, color type 2 (RGB)
    raw = np.concatenate(
        [np.zeros((h, 1), dtype=np.uint8), pixels.reshape(h, w * 3)], axis=1
    ).tobytes()
    return PNG_MAGIC + chunk(b"IHDR", ihdr) + chunk(b"IDAT", zlib.compress(raw, 6)) + chunk(b"IEND", b"")


_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}  # gray, RGB, gray+A, RGBA


def _png_unfilter_row(f: int, row: np.ndarray, prev: np.ndarray, bpp: int) -> np.ndarray:
    """One scanline of RFC 2083 §6 reconstruction (uint8 wraparound)."""
    if f == 0:
        return row
    if f == 2:  # Up
        return row + prev
    if f == 1:  # Sub: prefix sum per channel stride
        px = row.reshape(-1, bpp).astype(np.uint64)
        return (np.cumsum(px, axis=0) & 0xFF).astype(np.uint8).reshape(-1)
    out = np.empty_like(row)
    n = len(row)
    if f == 3:  # Average — sequential in x
        for i in range(n):
            left = int(out[i - bpp]) if i >= bpp else 0
            out[i] = (int(row[i]) + ((left + int(prev[i])) >> 1)) & 0xFF
        return out
    if f == 4:  # Paeth — sequential in x
        for i in range(n):
            a = int(out[i - bpp]) if i >= bpp else 0
            b = int(prev[i])
            c = int(prev[i - bpp]) if i >= bpp else 0
            p = a + b - c
            pa_, pb, pc_ = abs(p - a), abs(p - b), abs(p - c)
            pred = a if (pa_ <= pb and pa_ <= pc_) else (b if pb <= pc_ else c)
            out[i] = (int(row[i]) + pred) & 0xFF
        return out
    raise NotImplementedError(f"PNG filter type {f}")


def decode_png(data: bytes) -> np.ndarray:
    """Full 8-bit PNG decode: all five scanline filters, color types
    0/2/4/6 (gray / RGB / gray+alpha / RGBA; alpha dropped, gray
    replicated — the pipeline's pixel model is RGB). Interlace and
    sub-8-bit depths are rejected loudly."""
    assert data[:8] == PNG_MAGIC, "not a PNG"
    pos, w, h, idat, ctype = 8, 0, 0, b"", 2
    while pos < len(data):
        (length,) = struct.unpack_from(">I", data, pos)
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        if tag == b"IHDR":
            w, h, bit_depth, ctype, _comp, _filt, interlace = struct.unpack_from(
                ">IIBBBBB", payload, 0)
            assert bit_depth == 8, "8-bit channels only"
            assert ctype in _PNG_CHANNELS, f"color type {ctype} (palette?) unsupported"
            assert interlace == 0, "Adam7 interlace unsupported"
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
        pos += 12 + length
    bpp = _PNG_CHANNELS[ctype]
    try:
        flat = np.frombuffer(zlib.decompress(idat), dtype=np.uint8)
    except zlib.error as e:  # truncated/hostile IDAT → the documented error type
        raise ValueError(f"corrupt PNG IDAT stream: {e}") from e
    try:
        raw = flat.reshape(h, 1 + w * bpp)
    except ValueError as e:
        raise ValueError("PNG pixel data does not match IHDR dims") from e
    filters = raw[:, 0]
    px = np.zeros((h, w * bpp), dtype=np.uint8)
    if (filters == 0).all():  # this encoder's own output: zero-copy fast path
        px = raw[:, 1:]
    else:
        prev = np.zeros(w * bpp, dtype=np.uint8)
        for y in range(h):
            prev = _png_unfilter_row(int(filters[y]), raw[y, 1:].copy(), prev, bpp)
            px[y] = prev
    img = px.reshape(h, w, bpp)
    if ctype == 2:
        return img.copy()
    if ctype == 6:
        return img[:, :, :3].copy()
    gray = img[:, :, 0]
    return np.stack([gray, gray, gray], axis=-1)


def encode_fjpg(pixels: np.ndarray) -> bytes:
    """Deterministic lossy stand-in codec (see module docstring)."""
    h, w, c = pixels.shape
    assert c == 3 and pixels.dtype == np.uint8
    q = (pixels >> _QUANT_SHIFT).astype(np.uint8)
    return FJPG_MAGIC + struct.pack(">II", w, h) + zlib.compress(q.tobytes(), 6)


def decode_fjpg(data: bytes) -> np.ndarray:
    assert data[:4] == FJPG_MAGIC, "not an FJPG payload"
    w, h = struct.unpack_from(">II", data, 4)
    q = np.frombuffer(zlib.decompress(data[12:]), dtype=np.uint8).reshape(h, w, 3)
    # reconstruct at the quantization midpoint
    return ((q.astype(np.uint16) << _QUANT_SHIFT) + (1 << (_QUANT_SHIFT - 1))).clip(0, 255).astype(np.uint8)


def encode_image(pixels: np.ndarray, fmt: str) -> bytes:
    if fmt == "png":
        return encode_png(pixels)
    if fmt == "jpeg":
        return encode_jpeg(pixels)
    if fmt == "gif":
        from .gif import encode_gif

        return encode_gif(pixels)
    raise NotImplementedError(f"format {fmt!r}: no codec for this format in this container")


def decode_image(data: bytes, fmt: str | None = None) -> np.ndarray:
    if data[:8] == PNG_MAGIC:
        return decode_png(data)
    if data[:2] == JPEG_MAGIC:
        return decode_jpeg(data)
    if data[:4] == b"GIF8":
        from .gif import decode_gif

        return decode_gif(data)
    if data[:4] == FJPG_MAGIC:  # round-4 stand-in payloads stay readable
        return decode_fjpg(data)
    raise NotImplementedError(f"format {fmt!r}: unknown magic; no codec for this format")


# ------------------------------------------------------------------- measures
def psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return float("inf")
    return float(10.0 * np.log10(255.0**2 / mse))


_DCT32 = None


def _dct_matrix(n: int = 32) -> np.ndarray:
    global _DCT32
    if _DCT32 is None:
        k = np.arange(n)[:, None]
        x = np.arange(n)[None, :]
        m = np.cos(np.pi * (2 * x + 1) * k / (2 * n)) * np.sqrt(2.0 / n)
        m[0] /= np.sqrt(2.0)
        _DCT32 = m
    return _DCT32


def resize_nearest(pixels: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    h, w = pixels.shape[:2]
    yi = (np.arange(out_h) * h // out_h).clip(0, h - 1)
    xi = (np.arange(out_w) * w // out_w).clip(0, w - 1)
    return pixels[yi][:, xi]


def phash64(pixels: np.ndarray) -> int:
    """64-bit DCT perceptual hash (pHash family): gray → 32x32 →
    DCT-II → top-left 8x8 (skipping DC) vs median → bits."""
    gray = pixels.astype(np.float64).mean(axis=2)
    small = resize_nearest(gray, 32, 32)
    m = _dct_matrix(32)
    d = m @ small @ m.T
    block = d[:8, :8].flatten()[1:]  # drop DC
    med = np.median(block)
    bits = block > med
    v = 0
    for b in bits:
        v = (v << 1) | int(b)
    # include the dropped-DC bit position as 0 → 63 data bits is fine;
    # interpret as signed int64 for Arrow
    return v - (1 << 63) if v >= (1 << 63) else v


def hamming64(a: int, b: int) -> int:
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


def synth_pixels(image_id: str, w: int, h: int) -> np.ndarray:
    """Deterministic seeded image: gradient + PRNG noise keyed on id."""
    seed = int.from_bytes(hashlib.blake2b(image_id.encode(), digest_size=8).digest(), "little")
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    base = np.stack(
        [
            (xx * 255 // max(1, w - 1)),
            (yy * 255 // max(1, h - 1)),
            ((xx + yy) * 255 // max(1, w + h - 2)),
        ],
        axis=2,
    ).astype(np.int16)
    noise = rng.integers(-24, 25, size=(h, w, 3), dtype=np.int16)
    return (base + noise).clip(0, 255).astype(np.uint8)


# ------------------------------------------------- map_batches stage classes
class ImageDecodeStage:
    """Actor-pool stage: (bytes, fmt) → decoded dims + phash (+ optional
    pixel column). Batch format pyarrow; per-row decode is unavoidable
    (codecs are per-payload), but setup cost lives in __init__ and the
    output assembly is columnar. Keep batch_size small: rows are wide
    binary (SURVEY.md §7.4 'wide binary rows')."""

    def __init__(self, emit_pixels: bool = False):
        _dct_matrix(32)  # precompute once per actor
        self.emit_pixels = emit_pixels

    def __call__(self, batch: pa.Table) -> pa.Table:
        data = batch["bytes"].to_pylist()
        fmts = batch["fmt"].to_pylist()
        ws, hs, hashes, ok = [], [], [], []
        pix_out = []
        for raw, fmt in zip(data, fmts):
            try:
                px = decode_image(raw, fmt)
                ws.append(px.shape[1])
                hs.append(px.shape[0])
                hashes.append(phash64(px))
                ok.append(True)
                if self.emit_pixels:
                    pix_out.append(px.tobytes())
            except Exception:
                ws.append(0)
                hs.append(0)
                hashes.append(0)
                ok.append(False)
                if self.emit_pixels:
                    pix_out.append(b"")
        out = batch.drop_columns([c for c in ("decoded_w", "decoded_h", "phash_computed", "decode_ok") if c in batch.column_names])
        out = (
            out.append_column("decoded_w", pa.array(ws, pa.int32()))
            .append_column("decoded_h", pa.array(hs, pa.int32()))
            .append_column("phash_computed", pa.array(hashes, pa.int64()))
            .append_column("decode_ok", pa.array(ok, pa.bool_()))
        )
        if self.emit_pixels:
            out = out.append_column("pixels_rgb", pa.array(pix_out, pa.large_binary()))
        return out


class ImageStatsStage:
    """Stateless-style feature kernel over decoded payloads: per-channel
    mean/std (vectorized per row). Placeholder for model feature
    extraction; the plumbing (actor pool, arrow batches) is the point."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        means, stds = [], []
        for raw, fmt in zip(batch["bytes"].to_pylist(), batch["fmt"].to_pylist()):
            px = decode_image(raw, fmt).astype(np.float32)
            means.append(px.mean(axis=(0, 1)).tolist())
            stds.append(px.std(axis=(0, 1)).tolist())
        return batch.append_column(
            "chan_mean", pa.array(means, pa.list_(pa.float32()))
        ).append_column("chan_std", pa.array(stds, pa.list_(pa.float32())))
