"""PNG decoder coverage beyond this repo's own filter-0 encoder:
all five RFC 2083 scanline filters and color types 0/2/4/6, verified
against an independent forward-filter implementation written here
(decode must invert it exactly — PNG is lossless)."""

import struct
import zlib

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from forum_dl_ray.images import PNG_MAGIC, decode_png, synth_pixels


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (struct.pack(">I", len(payload)) + tag + payload
            + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF))


def _filter_row(f: int, row: np.ndarray, prev: np.ndarray, bpp: int) -> np.ndarray:
    """Forward filter per RFC 2083 §6 — written independently of the
    decoder (operates on ORIGINAL bytes, unlike reconstruction)."""
    row = row.astype(np.int32)
    prev = prev.astype(np.int32)
    left = np.zeros_like(row)
    left[bpp:] = row[:-bpp]
    upleft = np.zeros_like(prev)
    upleft[bpp:] = prev[:-bpp]
    if f == 0:
        out = row
    elif f == 1:
        out = row - left
    elif f == 2:
        out = row - prev
    elif f == 3:
        out = row - ((left + prev) >> 1)
    elif f == 4:
        p = left + prev - upleft
        pa, pb, pc = np.abs(p - left), np.abs(p - prev), np.abs(p - upleft)
        pred = np.where((pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prev, upleft))
        out = row - pred
    else:
        raise ValueError(f)
    return (out & 0xFF).astype(np.uint8)


def _make_png(pixels: np.ndarray, ctype: int, filters: list[int]) -> bytes:
    h, w = pixels.shape[:2]
    bpp = {0: 1, 2: 3, 4: 2, 6: 4}[ctype]
    flat = pixels.reshape(h, w * bpp)
    rows = []
    prev = np.zeros(w * bpp, dtype=np.uint8)
    for y in range(h):
        f = filters[y % len(filters)]
        rows.append(bytes([f]) + _filter_row(f, flat[y], prev, bpp).tobytes())
        prev = flat[y]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return (PNG_MAGIC + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(b"".join(rows), 6))
            + _chunk(b"IEND", b""))


@pytest.mark.parametrize("f", [0, 1, 2, 3, 4])
def test_single_filter_rgb(f):
    px = synth_pixels(f"pngf-{f}", 21, 13)
    out = decode_png(_make_png(px, 2, [f]))
    assert np.array_equal(out, px)


def test_mixed_filters_rgb():
    px = synth_pixels("pngf-mix", 33, 17)
    out = decode_png(_make_png(px, 2, [0, 1, 2, 3, 4]))
    assert np.array_equal(out, px)


def test_grayscale():
    g = synth_pixels("pngf-gray", 19, 11)[:, :, 0:1]
    out = decode_png(_make_png(g, 0, [1, 4, 2]))
    assert np.array_equal(out, np.repeat(g, 3, axis=2))


def test_gray_alpha_drops_alpha():
    base = synth_pixels("pngf-ga", 9, 7)
    ga = np.stack([base[:, :, 0], base[:, :, 1]], axis=-1)
    out = decode_png(_make_png(ga, 4, [3, 4]))
    assert np.array_equal(out, np.repeat(ga[:, :, 0:1], 3, axis=2))


def test_rgba_drops_alpha():
    base = synth_pixels("pngf-rgba", 14, 10)
    rgba = np.concatenate([base, base[:, :, 0:1]], axis=2)
    out = decode_png(_make_png(rgba, 6, [4, 1, 3]))
    assert np.array_equal(out, base)


def test_multiple_idat_chunks():
    px = synth_pixels("pngf-idat", 16, 16)
    data = _make_png(px, 2, [4])
    # split the single IDAT into two chunks
    i = data.index(b"IDAT") - 4
    (ln,) = struct.unpack_from(">I", data, i)
    payload = data[i + 8 : i + 8 + ln]
    rest = data[i + 12 + ln:]
    half = ln // 2
    rebuilt = data[:i] + _chunk(b"IDAT", payload[:half]) + _chunk(b"IDAT", payload[half:]) + rest
    assert np.array_equal(decode_png(rebuilt), px)


def test_rejects_interlace_and_palette():
    px = synth_pixels("pngf-rej", 8, 8)
    data = bytearray(_make_png(px, 2, [0]))
    ih = data.index(b"IHDR") + 4
    data[ih + 12] = 1  # interlace flag
    with pytest.raises(AssertionError):
        decode_png(bytes(data))
    data[ih + 12] = 0
    data[ih + 9] = 3  # palette color type
    with pytest.raises(AssertionError):
        decode_png(bytes(data))


@settings(max_examples=20, deadline=None)
@given(
    w=st.integers(min_value=1, max_value=24),
    h=st.integers(min_value=1, max_value=24),
    seed=st.integers(min_value=0, max_value=2**31),
    ctype=st.sampled_from([0, 2, 4, 6]),
)
def test_filter_property(w, h, seed, ctype):
    rng = np.random.default_rng(seed)
    bpp = {0: 1, 2: 3, 4: 2, 6: 4}[ctype]
    px = rng.integers(0, 256, size=(h, w, bpp), dtype=np.uint8)
    filters = [int(rng.integers(0, 5)) for _ in range(h)]
    out = decode_png(_make_png(px, ctype, filters))
    if ctype == 2:
        assert np.array_equal(out, px)
    elif ctype == 6:
        assert np.array_equal(out, px[:, :, :3])
    else:
        assert np.array_equal(out, np.repeat(px[:, :, 0:1], 3, axis=2))
