"""Real baseline-JPEG codec tests (forum_dl_ray/jpeg.py).

No reference JPEG library exists in this container, so conformance is
self-verified: structural marker checks against the T.81/JFIF layout,
PSNR oracles (BASELINE.json input_hint: lossy formats must decode
within PSNR >= 40 dB), determinism, and property tests over random
images (exercises 0xFF byte stuffing and every (run, size) path
statistically)."""

import struct

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from forum_dl_ray.images import psnr, synth_pixels
from forum_dl_ray.jpeg import decode_jpeg, encode_jpeg


def _psnr_roundtrip(px: np.ndarray, quality: int = 98) -> float:
    out = decode_jpeg(encode_jpeg(px, quality=quality))
    assert out.shape == px.shape
    return psnr(px, out)


@pytest.mark.parametrize("w,h", [(8, 8), (24, 64), (64, 24), (17, 9), (1, 1), (9, 8), (40, 40)])
def test_roundtrip_psnr(w, h):
    px = synth_pixels(f"jpeg-{w}x{h}", w, h)
    assert _psnr_roundtrip(px) >= 40.0


def test_deterministic():
    px = synth_pixels("jpeg-det", 32, 24)
    assert encode_jpeg(px) == encode_jpeg(px)


def test_marker_structure():
    px = synth_pixels("jpeg-markers", 30, 22)
    data = encode_jpeg(px)
    assert data[:2] == b"\xff\xd8" and data[-2:] == b"\xff\xd9"
    assert data[2:4] == b"\xff\xe0" and data[6:11] == b"JFIF\x00"
    # walk the marker segments up to SOS; collect what we saw
    pos, seen = 2, set()
    while pos < len(data):
        assert data[pos] == 0xFF
        marker = data[pos + 1]
        seen.add(marker)
        if marker == 0xDA:
            (ln,) = struct.unpack_from(">H", data, pos + 2)
            pos += 2 + ln
            break
        (ln,) = struct.unpack_from(">H", data, pos + 2)
        if marker == 0xC0:  # SOF0 carries the true dims pre-padding
            prec, h, w, nc = struct.unpack_from(">BHHB", data, pos + 4)
            assert (prec, h, w, nc) == (8, 22, 30, 3)
        pos += 2 + ln
    assert {0xE0, 0xDB, 0xC0, 0xC4, 0xDA} <= seen
    # exactly two DQT payload tables and four DHT tables
    assert data.count(b"\xff\xdb") >= 2 or data.count(b"\xff\xdb") == 2


def test_byte_stuffing_roundtrip():
    # an all-extreme image produces long runs that hit 0xFF scan bytes
    px = np.zeros((32, 32, 3), dtype=np.uint8)
    px[::2] = 255
    data = encode_jpeg(px)
    body = data[2:-2]
    assert b"\xff\x00" in body, "expected stuffed 0xFF in entropy data"
    out = decode_jpeg(data)
    assert psnr(px, out) >= 30.0  # hard pattern; just must decode sanely


def test_flat_image_high_psnr():
    px = np.full((16, 16, 3), 127, dtype=np.uint8)
    assert _psnr_roundtrip(px) >= 50.0


def test_quality_ladder_monotone_size():
    px = synth_pixels("jpeg-ladder", 48, 48)
    sizes = [len(encode_jpeg(px, quality=q)) for q in (30, 60, 98)]
    assert sizes[0] < sizes[2], "higher quality must not shrink the file"
    assert _psnr_roundtrip(px, quality=30) < _psnr_roundtrip(px, quality=98)


def test_non_multiple_of_8_edge_padding_not_visible():
    px = synth_pixels("jpeg-pad", 13, 11)
    out = decode_jpeg(encode_jpeg(px))
    assert out.shape == (11, 13, 3)
    assert psnr(px, out) >= 40.0


@settings(max_examples=25, deadline=None)
@given(
    w=st.integers(min_value=1, max_value=40),
    h=st.integers(min_value=1, max_value=40),
    seed=st.integers(min_value=0, max_value=2**31),
)
def test_roundtrip_property(w, h, seed):
    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(px))
    assert out.shape == (h, w, 3)
    # pure-noise images are the worst case for a DCT codec; the Annex K
    # tables at q92 still keep quantization error bounded
    assert psnr(px, out) >= 30.0


def test_decode_rejects_subsampled_sof():
    px = synth_pixels("jpeg-sub", 16, 16)
    data = bytearray(encode_jpeg(px))
    # find SOF0 and flip component 1's sampling byte to 0x22 (2x2)
    i = data.index(b"\xff\xc0")
    data[i + 11] = 0x22
    with pytest.raises(NotImplementedError):
        decode_jpeg(bytes(data))


def test_decode_rejects_progressive_sof():
    px = synth_pixels("jpeg-prog", 16, 16)
    data = bytearray(encode_jpeg(px))
    i = data.index(b"\xff\xc0")
    data[i + 1] = 0xC2  # pretend progressive
    with pytest.raises(NotImplementedError):
        decode_jpeg(bytes(data))


def test_decode_skips_app_and_com_segments():
    px = synth_pixels("jpeg-app", 12, 12)
    data = encode_jpeg(px)
    # splice an APP1 and a COM segment after APP0
    app1 = b"\xff\xe1" + struct.pack(">H", 8) + b"Exif\x00\x00"
    com = b"\xff\xfe" + struct.pack(">H", 7) + b"hello"
    j = 4 + struct.unpack_from(">H", data, 4)[0]  # end of APP0
    spliced = data[:j] + app1 + com + data[j:]
    assert psnr(px, decode_jpeg(spliced)) >= 40.0


@pytest.mark.parametrize("interval", [1, 3, 7])
def test_restart_markers_roundtrip(interval):
    """DRI + RSTn emission (T.81 B.2.4.4) must decode to EXACTLY the
    same pixels as the plain stream — restart changes framing, not
    coefficients. Exercises the decoder's resync/slow-destuff path."""
    px = synth_pixels(f"jpeg-rst-{interval}", 26, 19)
    plain = encode_jpeg(px)
    rst = encode_jpeg(px, restart_interval=interval)
    assert b"\xff\xdd" in rst and any(bytes([0xFF, 0xD0 + m]) in rst for m in range(8))
    assert np.array_equal(decode_jpeg(rst), decode_jpeg(plain))
