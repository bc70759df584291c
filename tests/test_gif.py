"""GIF codec: LZW roundtrips, interlace, transparency, extensions,
and the decode_image dispatch (forum avatars/smilies are GIFs; the
asset stage must decode them like any other payload)."""

import os
import struct
import sys

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from forum_dl_ray.gif import _INTERLACE_PASSES, decode_gif, encode_gif
from forum_dl_ray.images import decode_image, encode_image


def _rand_paletted(rng, h, w, n_colors):
    pal = rng.integers(0, 256, size=(n_colors, 3)).astype(np.uint8)
    return pal[rng.integers(0, n_colors, size=(h, w))]


def test_roundtrip_small_palette():
    rng = np.random.default_rng(1)
    px = _rand_paletted(rng, 20, 30, 4)
    assert np.array_equal(decode_gif(encode_gif(px)), px)


def test_roundtrip_full_palette_and_code_growth():
    """256 colors over 200x200 noise forces 12-bit LZW codes and a
    mid-stream CLEAR — the encoder/decoder width bookkeeping must stay
    bit-exactly in sync through both."""
    rng = np.random.default_rng(2)
    px = _rand_paletted(rng, 200, 200, 256)
    assert np.array_equal(decode_gif(encode_gif(px)), px)


@settings(max_examples=20, deadline=None)
@given(st.integers(1, 40), st.integers(1, 40), st.integers(2, 256), st.integers(0))
def test_roundtrip_property(h, w, n_colors, seed):
    rng = np.random.default_rng(seed)
    px = _rand_paletted(rng, h, w, n_colors)
    assert np.array_equal(decode_gif(encode_gif(px)), px)


def test_encoder_rejects_true_color():
    grad = np.zeros((32, 32, 3), dtype=np.uint8)
    grad[:, :, 0] = np.arange(32)[:, None] * 8
    grad[:, :, 1] = np.arange(32)[None, :] * 8
    grad[:, :, 2] = (np.arange(32)[:, None] + np.arange(32)[None, :]) * 4
    with pytest.raises(ValueError):
        encode_gif(grad)


def test_decode_interlaced():
    """Re-order an encoded frame's rows per the four-pass interlace
    schedule, set the interlace flag, and the decoder must undo it."""
    rng = np.random.default_rng(3)
    px = _rand_paletted(rng, 23, 11, 8)  # odd height crosses pass bounds
    data = bytearray(encode_gif(px))
    # find the image descriptor (0x2C after the 13-byte header + GCT)
    flags = data[10]
    gct_len = (2 << (flags & 0x07)) * 3
    desc_at = 13 + gct_len
    assert data[desc_at] == 0x2C
    # rebuild the frame with rows permuted into interlace file order
    h, w = px.shape[:2]
    order = []
    for start, step in _INTERLACE_PASSES:
        order.extend(range(start, h, step))
    inter = px[np.array(order)]
    # encode the permuted rows, then flip the interlace bit
    redata = bytearray(encode_gif(inter))
    re_desc = 13 + (2 << (redata[10] & 0x07)) * 3
    # descriptor: 2C | left(2) top(2) w(2) h(2) flags(1)
    redata[re_desc + 9] |= 0x40
    out = decode_gif(bytes(redata))
    assert np.array_equal(out, px)


def test_decode_transparency_and_extensions():
    """A GIF89a graphic-control extension with a transparent index:
    transparent pixels show the logical-screen background; unknown
    extension blocks are skipped."""
    pal = np.array([[10, 20, 30], [200, 0, 0]], dtype=np.uint8)
    px = pal[np.array([[0, 1], [1, 0]])]
    base = encode_gif(px)
    flags = base[10]
    gct_end = 13 + (2 << (flags & 0x07)) * 3
    # inject: comment ext + graphic control ext marking index 0 transparent
    comment = b"\x21\xfe\x03abc\x00"
    gce = b"\x21\xf9\x04\x01\x00\x00\x00\x00"
    data = base[:gct_end] + comment + gce + base[gct_end:]
    out = decode_gif(data)
    # background index defaults to 0 -> transparent pixels = palette[0]
    # composited over a screen prefilled with palette[bg=0]
    want = px.copy()
    assert np.array_equal(out, want)


def test_decode_image_sniffs_gif():
    rng = np.random.default_rng(4)
    px = _rand_paletted(rng, 12, 12, 5)
    data = encode_image(px, "gif")
    assert data[:6] in (b"GIF89a", b"GIF87a")
    assert np.array_equal(decode_image(data), px)


def test_truncated_stream_tolerated():
    rng = np.random.default_rng(5)
    px = _rand_paletted(rng, 30, 30, 16)
    data = encode_gif(px)
    # chop the last data sub-block short (keep structure parseable)
    cut = data[: len(data) - 12] + b"\x00\x3b"
    try:
        out = decode_gif(cut)
        assert out.shape == px.shape
    except ValueError:
        pass  # corrupt-stream rejection is also acceptable


def test_decode_clips_oversize_frame_rect():
    """Frames whose descriptor rect runs past the logical screen are
    clipped (browser behavior), not a numpy broadcast error."""
    rng = np.random.default_rng(8)
    px = _rand_paletted(rng, 10, 10, 4)
    data = bytearray(encode_gif(px))
    # shrink the logical screen to 6x7 while the frame stays 10x10
    struct.pack_into("<HH", data, 6, 7, 6)
    out = decode_gif(bytes(data))
    assert out.shape == (6, 7, 3)
    assert np.array_equal(out, px[:6, :7])


def test_asset_stage_ingests_gif_payload():
    """The crawl's S8 asset kernel (fetched bytes → payload-table row
    with dims+phash) must handle a .gif URL like any png/jpeg."""
    import pyarrow as pa

    from forum_dl_ray.crawl.assets import asset_batch
    from forum_dl_ray.images import phash64

    rng = np.random.default_rng(9)
    px = _rand_paletted(rng, 21, 34, 12)
    body = encode_gif(px)
    batch = pa.table({
        "url": pa.array(["http://a.test/img/av0001.gif"], pa.string()),
        "body": pa.array([body], pa.binary()),
        "status": pa.array([200], pa.int32()),
        "title": pa.array(["a caption"], pa.string()),
    })
    out = asset_batch(batch).to_pylist()
    assert len(out) == 1
    row = out[0]
    assert (row["w"], row["h"], row["fmt"]) == (34, 21, "gif")
    assert row["phash"] == phash64(px)  # 63 data bits -> int64-safe
    assert row["bytes"] == body


def test_phash_pipeline_handles_gif():
    """The asset-stage contract: dims + phash from any decodable
    payload, GIF included."""
    from forum_dl_ray.images import phash64

    rng = np.random.default_rng(6)
    px = _rand_paletted(rng, 48, 36, 32)
    out = decode_image(encode_gif(px), "gif")
    assert out.shape == (48, 36, 3)
    assert isinstance(phash64(out), int)
