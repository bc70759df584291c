import numpy as np
import pyarrow as pa
import pytest

from forum_dl_ray.images import (
    ImageDecodeStage,
    decode_image,
    encode_image,
    hamming64,
    phash64,
    psnr,
    synth_pixels,
)


def test_png_roundtrip_exact():
    px = synth_pixels("img-1", 48, 32)
    out = decode_image(encode_image(px, "png"))
    assert out.shape == (32, 48, 3)
    assert np.array_equal(px, out)


def test_fjpg_lossy_psnr_above_40db():
    px = synth_pixels("img-2", 64, 64)
    out = decode_image(encode_image(px, "jpeg"))
    p = psnr(px, out)
    assert 40.0 <= p < 60.0, p


def test_encode_deterministic():
    px = synth_pixels("img-3", 32, 32)
    assert encode_image(px, "png") == encode_image(px, "png")
    assert encode_image(px, "jpeg") == encode_image(px, "jpeg")
    assert np.array_equal(synth_pixels("img-3", 32, 32), px)


def test_unknown_format_raises_not_implemented():
    with pytest.raises(NotImplementedError):
        encode_image(synth_pixels("x", 8, 8), "webp")
    with pytest.raises(NotImplementedError):
        decode_image(b"RIFFxxxxWEBP", "webp")


def test_phash_similar_vs_different():
    a = synth_pixels("img-4", 64, 64)
    b = decode_image(encode_image(a, "jpeg"))  # lossy version of same image
    c = synth_pixels("img-other", 64, 64)
    assert hamming64(phash64(a), phash64(b)) <= 6
    assert hamming64(phash64(a), phash64(c)) > 10


def test_decode_stage_batch():
    rows = []
    for i in range(6):
        fmt = "png" if i % 2 == 0 else "jpeg"
        px = synth_pixels(f"s{i}", 24, 16)
        rows.append({"image_id": f"s{i}", "bytes": encode_image(px, fmt), "fmt": fmt})
    rows.append({"image_id": "bad", "bytes": b"garbage", "fmt": "png"})
    t = pa.table(
        {
            "image_id": [r["image_id"] for r in rows],
            "bytes": pa.array([r["bytes"] for r in rows], pa.binary()),
            "fmt": [r["fmt"] for r in rows],
        }
    )
    out = ImageDecodeStage()(t)
    assert out["decode_ok"].to_pylist() == [True] * 6 + [False]
    assert out["decoded_w"].to_pylist()[:6] == [24] * 6
    assert out["phash_computed"].to_pylist()[0] == phash64(synth_pixels("s0", 24, 16))
