"""RIFF media codecs (WAV PCM + AVI/MJPEG) and the real-payload media
tables behind the audio/video multimodal ops.

The round-5 upgrade these pin: `ops/audio_ops.py` and the video
sampler in `ops/images_ops.py` no longer run a deterministic fake —
they parse genuine RIFF containers (`forum_dl_ray/riffav.py`), with
AVI frames going through the repo's real baseline JPEG decoder."""

import os
import struct
import sys

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from forum_dl_ray import riffav
from forum_dl_ray.images import synth_pixels


def _psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = float(np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2))
    return 10 * np.log10(255 * 255 / max(mse, 1e-12))


# ---------------------------------------------------------------------- WAV
def test_wav_roundtrip_mono():
    pcm = (np.sin(np.arange(3001) * 0.07) * 21000).astype(np.int16)
    out, rate = riffav.decode_wav(riffav.encode_wav(pcm, 8000))
    assert rate == 8000
    assert out.shape == (3001, 1)
    assert np.array_equal(out[:, 0], pcm)


def test_wav_roundtrip_stereo():
    rng = np.random.default_rng(7)
    pcm = rng.integers(-32768, 32768, size=(500, 2), dtype=np.int16)
    out, rate = riffav.decode_wav(riffav.encode_wav(pcm, 44100))
    assert rate == 44100
    assert np.array_equal(out, pcm)


@settings(max_examples=25, deadline=None)
@given(st.integers(1, 400), st.integers(1, 3), st.integers(1))
def test_wav_roundtrip_property(n, ch, seed):
    rng = np.random.default_rng(seed)
    pcm = rng.integers(-32768, 32768, size=(n, ch), dtype=np.int16)
    out, rate = riffav.decode_wav(riffav.encode_wav(pcm, 16000))
    assert rate == 16000 and np.array_equal(out, pcm)


def test_wav_8bit_and_unknown_chunks():
    """8-bit unsigned samples map to int16 around the 128 midpoint;
    unknown chunks (JUNK/LIST) and odd-size padding are skipped per
    the RIFF rules."""
    u8 = np.array([0, 128, 255], dtype=np.uint8)
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 8000, 1, 8)
    body = (b"WAVE"
            + riffav._chunk(b"JUNK", b"xyz")  # odd size -> pad byte
            + riffav._chunk(b"fmt ", fmt)
            + riffav._chunk(b"LIST", b"INFOabcd")
            + riffav._chunk(b"data", u8.tobytes()))
    out, rate = riffav.decode_wav(riffav._chunk(b"RIFF", body))
    assert rate == 8000
    assert out[:, 0].tolist() == [-32768, 0, 32512]


def test_wav_extensible_pcm_guid():
    """WAVE_FORMAT_EXTENSIBLE with the PCM subformat GUID decodes as
    plain PCM (the canonical >2-channel layout)."""
    pcm = np.arange(-50, 50, dtype=np.int16).reshape(-1, 2)
    ext = struct.pack("<HHIIHH", 0xFFFE, 2, 8000, 32000, 4, 16)
    ext += struct.pack("<HHI", 22, 16, 0x3) + riffav._PCM_GUID
    body = (b"WAVE" + riffav._chunk(b"fmt ", ext)
            + riffav._chunk(b"data", pcm.tobytes()))
    out, rate = riffav.decode_wav(riffav._chunk(b"RIFF", body))
    assert np.array_equal(out, pcm)


def test_wav_rejects_non_wav_and_compressed():
    with pytest.raises(ValueError):
        riffav.decode_wav(b"not riff at all")
    pcm = np.zeros(10, dtype=np.int16)
    fmt = struct.pack("<HHIIHH", 7, 1, 8000, 8000, 1, 8)  # mu-law tag
    body = (b"WAVE" + riffav._chunk(b"fmt ", fmt)
            + riffav._chunk(b"data", pcm.tobytes()))
    with pytest.raises(ValueError):
        riffav.decode_wav(riffav._chunk(b"RIFF", body))


def test_sniff():
    pcm = np.zeros(4, dtype=np.int16)
    assert riffav.sniff(riffav.encode_wav(pcm, 8000)) == "wav"
    avi = riffav.encode_avi_mjpeg([synth_pixels("s", 16, 16)], fps=10)
    assert riffav.sniff(avi) == "avi"
    assert riffav.sniff(b"\x89PNG\r\n\x1a\n") is None
    assert riffav.sniff(b"RIFF\x00\x00\x00\x00XXXX") is None


# ----------------------------------------------------------------- AVI/MJPG
def test_avi_roundtrip_frames_fps_psnr():
    frames = [synth_pixels(f"av-f{i}", 40, 24) for i in range(6)]
    avi = riffav.encode_avi_mjpeg(frames, fps=25)
    dec, fps = riffav.decode_avi_mjpeg(avi)
    assert fps == 25 and len(dec) == 6
    for a, b in zip(frames, dec):
        assert b.shape == a.shape
        assert _psnr(a, b) >= 40  # the BASELINE.json lossy-payload gate


def test_avi_rejects_non_avi_and_empty():
    with pytest.raises(ValueError):
        riffav.decode_avi_mjpeg(b"RIFF\x04\x00\x00\x00WAVE")
    # structurally valid AVI with no movi frames
    hdrl = riffav._list(b"hdrl", riffav._chunk(b"avih", b"\x00" * 56))
    body = b"AVI " + hdrl + riffav._chunk(b"LIST", b"movi")
    with pytest.raises(ValueError):
        riffav.decode_avi_mjpeg(riffav._chunk(b"RIFF", body))


def test_avi_idx1_offsets_match_movi_chunks():
    """idx1 entries must point at each '00dc' header relative to the
    'movi' fourcc — the convention real players rely on."""
    frames = [synth_pixels(f"ix-f{i}", 16, 16) for i in range(3)]
    data = riffav.encode_avi_mjpeg(frames, fps=10)
    # locate movi list payload + idx1 chunk
    movi_at = data.find(b"movi")
    idx_at = data.find(b"idx1")
    (idx_size,) = struct.unpack_from("<I", data, idx_at + 4)
    n = idx_size // 16
    assert n == 3
    for i in range(n):
        cc, flags, off, size = struct.unpack_from(
            "<4sIII", data, idx_at + 8 + 16 * i)
        assert cc == b"00dc" and flags == riffav._AVIIF_KEYFRAME
        at = movi_at + off
        assert data[at:at + 4] == b"00dc"
        (csize,) = struct.unpack_from("<I", data, at + 4)
        assert csize == size


# ------------------------------------------------------------- media tables
def test_media_fixture_deterministic(tmp_path):
    from forum_dl_ray.fixtures import media

    d1 = media.media_fixture_dir(str(tmp_path / "a"))
    d2 = media.media_fixture_dir(str(tmp_path / "b"))
    for name in ("audio.parquet", "video.parquet"):
        b1 = open(os.path.join(d1, name), "rb").read()
        b2 = open(os.path.join(d2, name), "rb").read()
        assert b1 == b2, name


def test_media_tables_metadata_consistent():
    import pyarrow.parquet as pq

    from forum_dl_ray.fixtures.media import audio_table_path, video_table_path

    a = pq.read_table(audio_table_path()).to_pylist()
    assert len(a) >= 100
    for row in a[:20]:
        pcm, rate = riffav.decode_wav(row["bytes"])
        assert pcm.shape == (row["n_samples"], row["channels"])
        assert rate == row["rate"]
    v = pq.read_table(video_table_path()).to_pylist()
    assert len(v) >= 20
    fps_seen = set()
    for row in v[:10]:
        frames, fps = riffav.decode_avi_mjpeg(row["bytes"])
        assert len(frames) == row["n_frames"] and fps == row["fps"]
        assert frames[0].shape == (row["h"], row["w"], 3)
        fps_seen.add(fps)
    assert len(fps_seen) > 1  # rates genuinely vary across payloads


# ----------------------------------------------------- stage-level real path
def test_video_stage_decodes_real_avi_with_fidelity():
    """The sampler stage demuxes a real AVI and the decoded frames
    match the original synth pixels at the PSNR gate; timestamps come
    from the container's own rate, not the fallback interval."""
    import pyarrow as pa

    from forum_dl_ray.images import decode_image
    from forum_dl_ray.ops.images_ops import VideoFrameSampleStage

    frames = [synth_pixels(f"vs-f{i}", 32, 24) for i in range(4)]
    avi = riffav.encode_avi_mjpeg(frames, fps=20)
    batch = pa.table({
        "media_id": pa.array(["m0"], pa.string()),
        "bytes": pa.array([avi], pa.binary()),
        "n_frames": pa.array([4], pa.int32()),
        "w": pa.array([32], pa.int32()),
        "h": pa.array([24], pa.int32()),
    })
    out = VideoFrameSampleStage()(batch).to_pylist()
    assert [r["frame_idx"] for r in out] == [0, 1, 2, 3]
    assert [r["ts_ms"] for r in out] == [0, 50, 100, 150]  # 20 fps
    for r, src in zip(out, frames):
        px = decode_image(r["frame_png"], "png")
        assert _psnr(src, px) >= 40


def test_video_stage_raises_on_metadata_mismatch():
    import pyarrow as pa

    from forum_dl_ray.ops.images_ops import VideoFrameSampleStage

    avi = riffav.encode_avi_mjpeg([synth_pixels("mm", 16, 16)], fps=10)
    batch = pa.table({
        "media_id": pa.array(["m0"], pa.string()),
        "bytes": pa.array([avi], pa.binary()),
        "n_frames": pa.array([3], pa.int32()),  # wrong on purpose
        "w": pa.array([16], pa.int32()),
        "h": pa.array([16], pa.int32()),
    })
    with pytest.raises(AssertionError):
        VideoFrameSampleStage()(batch)


def test_decode_pcm_total_over_unparseable_wavs():
    """The stage contract is totality: WAVE-shaped payloads the parser
    can't handle (float tag, zero channels) fall back to the
    deterministic fake instead of killing the actor task."""
    import struct

    from forum_dl_ray.ops.audio_ops import _fake_pcm, decode_pcm

    # IEEE-float WAV (tag 3)
    fmt = struct.pack("<HHIIHH", 3, 1, 8000, 32000, 4, 32)
    body = (b"WAVE" + riffav._chunk(b"fmt ", fmt)
            + riffav._chunk(b"data", b"\x00" * 64))
    flt = riffav._chunk(b"RIFF", body)
    pcm, rate = decode_pcm("m1", flt)
    assert np.array_equal(pcm, _fake_pcm("m1", flt))
    # zero-channel WAV raises ValueError from the codec...
    fmt0 = struct.pack("<HHIIHH", 1, 0, 8000, 0, 0, 16)
    body0 = (b"WAVE" + riffav._chunk(b"fmt ", fmt0)
             + riffav._chunk(b"data", b"\x00" * 8))
    bad = riffav._chunk(b"RIFF", body0)
    with pytest.raises(ValueError):
        riffav.decode_wav(bad)
    # ...and decode_pcm still falls back
    pcm2, _ = decode_pcm("m2", bad)
    assert np.array_equal(pcm2, _fake_pcm("m2", bad))


def test_video_stage_falls_back_on_undecodable_avi():
    """An AVI container whose stream isn't baseline MJPEG must take
    the deterministic fallback, not crash the stage."""
    import pyarrow as pa

    from forum_dl_ray.ops.images_ops import VideoFrameSampleStage

    hdrl = riffav._list(b"hdrl", riffav._chunk(b"avih", b"\x00" * 56))
    movi = riffav._chunk(b"LIST", b"movi" + riffav._chunk(b"00dc", b"\x00\x01notjpeg"))
    bad_avi = riffav._chunk(b"RIFF", b"AVI " + hdrl + movi)
    batch = pa.table({
        "media_id": pa.array(["m0"], pa.string()),
        "bytes": pa.array([bad_avi], pa.binary()),
    })
    out = VideoFrameSampleStage()(batch).to_pylist()
    assert len(out) >= 1  # fallback plan rows, stage survived


def test_audio_invariants_hold_at_non_fixture_rate():
    """A 16 kHz WAV is internally consistent: duration_ok must check
    against the DECODED rate, with the rate pin living in meta_ok."""
    import pyarrow as pa

    from forum_dl_ray.ops.audio_ops import AudioInvariantStage

    pcm = (np.sin(np.arange(8000) * 0.03) * 15000).astype(np.int16)
    batch = pa.table({
        "media_id": pa.array(["hz16"], pa.string()),
        "bytes": pa.array([riffav.encode_wav(pcm, 16000)], pa.binary()),
        "n_samples": pa.array([8000], pa.int64()),
        "rate": pa.array([16000], pa.int32()),
    })
    inv = AudioInvariantStage()(batch).to_pandas()
    assert inv["duration_ok"].all()
    assert inv["meta_ok"].all()


def test_audio_stage_real_wav_and_meta_invariant():
    import pyarrow as pa

    from forum_dl_ray.fixtures.media import synth_audio
    from forum_dl_ray.ops.audio_ops import AudioDecodeStage, AudioInvariantStage

    ids = [f"t{i}" for i in range(5)]
    pcms = [synth_audio(m) for m in ids]
    batch = pa.table({
        "media_id": pa.array(ids, pa.string()),
        "bytes": pa.array([riffav.encode_wav(p, 8000) for p in pcms], pa.binary()),
        "n_samples": pa.array([len(p) for p in pcms], pa.int64()),
        "rate": pa.array([8000] * 5, pa.int32()),
    })
    stats = AudioDecodeStage()(batch).to_pylist()
    for row, pcm in zip(stats, pcms):
        assert row["n_samples"] == len(pcm)
        assert row["peak"] == int(np.max(np.abs(pcm.astype(np.int64))))
    inv = AudioInvariantStage()(batch).to_pandas()
    for col in ("decode_ok", "duration_ok", "windows_ok", "energy_ok",
                "stats_ok", "meta_ok"):
        assert inv[col].all(), col
    # and meta_ok actually bites: corrupt the metadata
    bad = batch.set_column(2, "n_samples",
                           pa.array([len(p) + 1 for p in pcms], pa.int64()))
    inv_bad = AudioInvariantStage()(bad).to_pandas()
    assert not inv_bad["meta_ok"].any()
