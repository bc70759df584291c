"""Audio-op plumbing: deterministic stub decode, window math, schema.
(Mirrors test_images_ops for the audio member of the multimodal
family; the decode itself is a documented stand-in.)"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = "/root/testdata/sf0.001"


def test_audio_decode_stats_deterministic(ray_session):
    from forum_dl_ray.ops import audio_ops

    a = audio_ops.audio_decode_stats(SF_DIR)
    b = audio_ops.audio_decode_stats(SF_DIR)
    assert a.equals(b)
    assert len(a) > 0
    assert list(a.columns) == ["media_id", "n_samples", "rate", "duration_ms",
                               "rms_e6", "peak", "clip_ratio_e6", "zcr_e6"]
    assert (a["n_samples"] > 0).all()
    assert (a["rate"] == 8000).all()  # the media table's fixed rate
    assert (a["duration_ms"] == a["n_samples"] * 1000 // 8000).all()
    assert a["rms_e6"].nunique() > 1  # stats vary across media
    assert (a["peak"] <= 32768).all()


def test_audio_windows_consistent_with_stats(ray_session):
    """Window counts must follow the framing formula against the
    per-media sample counts from the decode-stats pipeline."""
    from forum_dl_ray.ops import audio_ops

    stats = audio_ops.audio_decode_stats(SF_DIR).set_index("media_id")
    wins = audio_ops.audio_windows(SF_DIR)
    win, hop = 8000 * 25 // 1000, 8000 * 10 // 1000
    counts = wins.groupby("media_id")["win_idx"].agg(["count", "max"])
    for mid, row in counts.iterrows():
        n = int(stats.loc[mid, "n_samples"])
        expect = 1 + (n - win) // hop if n >= win else 0
        assert row["count"] == expect, mid
        assert row["max"] == expect - 1
    assert (wins["energy_e6"] >= 0).all()
    assert (wins["zcr"] >= 0).all() and (wins["zcr"] < win).all()


def test_fake_pcm_is_payload_keyed():
    from forum_dl_ray.ops.audio_ops import _fake_pcm

    a = _fake_pcm("m1", b"\x00" * 100)
    b = _fake_pcm("m1", b"\x00" * 100)
    c = _fake_pcm("m2", b"\x00" * 100)
    d = _fake_pcm("m1", b"\x01" * 100)
    assert np.array_equal(a, b)
    assert not np.array_equal(a[: len(c)], c[: len(a)]) or len(a) != len(c)
    assert not np.array_equal(a[: len(d)], d[: len(a)]) or len(a) != len(d)
    assert a.dtype == np.int16
