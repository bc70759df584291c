"""Deterministic REAL-container media payload tables (WAV + AVI).

Round 1–4 ran the audio/video multimodal ops over the crawl image
table with clearly-marked fake decoders. This generator gives those
ops genuine payloads instead: every audio row is a real RIFF/WAVE PCM
file and every video row a real RIFF AVI whose frames are baseline
JFIF from this repo's JPEG codec — so `ops/audio_ops.py` and the
video sampler in `ops/images_ops.py` exercise real container parsing
and real entropy-coded frame decode end-to-end.

Payload bytes are pure functions of the media id (seeded PRNG), so the
tables are byte-deterministic across runs/processes; each table also
carries typed metadata columns (n_samples/rate, n_frames/fps/w/h) that
the decode stages re-derive and assert against — that consistency
surface is what the driver's DuckDB oracle pins (the TRUE-column
pattern used by image_decode_stats since round 2).

Cache layout follows fixtures/synth.py: digest-keyed directory under
/tmp/fdr_media, built into a tmp dir and os.rename'd into place so a
concurrent builder can never delete a readable table (the ivf_build
concurrency rule), with a _DONE marker.

The reference (mikwielgus/forum-dl) has no media decoding — attachments
pass through opaque (`/root/reference/forum_dl/extractors/common.py`
File entries); this table is training-data-ops scope, not parity.
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

_MEDIA_VERSION = 1
_N_AUDIO = 192
_N_VIDEO = 48
_RATE = 8000  # every table row; decode stages assert it


def _digest() -> str:
    from ..images import CODEC_VERSION

    key = f"media-v{_MEDIA_VERSION}-jfif{CODEC_VERSION}-{_N_AUDIO}-{_N_VIDEO}-{_RATE}"
    return hashlib.blake2b(key.encode(), digest_size=8).hexdigest()


def _seed(media_id: str) -> int:
    return int.from_bytes(
        hashlib.blake2b(media_id.encode(), digest_size=8).digest(), "little")


def synth_audio(media_id: str, rate: int = _RATE) -> np.ndarray:
    """Deterministic mono int16 PCM, 0.05–0.8 s: two payload-keyed
    sines over PRNG noise (RMS/ZCR/peak vary across media)."""
    seed = _seed(media_id)
    rng = np.random.default_rng(seed)
    n = rate // 20 + seed % (rate * 3 // 4)
    t = np.arange(n, dtype=np.float64)
    f1 = 0.01 + (seed % 53) / 400.0
    f2 = 0.002 + (seed % 19) / 900.0
    wave = 7000.0 * np.sin(t * f1) + 4000.0 * np.sin(t * f2)
    noise = rng.integers(-5000, 5001, size=n).astype(np.float64)
    return np.clip(wave + noise, -32768, 32767).astype(np.int16)


def synth_video_plan(media_id: str) -> tuple[int, int, int, int]:
    """(n_frames, fps, w, h) — the metadata the AVI's header must agree
    with; fps values divide 1000 so frame timestamps are exact ints."""
    seed = _seed(media_id)
    n_frames = 2 + seed % 7           # 2..8
    fps = (10, 20, 25)[seed % 3]
    w = 24 + (seed >> 8) % 3 * 8      # 24/32/40
    h = 24 + (seed >> 16) % 2 * 8     # 24/32
    return n_frames, fps, w, h


def synth_video(media_id: str) -> bytes:
    from ..images import synth_pixels
    from ..riffav import encode_avi_mjpeg

    n_frames, fps, w, h = synth_video_plan(media_id)
    frames = [synth_pixels(f"{media_id}-f{i}", w, h) for i in range(n_frames)]
    return encode_avi_mjpeg(frames, fps=fps)


def media_fixture_dir(out_dir: str | None = None) -> str:
    """Generate (or reuse) audio.parquet + video.parquet; returns dir."""
    from ..riffav import encode_wav

    out_dir = out_dir or os.path.join("/tmp", "fdr_media", _digest())
    done = os.path.join(out_dir, "_DONE")
    if os.path.exists(done):
        return out_dir

    tmp = out_dir + f".tmp.{os.getpid()}"
    os.makedirs(tmp, exist_ok=True)

    ids = [f"au{i:04d}" for i in range(_N_AUDIO)]
    pcms = [synth_audio(m) for m in ids]
    audio = pa.table(
        {
            "media_id": pa.array(ids, pa.string()),
            "bytes": pa.array([encode_wav(p, _RATE) for p in pcms], pa.binary()),
            "n_samples": pa.array([len(p) for p in pcms], pa.int64()),
            "rate": pa.array([_RATE] * len(ids), pa.int32()),
            "channels": pa.array([1] * len(ids), pa.int32()),
        }
    )
    pq.write_table(audio, os.path.join(tmp, "audio.parquet"))

    vids = [f"vi{i:04d}" for i in range(_N_VIDEO)]
    plans = [synth_video_plan(m) for m in vids]
    video = pa.table(
        {
            "media_id": pa.array(vids, pa.string()),
            "bytes": pa.array([synth_video(m) for m in vids], pa.binary()),
            "n_frames": pa.array([p[0] for p in plans], pa.int32()),
            "fps": pa.array([p[1] for p in plans], pa.int32()),
            "w": pa.array([p[2] for p in plans], pa.int32()),
            "h": pa.array([p[3] for p in plans], pa.int32()),
        }
    )
    pq.write_table(video, os.path.join(tmp, "video.parquet"))

    with open(os.path.join(tmp, "_DONE"), "w") as f:
        f.write(_digest())
    try:
        os.rename(tmp, out_dir)
    except OSError:
        # a concurrent builder won the rename; ours is redundant
        import shutil

        shutil.rmtree(tmp, ignore_errors=True)
    return out_dir


def audio_table_path() -> str:
    return os.path.join(media_fixture_dir(), "audio.parquet")


def video_table_path() -> str:
    return os.path.join(media_fixture_dir(), "video.parquet")
