"""Multimodal (audio payload) pipelines — the audio member of the
image/audio/video opaque-binary family (SURVEY.md §2 training-data
ops; same contract as ops/images_ops.py).

Audio is treated as an opaque ``binary`` column with typed metadata.
No audio codec exists in this container, so the PCM decode is a
CLEARLY-MARKED DETERMINISTIC FAKE (`_fake_pcm`): samples derive from
the payload bytes only, byte-identical across runs and processes.
Everything around it is the real scale plumbing a soundfile/ffmpeg
decoder would need — actor-pool stage with per-actor setup, SMALL
batches for wide binary rows, vectorized numpy window kernels, integer
fixed-point outputs (driver value-hash robustness) — so a real
``decode_pcm()`` drops in behind the same signature.

The input table is the same deterministic media payload parquet the
video sampler uses (opaque (id, bytes) shape per BASELINE.json's
input_hint).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from forum_dl_ray import STAGE_RUNTIME_ENV as _RENV

from ._io import read_parquet_clean
from .images_ops import images_table_path

# wide binary rows -> small batches (SURVEY.md §7.4)
_AUD_BATCH = 128
_RATE = 8000  # fake decoder's fixed sample rate


def _read_media(columns=None) -> rd.Dataset:
    return read_parquet_clean(images_table_path(), columns=columns)


def _fake_pcm(media_id: str, raw: bytes, rate: int = _RATE) -> np.ndarray:
    """STUB (deterministic fake) — replace with a real audio decode.

    Emits 0.05–0.8 s of int16 PCM whose length and content derive only
    from (media_id, payload bytes): a seeded PRNG "waveform" plus a
    payload-keyed sine so RMS/ZCR vary across media."""
    digest = hashlib.blake2b(media_id.encode() + raw[:64], digest_size=8).digest()
    seed = int.from_bytes(digest, "little")
    n = rate // 20 + (len(raw) * 131 + seed % 997) % (rate * 3 // 4)
    rng = np.random.default_rng(seed)
    noise = rng.integers(-6000, 6000, size=n, dtype=np.int32)
    t = np.arange(n, dtype=np.float64)
    tone = (8000 * np.sin(t * (0.01 + (seed % 50) / 500.0))).astype(np.int32)
    return np.clip(noise + tone, -32768, 32767).astype(np.int16)


class AudioDecodeStage:
    """Actor-pool decode stage: opaque binary in, per-payload PCM
    stats out. State (rate, clip threshold) set once per actor."""

    def __init__(self, rate: int = _RATE, clip_level: int = 30000):
        self.rate = rate
        self.clip_level = clip_level

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["image_id"].to_pylist()
        blobs = batch["bytes"].to_pylist()
        out = {"media_id": [], "n_samples": [], "duration_ms": [],
               "rms_e6": [], "peak": [], "clip_ratio_e6": [], "zcr_e6": []}
        for mid, raw in zip(ids, blobs):
            pcm = _fake_pcm(mid, raw, self.rate).astype(np.float64)
            n = len(pcm)
            rms = float(np.sqrt(np.mean(pcm * pcm))) if n else 0.0
            clip = int(np.count_nonzero(np.abs(pcm) >= self.clip_level))
            zc = int(np.count_nonzero(np.signbit(pcm[1:]) != np.signbit(pcm[:-1])))
            out["media_id"].append(mid)
            out["n_samples"].append(n)
            out["duration_ms"].append(n * 1000 // self.rate)
            out["rms_e6"].append(int(rms * 1e6) // 1)
            out["peak"].append(int(np.max(np.abs(pcm))) if n else 0)
            out["clip_ratio_e6"].append(clip * 10**6 // max(1, n))
            out["zcr_e6"].append(zc * 10**6 // max(1, n - 1))
        return pa.table(
            {
                "media_id": pa.array(out["media_id"], pa.string()),
                "n_samples": pa.array(out["n_samples"], pa.int64()),
                "duration_ms": pa.array(out["duration_ms"], pa.int64()),
                "rms_e6": pa.array(out["rms_e6"], pa.int64()),
                "peak": pa.array(out["peak"], pa.int64()),
                "clip_ratio_e6": pa.array(out["clip_ratio_e6"], pa.int64()),
                "zcr_e6": pa.array(out["zcr_e6"], pa.int64()),
            }
        )


def audio_decode_stats(sf_dir: str) -> pd.DataFrame:
    """(media_id, n_samples, duration_ms, rms_e6, peak, clip_ratio_e6,
    zcr_e6) per payload — the audio quality-screen a training pipeline
    runs before transcription/captioning. Rows-only (stub decoder)."""
    out = _read_media(["image_id", "bytes"]).map_batches(
        AudioDecodeStage, batch_format="pyarrow", batch_size=_AUD_BATCH,
        concurrency=2, runtime_env=_RENV,
    ).to_pandas()
    return out.sort_values("media_id").reset_index(drop=True)


class AudioWindowStage:
    """Actor-pool windowed-feature stage: framed energy + zero-crossing
    rate per hop — the plumbing shape of an MFCC/fbank extractor
    (window table precomputed once per actor in __init__)."""

    def __init__(self, rate: int = _RATE, win_ms: int = 25, hop_ms: int = 10):
        self.rate = rate
        self.win = rate * win_ms // 1000
        self.hop = rate * hop_ms // 1000
        # real extractors build their mel filterbank here, once
        self.hann = 0.5 - 0.5 * np.cos(2 * np.pi * np.arange(self.win) / self.win)

    def frame(self, pcm: np.ndarray) -> np.ndarray:
        n = len(pcm)
        if n < self.win:
            return np.zeros((0, self.win))
        n_win = 1 + (n - self.win) // self.hop
        idx = np.arange(self.win)[None, :] + self.hop * np.arange(n_win)[:, None]
        return pcm[idx]

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["image_id"].to_pylist()
        blobs = batch["bytes"].to_pylist()
        out_id, out_w, out_en, out_zc = [], [], [], []
        for mid, raw in zip(ids, blobs):
            pcm = _fake_pcm(mid, raw, self.rate).astype(np.float64) / 32768.0
            frames = self.frame(pcm) * self.hann[None, :]
            if not len(frames):
                continue
            energy = (frames * frames).sum(axis=1)
            zc = (np.signbit(frames[:, 1:]) != np.signbit(frames[:, :-1])).sum(axis=1)
            out_id.extend([mid] * len(frames))
            out_w.extend(range(len(frames)))
            out_en.extend((energy * 1e6).astype(np.int64))
            out_zc.extend(zc.astype(np.int64))
        return pa.table(
            {
                "media_id": pa.array(out_id, pa.string()),
                "win_idx": pa.array(out_w, pa.int32()),
                "energy_e6": pa.array(out_en, pa.int64()),
                "zcr": pa.array(out_zc, pa.int64()),
            }
        )


def audio_windows(sf_dir: str) -> pd.DataFrame:
    """Per-window (25 ms / 10 ms hop) energy + zero crossings for every
    payload — one output row per window, streamed; the result here is
    collected only because the query harness compares small frames."""
    out = _read_media(["image_id", "bytes"]).map_batches(
        AudioWindowStage, batch_format="pyarrow", batch_size=_AUD_BATCH,
        concurrency=2, runtime_env=_RENV,
    ).to_pandas()
    return out.sort_values(["media_id", "win_idx"]).reset_index(drop=True)


class AudioInvariantStage:
    """Cross-kernel consistency checker: runs the REAL decode stage and
    the REAL window stage (their actual ``__call__``s, not re-derived
    math) on each batch and asserts the invariants that tie them
    together. This is the driver-facing oracle surface for the audio
    family — the decode itself is a deterministic stub, so the DuckDB
    oracle can't reproduce the stats, but it CAN pin that every
    invariant came back TRUE per media row (the image_decode_stats
    TRUE-column pattern, round-2 verdict Next #3)."""

    def __init__(self, rate: int = _RATE, win_ms: int = 25, hop_ms: int = 10):
        self.decode = AudioDecodeStage(rate=rate)
        self.windows = AudioWindowStage(rate=rate, win_ms=win_ms, hop_ms=hop_ms)
        self.rate = rate

    def __call__(self, batch: pa.Table) -> pa.Table:
        stats = self.decode(batch).to_pandas().set_index("media_id")
        wins = self.windows(batch).to_pandas()
        per_media = wins.groupby("media_id").agg(
            n_windows=("win_idx", "size"), max_idx=("win_idx", "max"),
            max_energy=("energy_e6", "max"), max_zcr=("zcr", "max"))
        joined = stats.join(per_media, how="left")
        n = joined["n_samples"].to_numpy()
        win, hop = self.windows.win, self.windows.hop
        expect_wins = np.where(n < win, 0, 1 + (n - win) // hop)
        n_wins = joined["n_windows"].fillna(0).to_numpy().astype(np.int64)
        decode_ok = n > 0
        duration_ok = joined["duration_ms"].to_numpy() == n * 1000 // self.rate
        windows_ok = (n_wins == expect_wins) & (
            joined["max_idx"].fillna(-1).to_numpy() == n_wins - 1)
        # |pcm/32768| <= 1 and |hann| <= 1 -> per-window energy <= win
        energy_ok = joined["max_energy"].fillna(0).to_numpy() <= win * 1_000_000
        # window zero crossings bounded by win-1; whole-clip rms <= peak
        stats_ok = (joined["max_zcr"].fillna(0).to_numpy() <= win - 1) & (
            joined["rms_e6"].to_numpy()
            <= joined["peak"].to_numpy().astype(np.int64) * 1_000_000
        ) & (joined["peak"].to_numpy() <= 32767)
        return pa.table(
            {
                "media_id": pa.array(joined.index.to_list(), pa.string()),
                "decode_ok": pa.array(decode_ok, pa.bool_()),
                "duration_ok": pa.array(duration_ok, pa.bool_()),
                "windows_ok": pa.array(windows_ok, pa.bool_()),
                "energy_ok": pa.array(energy_ok, pa.bool_()),
                "stats_ok": pa.array(stats_ok, pa.bool_()),
            }
        )


def audio_invariants(sf_dir: str) -> rd.Dataset:
    """(media_id, decode_ok, duration_ok, windows_ok, energy_ok,
    stats_ok) — the decode+window consistency surface, one row per
    payload, all-TRUE on a correct decoder. Driver query key
    ``audio_decode_stats`` (merged coverage of the decode-stats and
    window ops under the 50-query harness cap); the full stat/window
    tables remain pytest-covered library ops."""
    return _read_media(["image_id", "bytes"]).map_batches(
        AudioInvariantStage, batch_format="pyarrow", batch_size=_AUD_BATCH,
        concurrency=2, runtime_env=_RENV,
    )
