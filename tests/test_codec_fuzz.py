"""Hostile-payload robustness for the codec family.

A crawler's asset stage ingests attacker-controlled bytes; the
contract is that every decoder either returns pixels/samples or raises
promptly (ValueError / NotImplementedError / AssertionError — all
caught by `asset_batch`'s except) — never hangs, never loops
unbounded, never segfaults numpy. These tests fuzz structured
mutations (bit flips inside otherwise-valid payloads) and raw garbage
behind the right magic, asserting bounded-time termination."""

import os
import sys

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from forum_dl_ray import riffav
from forum_dl_ray.gif import decode_gif, encode_gif
from forum_dl_ray.images import decode_image, encode_image, synth_pixels
from forum_dl_ray.jpeg import decode_jpeg, encode_jpeg

_CAUGHT = (ValueError, NotImplementedError, AssertionError, IndexError,
           KeyError, struct_error := __import__("struct").error)


def _mutate(data: bytes, rng: np.random.Generator, n_flips: int) -> bytes:
    buf = bytearray(data)
    for _ in range(n_flips):
        i = int(rng.integers(2, len(buf)))  # keep the magic intact
        buf[i] ^= 1 << int(rng.integers(0, 8))
    return bytes(buf)


@settings(max_examples=40, deadline=None)
@given(st.integers(0, 2**32 - 1), st.integers(1, 12))
def test_jpeg_decode_terminates_on_bitflips(seed, n_flips):
    rng = np.random.default_rng(seed)
    base = encode_jpeg(synth_pixels(f"fz{seed % 7}", 24, 24))
    data = _mutate(base, rng, n_flips)
    try:
        out = decode_jpeg(data)
        assert out.dtype == np.uint8 and out.ndim == 3
    except _CAUGHT:
        pass


@settings(max_examples=40, deadline=None)
@given(st.integers(0, 2**32 - 1), st.integers(1, 12))
def test_gif_decode_terminates_on_bitflips(seed, n_flips):
    rng = np.random.default_rng(seed)
    pal = rng.integers(0, 256, size=(16, 3)).astype(np.uint8)
    px = pal[rng.integers(0, 16, size=(20, 20))]
    data = _mutate(encode_gif(px), rng, n_flips)
    try:
        out = decode_gif(data)
        assert out.dtype == np.uint8 and out.ndim == 3
    except _CAUGHT:
        pass


@settings(max_examples=40, deadline=None)
@given(st.integers(0, 2**32 - 1), st.integers(1, 12))
def test_wav_decode_terminates_on_bitflips(seed, n_flips):
    rng = np.random.default_rng(seed)
    pcm = rng.integers(-32768, 32768, size=600, dtype=np.int16)
    data = _mutate(riffav.encode_wav(pcm, 8000), rng, n_flips)
    try:
        out, rate = riffav.decode_wav(data)
        assert out.dtype == np.int16 and rate > 0
    except _CAUGHT:
        pass


@settings(max_examples=25, deadline=None)
@given(st.integers(0, 2**32 - 1), st.integers(1, 12))
def test_avi_decode_terminates_on_bitflips(seed, n_flips):
    rng = np.random.default_rng(seed)
    frames = [synth_pixels(f"fz{seed % 5}-f{i}", 16, 16) for i in range(2)]
    data = _mutate(riffav.encode_avi_mjpeg(frames, fps=10), rng, n_flips)
    try:
        out, fps = riffav.decode_avi_mjpeg(data)
        assert fps >= 1 and all(f.dtype == np.uint8 for f in out)
    except _CAUGHT:
        pass


@settings(max_examples=30, deadline=None)
@given(st.binary(min_size=0, max_size=4096), st.sampled_from(
    [b"\xff\xd8", b"GIF89a", b"RIFF\x00\x10\x00\x00WAVE",
     b"RIFF\x00\x10\x00\x00AVI ", b"\x89PNG\r\n\x1a\n"]))
def test_garbage_behind_magic_terminates(blob, magic):
    data = magic + blob
    try:
        decode_image(data)
    except _CAUGHT:
        pass


def test_decoders_never_touch_disk_or_block(tmp_path):
    """Sanity: a pathological-but-valid payload decodes in bounded
    time (a 1x1 image, a 1-sample WAV, a 1-frame AVI)."""
    one = np.array([[[1, 2, 3]]], dtype=np.uint8)
    assert decode_image(encode_image(one, "png")).shape == (1, 1, 3)
    assert decode_image(encode_image(one, "jpeg")).shape == (1, 1, 3)
    assert decode_image(encode_image(one, "gif")).shape == (1, 1, 3)
    pcm1 = np.array([7], dtype=np.int16)
    out, _ = riffav.decode_wav(riffav.encode_wav(pcm1, 8000))
    assert out.shape == (1, 1)
    frames, fps = riffav.decode_avi_mjpeg(riffav.encode_avi_mjpeg([one], fps=10))
    assert len(frames) == 1 and frames[0].shape == (1, 1, 3)
