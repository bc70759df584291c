"""Real RIFF media codecs: WAV (PCM) and AVI (Motion-JPEG), pure
numpy/stdlib.

These replace the round-1..4 deterministic *fakes* behind the audio /
video multimodal ops (`ops/audio_ops.py`, `ops/images_ops.py
VideoFrameSampleStage`): the payload column now holds genuine RIFF
containers and the decode stages parse them for real. The JPEG frames
inside AVI use this repo's baseline T.81 codec (`jpeg.py`), so an AVI
round-trip exercises the full entropy-coded path.

Format references are the public Microsoft RIFF/AVI specs and RFC 2361
(WAVE format registry); the reference project (mikwielgus/forum-dl)
has no media decoding at all — forum images/attachments pass through
as opaque bytes (`/root/reference/forum_dl/extractors/common.py` File
entries) — so this module is part of the training-data delta, not
parity.

Scale notes: both decoders are per-payload kernels invoked inside
actor-pool ``map_batches`` stages (wide binary rows, small batches).
They never copy more than one payload at a time; WAV sample conversion
is a single ``np.frombuffer`` view + vectorized scale.
"""

from __future__ import annotations

import struct

import numpy as np

WAV_MAGIC = b"RIFF"
_PCM_GUID = bytes.fromhex("0100000000001000800000aa00389b71")  # KSDATAFORMAT_SUBTYPE_PCM


def sniff(data: bytes) -> str | None:
    """'wav' | 'avi' | None for a RIFF payload (cheap, header-only)."""
    if len(data) >= 12 and data[:4] == b"RIFF":
        form = data[8:12]
        if form == b"WAVE":
            return "wav"
        if form == b"AVI ":
            return "avi"
    return None


def _iter_chunks(data: bytes, pos: int, end: int):
    """Yield (fourcc, payload_start, payload_size); honors odd padding."""
    while pos + 8 <= end:
        cc = data[pos:pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        body = pos + 8
        yield cc, body, size
        pos = body + size + (size & 1)


def _chunk(cc: bytes, body: bytes) -> bytes:
    pad = b"\x00" if len(body) & 1 else b""
    return cc + struct.pack("<I", len(body)) + body + pad


def _list(form: bytes, body: bytes) -> bytes:
    return _chunk(b"LIST", form + body)


# ---------------------------------------------------------------------- WAV
def encode_wav(pcm: np.ndarray, rate: int) -> bytes:
    """int16 PCM (n,) or (n, channels) → canonical RIFF/WAVE bytes."""
    assert pcm.dtype == np.int16 and rate > 0
    if pcm.ndim == 1:
        pcm = pcm[:, None]
    assert pcm.ndim == 2 and pcm.shape[1] >= 1
    ch = pcm.shape[1]
    block = ch * 2
    fmt = struct.pack("<HHIIHH", 1, ch, rate, rate * block, block, 16)
    body = b"WAVE" + _chunk(b"fmt ", fmt) + _chunk(
        b"data", np.ascontiguousarray(pcm).tobytes())
    return _chunk(b"RIFF", body)


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE → (int16 pcm (n, channels), sample_rate).

    Handles PCM (tag 1) and WAVE_FORMAT_EXTENSIBLE (tag 0xFFFE with
    the PCM subformat GUID), 8-bit unsigned and 16-bit signed samples,
    any channel count; skips unknown chunks (LIST/fact/cue/...) and
    odd-size padding per the RIFF rules. Raises ValueError on
    non-WAVE or compressed payloads."""
    if sniff(data) != "wav":
        raise ValueError("not a RIFF/WAVE payload")
    (riff_size,) = struct.unpack_from("<I", data, 4)
    end = min(len(data), 8 + riff_size)
    tag = ch = rate = bits = None
    pcm_bytes = None
    for cc, body, size in _iter_chunks(data, 12, end):
        if cc == b"fmt " and size >= 16:
            tag, ch, rate, _avg, _blk, bits = struct.unpack_from("<HHIIHH", data, body)
            if tag == 0xFFFE and size >= 40:  # WAVE_FORMAT_EXTENSIBLE
                (cb,) = struct.unpack_from("<H", data, body + 16)
                if cb >= 22 and data[body + 24:body + 40] == _PCM_GUID:
                    tag = 1
        elif cc == b"data" and pcm_bytes is None:
            pcm_bytes = data[body:body + size]
    if tag is None or pcm_bytes is None:
        raise ValueError("WAVE missing fmt/data chunk")
    if tag != 1:
        raise ValueError(f"unsupported WAVE format tag {tag:#x} (PCM only)")
    if not ch or not rate:
        raise ValueError(f"corrupt WAVE fmt: channels={ch} rate={rate}")
    if bits == 16:
        flat = np.frombuffer(pcm_bytes[: len(pcm_bytes) // 2 * 2], dtype="<i2")
        samples = flat.astype(np.int16, copy=False)
    elif bits == 8:  # unsigned, midpoint 128 → int16
        u = np.frombuffer(pcm_bytes, dtype=np.uint8)
        samples = ((u.astype(np.int16) - 128) << 8).astype(np.int16)
    else:
        raise ValueError(f"unsupported PCM bit depth {bits}")
    n = len(samples) // ch * ch
    return samples[:n].reshape(-1, ch), int(rate)


# ----------------------------------------------------------------- AVI/MJPG
_AVIF_HASINDEX = 0x10
_AVIIF_KEYFRAME = 0x10


def encode_avi_mjpeg(frames: list[np.ndarray], fps: int,
                     quality: int = 98) -> bytes:
    """uint8 RGB frames (h, w, 3), equal dims → RIFF AVI with one
    Motion-JPEG 'vids' stream (each frame a standalone baseline JFIF
    from jpeg.encode_jpeg) and an idx1 index."""
    from .jpeg import encode_jpeg

    assert frames and fps > 0
    h, w = frames[0].shape[:2]
    assert all(f.shape == frames[0].shape for f in frames)
    blobs = [encode_jpeg(f, quality=quality) for f in frames]
    max_blob = max(len(b) for b in blobs)

    usec_per_frame = 1_000_000 // fps
    avih = struct.pack(
        "<IIIIIIIIIIIIII", usec_per_frame, max_blob * fps, 0, _AVIF_HASINDEX,
        len(frames), 0, 1, max_blob, w, h, 0, 0, 0, 0)
    strh = struct.pack(
        "<4s4sIHHIIIIIIIIhhhh", b"vids", b"MJPG", 0, 0, 0, 0,
        1, fps, 0, len(frames), max_blob, 0xFFFFFFFF, 0,
        0, 0, w, h)
    strf = struct.pack(
        "<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG", w * h * 3, 0, 0, 0, 0)
    hdrl = _list(b"hdrl", _chunk(b"avih", avih)
                 + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)))

    movi_body = b"movi"
    idx = b""
    for blob in blobs:
        # idx1 offsets are relative to the 'movi' fourcc position
        idx += struct.pack("<4sIII", b"00dc", _AVIIF_KEYFRAME,
                           len(movi_body), len(blob))
        movi_body += _chunk(b"00dc", blob)
    body = b"AVI " + hdrl + _chunk(b"LIST", movi_body) + _chunk(b"idx1", idx)
    return _chunk(b"RIFF", body)


def decode_avi_mjpeg(data: bytes) -> tuple[list[np.ndarray], int]:
    """RIFF AVI → (decoded RGB frames, fps). Walks hdrl for the video
    stream's dwScale/dwRate, then decodes every '00dc'/'00db' chunk in
    the movi list with jpeg.decode_jpeg. Skips non-video streams and
    unknown chunks; tolerates a missing idx1 (streams decoded in
    order). Raises ValueError on non-AVI payloads."""
    from .jpeg import decode_jpeg

    if sniff(data) != "avi":
        raise ValueError("not a RIFF AVI payload")
    (riff_size,) = struct.unpack_from("<I", data, 4)
    end = min(len(data), 8 + riff_size)
    fps = 0
    frames: list[np.ndarray] = []

    def walk(pos: int, stop: int) -> None:
        nonlocal fps
        for cc, body, size in _iter_chunks(data, pos, stop):
            if cc == b"LIST":
                form = data[body:body + 4]
                if form in (b"hdrl", b"strl", b"movi", b"rec "):
                    walk(body + 4, body + size)
            elif cc == b"strh" and size >= 32:
                fcc_type, _h, _f, _p, _l, _init, scale, rate = struct.unpack_from(
                    "<4s4sIHHIII", data, body)
                if fcc_type == b"vids" and scale:
                    fps = rate // scale
            elif cc in (b"00dc", b"00db") and size >= 2:
                frames.append(decode_jpeg(data[body:body + size]))

    walk(12, end)
    if not frames:
        raise ValueError("AVI contains no video frames")
    return frames, fps or 1
