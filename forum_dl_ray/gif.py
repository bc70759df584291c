"""GIF87a/89a codec, pure numpy/stdlib — the third real image format
a forum crawler meets (avatars, smilies, attachment thumbnails).

Decoder: full static-GIF support — logical screen + image descriptors,
global/local color tables, interlaced row order, variable-width LZW
with CLEAR/EOI handling across sub-blocks, GIF89a extension blocks
(graphic-control transparent pixels composite onto the logical
screen's background color). Animated GIFs decode to their FIRST frame,
composited onto the logical screen, which is what thumbnailing /
pHashing a forum attachment wants.

Encoder: exact-palette GIF89a for images with ≤ 256 distinct colors
(raises otherwise — this repo never needs lossy color quantization;
the encoder exists so the decoder is round-trip testable and fixtures
can carry real GIF payloads).

Format reference: the public GIF89a specification (CompuServe, 1990)
and RFC 2046's image/gif registration. The reference project does no
image decoding (`/root/reference/forum_dl/extractors/common.py` File
entries are opaque), so this is training-data-ops scope.
"""

from __future__ import annotations

import struct

import numpy as np

GIF_MAGIC = b"GIF8"


# ------------------------------------------------------------------ encoder
def _lzw_encode(indices: np.ndarray, min_code_size: int) -> bytes:
    """GIF-flavor LZW: variable code width, CLEAR emitted when the
    table would pass 4096 codes."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def put(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits  # GIF packs codes LSB-first
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    width = min_code_size + 1
    put(clear, width)
    prefix = b""
    for sym in indices.tolist():
        cand = prefix + bytes([sym])
        if cand in table:
            prefix = cand
            continue
        put(table[prefix], width)
        table[cand] = next_code
        next_code += 1
        if next_code > (1 << width) and width < 12:
            width += 1
        elif next_code >= 4096:
            put(clear, width)
            table = {bytes([i]): i for i in range(clear)}
            next_code = eoi + 1
            width = min_code_size + 1
        prefix = bytes([sym])
    if prefix:
        put(table[prefix], width)
    put(eoi, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def encode_gif(pixels: np.ndarray) -> bytes:
    """8-bit RGB (h, w, 3) with ≤ 256 distinct colors → GIF89a bytes.

    Lossless: decode_gif(encode_gif(px)) == px exactly."""
    assert pixels.ndim == 3 and pixels.shape[2] == 3 and pixels.dtype == np.uint8
    h, w = pixels.shape[:2]
    flat = pixels.reshape(-1, 3)
    palette, indices = np.unique(flat, axis=0, return_inverse=True)
    if len(palette) > 256:
        raise ValueError(
            f"{len(palette)} distinct colors: exact-palette GIF encoder "
            "supports at most 256 (no quantizer in this container)")
    # palette size must be a power of two >= 2
    bits = max(1, int(len(palette) - 1).bit_length())
    size = 1 << bits
    pal = np.zeros((size, 3), dtype=np.uint8)
    pal[: len(palette)] = palette
    min_code = max(2, bits)

    out = bytearray()
    out += b"GIF89a"
    out += struct.pack("<HHBBB", w, h, 0x80 | ((bits - 1) << 4) | (bits - 1), 0, 0)
    out += pal.tobytes()
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
    out += bytes([min_code])
    lzw = _lzw_encode(indices.astype(np.uint16), min_code)
    for i in range(0, len(lzw), 255):
        chunk = lzw[i : i + 255]
        out += bytes([len(chunk)]) + chunk
    out += b"\x00"  # block terminator
    out += b"\x3b"  # trailer
    return bytes(out)


# ------------------------------------------------------------------ decoder
def _lzw_decode(data: bytes, min_code_size: int, n_pixels: int) -> np.ndarray:
    clear = 1 << min_code_size
    eoi = clear + 1
    width = min_code_size + 1
    # table as list of byte strings; rebuilt on CLEAR
    base = [bytes([i]) for i in range(clear)] + [b"", b""]
    table = list(base)
    out = bytearray()
    acc = 0
    nbits = 0
    pos = 0
    prev: bytes | None = None
    n = len(data)
    while len(out) < n_pixels:
        while nbits < width:
            if pos >= n:
                # truncated stream: tolerate (fill handled by caller)
                return np.frombuffer(bytes(out[:n_pixels]), dtype=np.uint8)
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table = list(base)
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            break
        if code < len(table):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]  # the KwKwK case
        else:
            raise ValueError(f"corrupt LZW stream: code {code} of {len(table)}")
        out += entry
        if prev is not None and len(table) < 4096:
            table.append(prev + entry[:1])
            if len(table) == (1 << width) and width < 12:
                width += 1
        prev = entry
    return np.frombuffer(bytes(out[:n_pixels]), dtype=np.uint8)


_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def decode_gif(data: bytes) -> np.ndarray:
    """GIF87a/89a → (h, w, 3) uint8 RGB (first frame, composited onto
    the logical screen's background)."""
    if data[:4] != GIF_MAGIC or data[4:6] not in (b"7a", b"9a"):
        raise ValueError("not a GIF payload")
    sw, sh, flags, bg, _ar = struct.unpack_from("<HHBBB", data, 6)
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = np.frombuffer(data, np.uint8, n * 3, pos).reshape(n, 3)
        pos += n * 3
    screen = np.zeros((sh, sw, 3), dtype=np.uint8)
    if gct is not None and bg < len(gct):
        screen[:] = gct[bg]

    transparent = -1
    while pos < len(data):
        block = data[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            label = data[pos]
            pos += 1
            if label == 0xF9 and data[pos] >= 4:  # graphic control
                gc_flags = data[pos + 1]
                if gc_flags & 0x01:
                    transparent = data[pos + 4]
            while pos < len(data) and data[pos]:  # skip sub-blocks
                pos += 1 + data[pos]
            pos += 1
            continue
        if block != 0x2C:
            raise ValueError(f"unknown GIF block 0x{block:02x}")
        # image descriptor — decode THIS frame and return
        ix, iy, iw, ih, iflags = struct.unpack_from("<HHHHB", data, pos)
        pos += 9
        ct = gct
        if iflags & 0x80:
            n = 2 << (iflags & 0x07)
            ct = np.frombuffer(data, np.uint8, n * 3, pos).reshape(n, 3)
            pos += n * 3
        if ct is None:
            raise ValueError("GIF frame without any color table")
        min_code = data[pos]
        pos += 1
        lzw = bytearray()
        while pos < len(data) and data[pos]:
            ln = data[pos]
            lzw += data[pos + 1 : pos + 1 + ln]
            pos += 1 + ln
        pos += 1
        idx = _lzw_decode(bytes(lzw), min_code, iw * ih)
        if len(idx) < iw * ih:  # truncated: pad with background index
            idx = np.concatenate([idx, np.zeros(iw * ih - len(idx), np.uint8)])
        idx2 = idx.reshape(ih, iw)
        if iflags & 0x40:  # interlaced row order
            rows = np.empty(ih, dtype=np.int64)
            src = 0
            for start, step in _INTERLACE_PASSES:
                dst = np.arange(start, ih, step)
                rows[dst] = np.arange(src, src + len(dst))
                src += len(dst)
            idx2 = idx2[rows]
        # sloppy encoders emit frame rects past the logical screen —
        # browsers clip, so do we (instead of a numpy broadcast error)
        ch_, cw_ = min(ih, sh - iy), min(iw, sw - ix)
        if ch_ <= 0 or cw_ <= 0:
            return screen
        idx2 = idx2[:ch_, :cw_]
        rgb = ct[np.minimum(idx2, len(ct) - 1)]
        if 0 <= transparent < len(ct):
            mask = idx2 == transparent
            rgb = np.where(mask[:, :, None], screen[iy : iy + ch_, ix : ix + cw_], rgb)
        screen[iy : iy + ch_, ix : ix + cw_] = rgb
        return screen
    raise ValueError("GIF contains no image data")
