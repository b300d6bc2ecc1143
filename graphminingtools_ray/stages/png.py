"""Dependency-free PNG decode (RFC 2083 / W3C PNG spec) — pure numpy +
stdlib zlib, the same treatment PPM/BMP/WAV/JPEG got: the format is a
public byte-exact spec and its DEFLATE layer is Python's own ``zlib``, so
no imaging library is needed.

Scope: 8-bit depth, color types 0 (grayscale), 2 (RGB), 3 (palette, after
PLTE expansion), 4 (gray+alpha), 6 (RGBA); all five scanline filters
(None/Sub/Up/Average/Paeth) with spec-exact reconstruction; chunk CRCs
verified. 16-bit depth and Adam7 interlace raise ``NotImplementedError``
(documented gates, same policy as progressive JPEG).

The encoder half builds real compressed fixtures (zlib stream, per-row
filter types cycling through all five) so the decoder's filter
reconstruction is pinned against closed-form and roundtrip oracles.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Paeth predictor (spec 6.6): nearest of left/up/up-left to a+b-c,
    ties broken left, up, up-left."""
    p = a.astype(np.int64) + b.astype(np.int64) - c.astype(np.int64)
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    out = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))
    return out.astype(np.uint8)


def _unfilter(raw: np.ndarray, h: int, stride: int, bpp: int) -> np.ndarray:
    """Reverse per-scanline filtering: raw is h rows of (1 filter byte +
    stride data bytes); returns (h, stride) reconstructed bytes.

    None/Up are fully vectorized; Sub is a per-lane cumulative sum (mod 256
    distributes over addition, so ``cumsum % 256`` reconstructs the whole
    row in one pass per channel lane); Average/Paeth have a true sequential
    dependence on the left pixel, so they run one PIXEL at a time with the
    bpp channel lanes vectorized — w iterations of small-array numpy per
    row, not stride iterations of Python scalars."""
    raw = raw.reshape(h, stride + 1)
    out = np.zeros((h, stride), np.uint8)
    zero_row = np.zeros(stride, np.uint8)
    for y in range(h):
        ft = int(raw[y, 0])
        line = raw[y, 1:]
        prev = out[y - 1] if y else zero_row
        if ft == 0:
            out[y] = line
        elif ft == 1:  # Sub: per-lane cumsum mod 256
            lanes = line.reshape(-1, bpp).astype(np.int64)
            out[y] = (np.cumsum(lanes, axis=0) & 0xFF).astype(
                np.uint8).reshape(-1)
        elif ft == 2:  # Up
            out[y] = line + prev  # uint8 wraparound == mod 256
        elif ft == 3:  # Average
            row = out[y]
            left = np.zeros(bpp, np.int64)
            pv = prev.astype(np.int64)
            li = line.astype(np.int64)
            for x0 in range(0, stride, bpp):
                v = (li[x0:x0 + bpp] + (left + pv[x0:x0 + bpp]) // 2) & 0xFF
                row[x0:x0 + bpp] = v
                left = v
        elif ft == 4:  # Paeth
            row = out[y]
            left = np.zeros(bpp, np.uint8)
            ul = np.zeros(bpp, np.uint8)
            for x0 in range(0, stride, bpp):
                up = prev[x0:x0 + bpp]
                pr = _paeth(left, up, ul)
                v = (line[x0:x0 + bpp] + pr)  # uint8 wraparound
                row[x0:x0 + bpp] = v
                left = v
                ul = up
        else:
            raise ValueError(f"invalid PNG filter type {ft}")
    return out


def _filter_row(line: np.ndarray, prev: np.ndarray, ft: int,
                bpp: int) -> np.ndarray:
    """Forward filter (encoder side), exact spec arithmetic mod 256."""
    n = len(line)
    left = np.zeros(n, np.int64)
    left[bpp:] = line[:-bpp]
    ul = np.zeros(n, np.int64)
    ul[bpp:] = prev[:-bpp]
    li = line.astype(np.int64)
    if ft == 0:
        out = li
    elif ft == 1:
        out = li - left
    elif ft == 2:
        out = li - prev
    elif ft == 3:
        out = li - (left + prev.astype(np.int64)) // 2
    elif ft == 4:
        pr = _paeth(left.astype(np.uint8), prev.astype(np.uint8),
                    ul.astype(np.uint8)).astype(np.int64)
        out = li - pr
    else:
        raise ValueError(ft)
    return (out & 0xFF).astype(np.uint8)


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF))


def encode_png(pixels: np.ndarray, color_type: int = 2,
               filters: str = "cycle") -> bytes:
    """Spec-valid PNG bytes from an (h, w, ch) or (h, w) uint8 array.
    ``filters="cycle"`` applies filter type y % 5 to row y (exercises every
    reconstruction path); "zero" stores rows unfiltered."""
    if pixels.ndim == 2:
        pixels = pixels[:, :, None]
    h, w, ch = pixels.shape
    if color_type == 3:
        raise ValueError(
            "palette encoding (PLTE authoring) is not supported; "
            "use color type 0/2/4/6 — the DECODER handles palette PNGs"
        )
    if _CHANNELS[color_type] != ch:
        raise ValueError("channel count does not match color type")
    bpp = ch
    stride = w * ch
    flat = pixels.reshape(h, stride)
    rows = []
    prev = np.zeros(stride, np.uint8)
    for y in range(h):
        ft = (y % 5) if filters == "cycle" else 0
        rows.append(bytes([ft]) + _filter_row(flat[y], prev, ft, bpp).tobytes())
        prev = flat[y]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (_SIG + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(b"".join(rows), 6))
            + _chunk(b"IEND", b""))


def decode_png(payload: bytes) -> dict:
    """PNG -> typed metadata dict (the decode_media contract): kind='png',
    width, height, channels (post-palette-expansion), bits=8, n_values =
    w*h*channels, sum_values = integer sum of all reconstructed samples."""
    if payload[:8] != _SIG:
        raise ValueError("not a PNG")
    i = 8
    ihdr = None
    idat = []
    plte = None
    while i + 12 <= len(payload):
        (ln,) = struct.unpack(">I", payload[i:i + 4])
        ctype = payload[i + 4:i + 8]
        data = payload[i + 8:i + 8 + ln]
        (crc,) = struct.unpack(">I", payload[i + 8 + ln:i + 12 + ln])
        if zlib.crc32(ctype + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk CRC mismatch in {ctype!r}")
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"PLTE":
            plte = np.frombuffer(data, np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat.append(data)
        elif ctype == b"IEND":
            break
        i += 12 + ln
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    w, h, depth, color_type, comp, filt, interlace = ihdr
    if depth != 8:
        raise NotImplementedError("only 8-bit PNG supported")
    if interlace != 0:
        raise NotImplementedError("Adam7 interlaced PNG not supported")
    if comp != 0 or filt != 0 or color_type not in _CHANNELS:
        raise ValueError("invalid PNG header")
    ch = _CHANNELS[color_type]
    stride = w * ch
    raw = np.frombuffer(zlib.decompress(b"".join(idat)), np.uint8)
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG pixel data size mismatch")
    out = _unfilter(raw, h, stride, ch)
    if color_type == 3:
        if plte is None:
            raise ValueError("palette PNG missing PLTE")
        out = plte[out.reshape(-1)]
        ch = 3
    return {
        "kind": "png", "width": int(w), "height": int(h), "channels": ch,
        "sample_rate": 0, "bits": 8, "n_values": int(w) * int(h) * ch,
        "sum_values": int(out.astype(np.int64).sum()),
    }


def synth_png_payload(media_id: int) -> bytes:
    """Deterministic REAL compressed PNG per id with closed-form decoded
    features (media_features_png twin): RGB, w = 2 + id%7, h = 2 + id%5,
    pixel byte i = (id*31 + i) % 256 — the media_features_real pixel
    formula — stored through the zlib stream with row filters cycling
    through all five types, so a correct sum certifies every filter's
    reconstruction."""
    mid = int(media_id)
    w, h = 2 + mid % 7, 2 + mid % 5
    px = ((mid * 31 + np.arange(w * h * 3, dtype=np.int64)) % 256).astype(
        np.uint8
    ).reshape(h, w, 3)
    return encode_png(px, color_type=2, filters="cycle")
