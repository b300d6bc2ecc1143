"""Dependency-free GIF decode (GIF87a/GIF89a, CompuServe spec) — pure
Python LZW + numpy, completing the image-format family next to
PPM/BMP/PNG/JPEG: the format is a public byte-exact spec and LZW is a
~60-line algorithm, so no codec library is needed.

Scope: global and local color tables, extension blocks (skipped), the
FIRST image frame (animated GIFs decode frame 1 — the per-frame fan-out
belongs to the FrameSample stage shape), Adam-style 4-pass interlacing
de-interlaced. Output semantics match the other image decoders: palette-
expanded RGB samples, integer-exact sums.

The encoder half builds real LZW-compressed fixtures (greedy
longest-match dictionary coding with variable code width and table
resets) so the decoder is pinned against closed-form and pixel-exact
oracles.
"""

from __future__ import annotations

import numpy as np

_MAX_CODE = 4095


def lzw_encode(indices: np.ndarray, mcs: int) -> bytes:
    """GIF-flavor LZW: variable code width starting mcs+1, CLEAR = 2^mcs,
    END = CLEAR+1, dictionary reset at 4096 entries. Greedy longest match;
    emits CLEAR up front (the conventional opening)."""
    clear = 1 << mcs
    end = clear + 1
    out_bits: list[tuple[int, int]] = []  # (code, width)

    def reset():
        return {(i,): i for i in range(clear)}, end + 1, mcs + 1

    table, next_code, width = reset()
    out_bits.append((clear, width))
    cur: tuple = ()
    for v in indices.tolist():
        cand = cur + (v,)
        if cand in table:
            cur = cand
            continue
        out_bits.append((table[cur], width))
        table[cand] = next_code
        next_code += 1
        if next_code - 1 == (1 << width) and width < 12:
            width += 1
        if next_code > _MAX_CODE:
            out_bits.append((clear, width))
            table, next_code, width = reset()
        cur = (v,)
    if cur:
        out_bits.append((table[cur], width))
    out_bits.append((end, width))
    # pack LSB-first
    acc = 0
    nbits = 0
    data = bytearray()
    for code, w in out_bits:
        acc |= code << nbits
        nbits += w
        while nbits >= 8:
            data.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
    if nbits:
        data.append(acc & 0xFF)
    # sub-blocks of <= 255 bytes
    out = bytearray([mcs])
    for i in range(0, len(data), 255):
        chunk = data[i:i + 255]
        out.append(len(chunk))
        out.extend(chunk)
    out.append(0)
    return bytes(out)


def lzw_decode(data: bytes, mcs: int, n_expected: int) -> np.ndarray:
    """Inverse of :func:`lzw_encode` per the GIF spec (incl. the KwKwK
    case and post-CLEAR width reset)."""
    clear = 1 << mcs
    end = clear + 1
    width = mcs + 1
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    out = bytearray()
    acc = 0
    nbits = 0
    pos = 0
    prev: bytes | None = None
    while len(out) < n_expected:
        while nbits < width:
            if pos >= len(data):
                raise ValueError("truncated GIF LZW stream")
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table = [bytes([i]) for i in range(clear)] + [b"", b""]
            width = mcs + 1
            prev = None
            continue
        if code == end:
            break
        if code < len(table):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]  # KwKwK
        else:
            raise ValueError("invalid GIF LZW code")
        out.extend(entry)
        if prev is not None and len(table) <= _MAX_CODE:
            table.append(prev + entry[:1])
            if len(table) == (1 << width) and width < 12:
                width += 1
        prev = entry
    if len(out) < n_expected:
        raise ValueError("GIF pixel data ended early")
    return np.frombuffer(bytes(out[:n_expected]), np.uint8)


def _deinterlace(rows: np.ndarray) -> np.ndarray:
    """GIF 4-pass interlace: rows are stored pass-by-pass (every 8th from
    0, every 8th from 4, every 4th from 2, every 2nd from 1)."""
    h = rows.shape[0]
    order = np.concatenate([
        np.arange(0, h, 8), np.arange(4, h, 8),
        np.arange(2, h, 4), np.arange(1, h, 2),
    ])
    out = np.empty_like(rows)
    out[order] = rows
    return out


def encode_gif(indices: np.ndarray, palette: np.ndarray,
               interlace: bool = False) -> bytes:
    """Spec-valid GIF89a bytes: (h, w) uint8 index array + (256, 3)
    palette, one frame, global color table, optional interlacing."""
    h, w = indices.shape
    if palette.shape != (256, 3):
        raise ValueError("palette must be (256, 3)")
    out = bytearray(b"GIF89a")
    out += int(w).to_bytes(2, "little") + int(h).to_bytes(2, "little")
    out.append(0xF7)  # GCT present, 8-bit color res, 256 entries
    out += b"\x00\x00"  # bg color, aspect
    out += palette.astype(np.uint8).tobytes()
    out += b"\x2c" + b"\x00\x00\x00\x00"  # image descriptor at (0,0)
    out += int(w).to_bytes(2, "little") + int(h).to_bytes(2, "little")
    out.append(0x40 if interlace else 0x00)
    body = indices
    if interlace:
        hh = np.concatenate([
            np.arange(0, h, 8), np.arange(4, h, 8),
            np.arange(2, h, 4), np.arange(1, h, 2),
        ])
        body = indices[hh]
    out += lzw_encode(body.reshape(-1), 8)
    out.append(0x3B)
    return bytes(out)


def iter_gif_frames(payload: bytes):
    """Yield (width, height, index_array, color_table) per image frame of a
    (possibly animated) GIF, de-interlaced, in file order."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    packed = payload[10]
    i = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(payload[i:i + 3 * n], np.uint8).reshape(n, 3)
        i += 3 * n
    while i < len(payload):
        b = payload[i]
        if b == 0x21:  # extension: label + sub-blocks
            i += 2
            while i < len(payload) and payload[i] != 0:
                i += 1 + payload[i]
            i += 1
        elif b == 0x2C:  # image descriptor
            w = int.from_bytes(payload[i + 5:i + 7], "little")
            h = int.from_bytes(payload[i + 7:i + 9], "little")
            ip = payload[i + 9]
            i += 10
            ct = gct
            if ip & 0x80:
                n = 2 << (ip & 0x07)
                ct = np.frombuffer(payload[i:i + 3 * n], np.uint8).reshape(n, 3)
                i += 3 * n
            if ct is None:
                raise ValueError("GIF image without a color table")
            mcs = payload[i]
            i += 1
            data = bytearray()
            while i < len(payload) and payload[i] != 0:
                ln = payload[i]
                data += payload[i + 1:i + 1 + ln]
                i += 1 + ln
            i += 1
            idx = lzw_decode(bytes(data), mcs, w * h).reshape(h, w)
            if ip & 0x40:
                idx = _deinterlace(idx)
            if int(idx.max(initial=0)) >= len(ct):
                raise ValueError("GIF index outside color table")
            yield w, h, idx, ct
        elif b == 0x3B:
            return
        else:
            raise ValueError(f"unexpected GIF block {b:#x}")


def decode_gif(payload: bytes, return_indices: bool = False):
    """GIF -> typed metadata dict (decode_media contract) for the FIRST
    frame: kind='gif', width, height, channels=3, n_values = w*h*3,
    sum_values = integer sum of the palette-expanded RGB samples. With
    ``return_indices`` returns the (h, w) de-interlaced index array (test
    oracle for the LZW/interlace layers)."""
    for w, h, idx, ct in iter_gif_frames(payload):
        if return_indices:
            return idx
        rgb = ct[idx.reshape(-1)]
        return {
            "kind": "gif", "width": w, "height": h, "channels": 3,
            "sample_rate": 0, "bits": 8, "n_values": w * h * 3,
            "sum_values": int(rgb.astype(np.int64).sum()),
        }
    raise ValueError("GIF contains no image frame")


def synth_gif_payload(media_id: int) -> bytes:
    """Deterministic REAL LZW-compressed GIF per id with closed-form
    decoded features: palette entry j = (j, 2j mod 256, 3j mod 256),
    index at raster position i = (id*31 + i) % 256 (the shared media
    pixel formula), w = 2 + id%7, h = 2 + id%5; every third id is
    INTERLACED (sum-invariant, pinned pixel-exact by pytest instead)."""
    mid = int(media_id)
    w, h = 2 + mid % 7, 2 + mid % 5
    idx = ((mid * 31 + np.arange(w * h, dtype=np.int64)) % 256).astype(
        np.uint8
    ).reshape(h, w)
    j = np.arange(256, dtype=np.int64)
    palette = np.stack([j, (2 * j) % 256, (3 * j) % 256], axis=1)
    return encode_gif(idx, palette, interlace=(mid % 3 == 0))


def encode_gif_animation(frame_indices: list[np.ndarray],
                         palette: np.ndarray) -> bytes:
    """Multi-frame GIF89a (animated-file shape): one global color table,
    a graphics-control extension + image descriptor per frame."""
    h, w = frame_indices[0].shape
    if any(f.shape != (h, w) for f in frame_indices):
        raise ValueError("frames must share dimensions")
    out = bytearray(b"GIF89a")
    out += int(w).to_bytes(2, "little") + int(h).to_bytes(2, "little")
    out.append(0xF7)
    out += b"\x00\x00"
    out += palette.astype(np.uint8).tobytes()
    for f in frame_indices:
        # graphics control extension (delay 10, no transparency)
        out += b"\x21\xf9\x04\x00\x0a\x00\x00\x00"
        out += b"\x2c" + b"\x00\x00\x00\x00"
        out += int(w).to_bytes(2, "little") + int(h).to_bytes(2, "little")
        out.append(0x00)
        out += lzw_encode(f.reshape(-1), 8)
    out.append(0x3B)
    return bytes(out)


def synth_gif_animation_payload(media_id: int) -> bytes:
    """Deterministic multi-frame GIF per id: 1 + id%3 frames, frame f's
    index at raster position i = (id*31 + f*97 + i) % 256, shared
    closed-form palette (synth_gif_payload's) — the REAL-decode input of
    the frame-sampling pipeline."""
    mid = int(media_id)
    w, h = 2 + mid % 7, 2 + mid % 5
    nf = 1 + mid % 3
    frames = [
        ((mid * 31 + f * 97 + np.arange(w * h, dtype=np.int64)) % 256)
        .astype(np.uint8).reshape(h, w)
        for f in range(nf)
    ]
    j = np.arange(256, dtype=np.int64)
    palette = np.stack([j, (2 * j) % 256, (3 * j) % 256], axis=1)
    return encode_gif_animation(frames, palette)
