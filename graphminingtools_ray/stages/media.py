"""Multimodal (image/audio/video) column plumbing.

Media arrives as opaque ``binary`` payload columns with typed metadata; the
decode / feature-extract step is an actor-pool ``map_batches`` stage.

REAL decode is implemented dependency-free for three self-describing
container formats whose specs are public and byte-exact — binary PPM (P6),
uncompressed 24-bit BMP, and PCM WAV — with pure-numpy parsers
(``decode_ppm`` / ``decode_bmp`` / ``decode_wav`` / ``decode_media``),
plus baseline sequential JPEG (Huffman + IDCT per ITU-T T.81) in
``stages/jpeg.py``. Features are INTEGER-EXACT (dimensions, channel
counts, value sums), so the decode path is driver-gate checkable end to
end: ``synth_media_payload`` / ``synth_jpeg_payload`` build deterministic
closed-form payloads per id, the decoder parses the real bytes, and a
DuckDB twin recomputes the same sums symbolically. Formats that genuinely
need codec libraries (MP3/H.264; progressive/subsampled JPEG) remain gated
``NotImplementedError`` — the plumbing for those (schema, batch sizing,
actor signature, flat-map layout) is identical and exercised by the stubs.

For large payloads, call sites should use small ``batch_size`` (payload ×
batch × concurrency must fit the worker heap) and ``batch_format="pyarrow"``
(binary columns round-trip poorly through pandas).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

FEATURE_DIM = 4


class MediaFeatureStub:
    """payload binary → (n_bytes, payload_sha256, feature list<float64>).

    ``decoder="stub"`` derives a deterministic FEATURE_DIM-float fake
    embedding from the payload hash. ``decoder="real"`` parses the payload
    with the dependency-free PPM/BMP/WAV decoders below (codec formats that
    need external libraries still raise).
    """

    def __init__(self, decoder: str = "stub", id_col: str = "media_id",
                 payload_col: str = "payload",
                 passthrough_cols: tuple[str, ...] = ()):
        if decoder not in ("stub", "real"):
            raise ValueError(f"unknown decoder {decoder!r}")
        self.decoder = decoder
        self.id_col = id_col
        self.payload_col = payload_col
        self.passthrough_cols = tuple(passthrough_cols)

    def _decode_real(self, payload: bytes) -> np.ndarray:
        """Real parse (PPM/BMP/WAV) → FEATURE_DIM floats: (dim1, dim2,
        channels, mean value rounded half-away to 6). Codec formats raise."""
        m = decode_media(payload)
        mean = m["sum_values"] / m["n_values"] if m["n_values"] else 0.0
        scale = 10.0**6
        mean = np.floor(abs(mean) * scale + 0.5) / scale
        d1 = m["width"] or m["sample_rate"]
        d2 = m["height"] or m["bits"]
        return np.array([d1, d2, m["channels"], mean], np.float64)

    def _decode_stub(self, payload: bytes) -> np.ndarray:
        d = hashlib.blake2b(payload, digest_size=8 * FEATURE_DIM).digest()
        raw = np.frombuffer(d, dtype="<u8").astype(np.float64)
        return np.round(raw / float(1 << 64), 6)

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch[self.payload_col].to_pylist()
        feats = np.empty((len(payloads), FEATURE_DIM), dtype=np.float64)
        n_bytes = np.empty(len(payloads), dtype=np.int64)
        hashes = []
        decode = self._decode_stub if self.decoder == "stub" else self._decode_real
        for i, p in enumerate(payloads):
            p = p or b""
            n_bytes[i] = len(p)
            hashes.append(hashlib.sha256(p).hexdigest())
            feats[i] = decode(p)
        cols = {self.id_col: batch[self.id_col]}
        for c in self.passthrough_cols:
            cols[c] = batch[c]
        cols["n_bytes"] = pa.array(n_bytes)
        cols["payload_sha256"] = pa.array(hashes, pa.string())
        cols["feature"] = pa.array(
            list(feats), pa.list_(pa.float64(), FEATURE_DIM)
        )
        return pa.table(cols)


class MediaResizeStub:
    """payload binary → resized payload binary + (width, height) metadata —
    the image-resize stage shape. ``decoder="real"`` is where PIL's
    ``Image.open(...).resize((w, h))`` would run (unavailable here by
    design); the stub emits a deterministic size-``target_w*target_h``
    byte payload derived from a seeded blake2 stream so downstream stages
    exercise real binary columns of the post-resize SIZE CLASS (what batch
    sizing actually depends on)."""

    def __init__(self, target_w: int = 64, target_h: int = 64,
                 decoder: str = "stub", id_col: str = "media_id",
                 payload_col: str = "payload"):
        if decoder not in ("stub", "real"):
            raise ValueError(f"unknown decoder {decoder!r}")
        self.w, self.h = int(target_w), int(target_h)
        self.decoder = decoder
        self.id_col = id_col
        self.payload_col = payload_col

    def _resize_real(self, payload: bytes) -> bytes:
        raise NotImplementedError(
            "real image resize requires PIL/ffmpeg, not present here; "
            "use decoder='stub'"
        )

    def _resize_stub(self, payload: bytes) -> bytes:
        n = self.w * self.h
        out = bytearray()
        ctr = 0
        seed = hashlib.blake2b(payload, digest_size=16).digest()
        while len(out) < n:
            out += hashlib.blake2b(
                seed + ctr.to_bytes(8, "little"), digest_size=64
            ).digest()
            ctr += 1
        return bytes(out[:n])

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch[self.payload_col].to_pylist()
        fn = self._resize_stub if self.decoder == "stub" else self._resize_real
        resized = [fn(p or b"") for p in payloads]
        return pa.table(
            {
                self.id_col: batch[self.id_col],
                "payload": pa.array(resized, pa.binary()),
                "width": pa.array([self.w] * len(resized), pa.int32()),
                "height": pa.array([self.h] * len(resized), pa.int32()),
            }
        )


class FrameSampleStub:
    """video payload binary → one row PER SAMPLED FRAME (media_id,
    frame_index, frame binary) — the frame-sampling stage shape (a
    flat-map: output rows ≠ input rows, which is the part worth pinning in
    tests). ``decoder="real"`` is where an ffmpeg seek/decode would run;
    the stub derives ``n_frames`` deterministic frame payloads per video
    and samples every ``stride``-th."""

    def __init__(self, stride: int = 2, n_frames: int = 8,
                 decoder: str = "stub", id_col: str = "media_id",
                 payload_col: str = "payload"):
        if decoder not in ("stub", "real"):
            raise ValueError(f"unknown decoder {decoder!r}")
        self.stride = max(1, int(stride))
        self.n_frames = int(n_frames)
        self.decoder = decoder
        self.id_col = id_col
        self.payload_col = payload_col

    def _frames_real(self, payload: bytes):
        raise NotImplementedError(
            "real frame sampling requires ffmpeg, not present here; "
            "use decoder='stub'"
        )

    def _frames_stub(self, payload: bytes):
        seed = hashlib.blake2b(payload, digest_size=16).digest()
        for i in range(0, self.n_frames, self.stride):
            yield i, hashlib.blake2b(
                seed + i.to_bytes(4, "little"), digest_size=32
            ).digest()

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids_out, idx_out, frames = [], [], []
        fn = self._frames_stub if self.decoder == "stub" else self._frames_real
        for mid, p in zip(
            batch[self.id_col].to_pylist(),
            batch[self.payload_col].to_pylist(),
        ):
            for i, frame in fn(p or b""):
                ids_out.append(mid)
                idx_out.append(i)
                frames.append(frame)
        return pa.table(
            {
                self.id_col: pa.array(ids_out, batch[self.id_col].type),
                "frame_index": pa.array(idx_out, pa.int32()),
                "frame": pa.array(frames, pa.binary()),
            }
        )


# ---------------------------------------------------------------------------
# Real dependency-free decoders: binary PPM (P6), uncompressed 24-bit BMP,
# PCM WAV. Each returns the typed metadata dict consumed by MediaDecode:
# {kind, width, height, channels, sample_rate, bits, n_values, sum_values}
# where n_values / sum_values are integer-exact over the decoded samples
# (pixel bytes for images, abs(int16) for audio) — order-invariant, so the
# BMP bottom-up row layout and WAV channel interleave need no canonical
# ordering to compare exactly.
# ---------------------------------------------------------------------------


def _ppm_header_tokens(payload: bytes, n_tokens: int):
    """Tokenize a PNM header: whitespace-separated fields, ``#`` comments to
    end-of-line, single whitespace byte after the last field before raster."""
    toks, i, tok = [], 0, b""
    while len(toks) < n_tokens:
        if i >= len(payload):
            raise ValueError("truncated PPM header")
        c = payload[i : i + 1]
        if c == b"#":
            while i < len(payload) and payload[i : i + 1] not in (b"\n", b"\r"):
                i += 1
        elif c in (b" ", b"\t", b"\n", b"\r", b"\x0b", b"\x0c"):
            if tok:
                toks.append(tok)
                tok = b""
            i += 1
        else:
            tok += c
            i += 1
    return toks, i


def decode_ppm(payload: bytes) -> dict:
    """Binary PPM (Netpbm P6): ``P6 <w> <h> <maxval>`` header then raw RGB
    bytes (1 byte/sample for maxval < 256)."""
    toks, off = _ppm_header_tokens(payload, 4)
    if toks[0] != b"P6":
        raise ValueError("not a P6 PPM")
    w, h, maxval = int(toks[1]), int(toks[2]), int(toks[3])
    if not (0 < maxval < 256):
        raise ValueError(f"unsupported PPM maxval {maxval}")
    n = w * h * 3
    px = np.frombuffer(payload, np.uint8, count=n, offset=off)
    return {
        "kind": "ppm", "width": w, "height": h, "channels": 3,
        "sample_rate": 0, "bits": 8, "n_values": n,
        "sum_values": int(px.astype(np.int64).sum()),
    }


def decode_bmp(payload: bytes) -> dict:
    """Uncompressed 24-bit BMP (BITMAPINFOHEADER): pixel rows bottom-up,
    each padded to a 4-byte boundary; padding excluded from the sum."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP")
    off = int.from_bytes(payload[10:14], "little")
    w = int.from_bytes(payload[18:22], "little", signed=True)
    h = int.from_bytes(payload[22:26], "little", signed=True)
    bpp = int.from_bytes(payload[28:30], "little")
    comp = int.from_bytes(payload[30:34], "little")
    if bpp != 24 or comp != 0:
        raise ValueError(f"unsupported BMP (bpp={bpp}, compression={comp})")
    h_abs = abs(h)
    stride = ((w * 3 + 3) // 4) * 4
    rows = np.frombuffer(
        payload, np.uint8, count=stride * h_abs, offset=off
    ).reshape(h_abs, stride)[:, : w * 3]
    return {
        "kind": "bmp", "width": w, "height": h_abs, "channels": 3,
        "sample_rate": 0, "bits": 8, "n_values": w * h_abs * 3,
        "sum_values": int(rows.astype(np.int64).sum()),
    }


def decode_wav(payload: bytes) -> dict:
    """PCM WAV (RIFF/WAVE): walk the chunk list for ``fmt `` and ``data``;
    16-bit samples, sum = Σ|sample| (int64-exact)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    i, fmt, data = 12, None, None
    while i + 8 <= len(payload):
        cid = payload[i : i + 4]
        size = int.from_bytes(payload[i + 4 : i + 8], "little")
        body = payload[i + 8 : i + 8 + size]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        i += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_fmt = int.from_bytes(fmt[0:2], "little")
    channels = int.from_bytes(fmt[2:4], "little")
    sample_rate = int.from_bytes(fmt[4:8], "little")
    bits = int.from_bytes(fmt[14:16], "little")
    if audio_fmt != 1 or bits != 16:
        raise ValueError(f"unsupported WAV (fmt={audio_fmt}, bits={bits})")
    samples = np.frombuffer(data, "<i2", count=len(data) // 2)
    return {
        "kind": "wav", "width": 0, "height": 0, "channels": channels,
        "sample_rate": sample_rate, "bits": bits, "n_values": len(samples),
        "sum_values": int(np.abs(samples.astype(np.int64)).sum()),
    }


def decode_media(payload: bytes) -> dict:
    """Magic-byte dispatch over the supported real formats."""
    if payload[:2] == b"P6":
        return decode_ppm(payload)
    if payload[:2] == b"BM":
        return decode_bmp(payload)
    if payload[:4] == b"RIFF":
        return decode_wav(payload)
    if payload[:2] == b"\xff\xd8":
        # baseline sequential JPEG: dependency-free Huffman + IDCT decoder
        # (stages/jpeg.py, ITU-T T.81); progressive/subsampled raise there
        from .jpeg import decode_jpeg

        return decode_jpeg(payload)
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        # PNG: stdlib zlib + numpy filter reconstruction (stages/png.py);
        # 16-bit depth / Adam7 interlace raise there
        from .png import decode_png

        return decode_png(payload)
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        # GIF: pure-Python LZW + palette expansion (stages/gif.py);
        # first frame of animated files, interlacing handled
        from .gif import decode_gif

        return decode_gif(payload)
    raise NotImplementedError(
        "real decode supports PPM/BMP/WAV, baseline JPEG, 8-bit PNG and "
        "GIF; remaining codec formats (MP3/H.264/...) require libraries "
        "not present in this environment"
    )


def synth_media_payload(media_id: int) -> bytes:
    """Deterministic closed-form payload per id — REAL bytes in one of the
    three supported formats, with every decoded feature recomputable
    symbolically (the DuckDB twin of ``media_features_real``):

    - ``media_id % 3 == 0`` → P6 PPM, w = 2 + id%7, h = 2 + id%5,
      pixel byte i = (id*31 + i) % 256 over i in [0, w*h*3)
    - ``media_id % 3 == 1`` → 24-bit BMP, same w/h/pixel formula (pixel i
      numbered in BMP row order; the sum is order-invariant)
    - ``media_id % 3 == 2`` → 16-bit PCM WAV, 8000 Hz, ch = 1 + id%2,
      frames = 16 + id%48, sample i = ((id*17 + i*7) % 65536) - 32768
    """
    mid = int(media_id)
    k = mid % 3
    if k < 2:
        w, h = 2 + mid % 7, 2 + mid % 5
        px = ((mid * 31 + np.arange(w * h * 3, dtype=np.int64)) % 256).astype(
            np.uint8
        )
        if k == 0:
            return b"P6\n%d %d\n255\n" % (w, h) + px.tobytes()
        stride = ((w * 3 + 3) // 4) * 4
        rows = np.zeros((h, stride), np.uint8)
        rows[:, : w * 3] = px.reshape(h, w * 3)
        body = rows.tobytes()
        off = 14 + 40
        header = (
            b"BM"
            + (off + len(body)).to_bytes(4, "little")
            + b"\x00\x00\x00\x00"
            + off.to_bytes(4, "little")
            + (40).to_bytes(4, "little")
            + w.to_bytes(4, "little", signed=True)
            + h.to_bytes(4, "little", signed=True)
            + (1).to_bytes(2, "little")
            + (24).to_bytes(2, "little")
            + (0).to_bytes(4, "little")
            + len(body).to_bytes(4, "little")
            + (2835).to_bytes(4, "little") * 2
            + (0).to_bytes(4, "little") * 2
        )
        return header + body
    ch, frames, sr = 1 + mid % 2, 16 + mid % 48, 8000
    n = frames * ch
    s = (((mid * 17 + 7 * np.arange(n, dtype=np.int64)) % 65536) - 32768).astype(
        "<i2"
    )
    data = s.tobytes()
    fmt = (
        (1).to_bytes(2, "little")
        + ch.to_bytes(2, "little")
        + sr.to_bytes(4, "little")
        + (sr * ch * 2).to_bytes(4, "little")
        + (ch * 2).to_bytes(2, "little")
        + (16).to_bytes(2, "little")
    )
    return (
        b"RIFF"
        + (4 + 8 + len(fmt) + 8 + len(data)).to_bytes(4, "little")
        + b"WAVE"
        + b"fmt "
        + len(fmt).to_bytes(4, "little")
        + fmt
        + b"data"
        + len(data).to_bytes(4, "little")
        + data
    )


class GifFrameFeatures:
    """REAL frame-sampling stage (the video-style flat-map shape of
    FrameSampleStub, with an actual decoder behind it): each (possibly
    animated) GIF payload explodes into one row PER FRAME — every
    ``stride``-th frame kept — with integer-exact per-frame features
    (width, height, sum of palette-expanded RGB). Output rows ≠ input
    rows; per-payload work is the pure-Python LZW decode (stages/gif.py)."""

    def __init__(self, stride: int = 1, id_col: str = "media_id",
                 payload_col: str = "payload"):
        self.stride = max(1, int(stride))
        self.id_col = id_col
        self.payload_col = payload_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        from .gif import iter_gif_frames

        ids_out, fidx, ws, hs, sums = [], [], [], [], []
        for mid, p in zip(
            batch[self.id_col].to_pylist(),
            batch[self.payload_col].to_pylist(),
        ):
            for f, (w, h, idx, ct) in enumerate(iter_gif_frames(p or b"")):
                if f % self.stride:
                    continue
                ids_out.append(mid)
                fidx.append(f)
                ws.append(w)
                hs.append(h)
                sums.append(
                    int(ct[idx.reshape(-1)].astype(np.int64).sum())
                )
        return pa.table(
            {
                self.id_col: pa.array(ids_out, batch[self.id_col].type),
                "frame_index": pa.array(fidx, pa.int64()),
                "width": pa.array(ws, pa.int64()),
                "height": pa.array(hs, pa.int64()),
                "sum_values": pa.array(sums, pa.int64()),
            }
        )


class MediaDecode:
    """Actor-pool stage: payload binary → typed integer-exact media features
    (kind, width, height, channels, sample_rate, n_values, sum_values) via
    the REAL format parsers. Per-payload work is numpy (``np.frombuffer`` +
    one vector sum); the payload list itself is the unavoidable per-row
    boundary of a variable-length binary column."""

    def __init__(self, id_col: str = "media_id", payload_col: str = "payload"):
        self.id_col = id_col
        self.payload_col = payload_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch[self.payload_col].to_pylist()
        metas = [decode_media(p or b"") for p in payloads]
        cols = {self.id_col: batch[self.id_col]}
        cols["kind"] = pa.array([m["kind"] for m in metas], pa.string())
        for f in ("width", "height", "channels", "sample_rate", "n_values",
                  "sum_values"):
            cols[f] = pa.array([m[f] for m in metas], pa.int64())
        return pa.table(cols)
