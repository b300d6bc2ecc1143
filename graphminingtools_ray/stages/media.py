"""Multimodal (image/audio/video) column plumbing.

Media arrives as opaque ``binary`` payload columns with typed metadata; the
decode / feature-extract step is an actor-pool ``map_batches`` stage. The
imaging/audio libraries are NOT available in this environment, so the real
decoder is gated behind ``NotImplementedError`` and a deterministic stub
stands in — the Ray-side plumbing (schema, batch sizing, actor signature,
output layout) is real and tested.

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
    embedding from the payload hash. ``decoder="real"`` is where a PIL /
    ffmpeg decode would run — unavailable here by design.
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
        raise NotImplementedError(
            "real media decode requires imaging/audio libraries not present "
            "in this environment; use decoder='stub'"
        )

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
