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
                 payload_col: str = "payload"):
        if decoder not in ("stub", "real"):
            raise ValueError(f"unknown decoder {decoder!r}")
        self.decoder = decoder
        self.id_col = id_col
        self.payload_col = payload_col

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
        return pa.table(
            {
                self.id_col: batch[self.id_col],
                "n_bytes": pa.array(n_bytes),
                "payload_sha256": pa.array(hashes, pa.string()),
                "feature": pa.array(list(feats), pa.list_(pa.float64(), FEATURE_DIM)),
            }
        )
