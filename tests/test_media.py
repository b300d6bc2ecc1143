"""Multimodal stage plumbing (stages/media.py): schema/determinism for the
decode-feature, resize and frame-sample stubs, the flat-map row-count
contract, the real-decoder NotImplementedError gates, and the chained
media_frame_features pipeline."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from graphminingtools_ray.stages.media import (
    FEATURE_DIM,
    FrameSampleStub,
    MediaFeatureStub,
    MediaResizeStub,
)


def _batch(payloads):
    return pa.table(
        {
            "media_id": pa.array(range(len(payloads)), pa.int64()),
            "payload": pa.array(payloads, pa.binary()),
        }
    )


PAYLOADS = [b"hello media", b"", b"x" * 5000, None]


def test_feature_stub_deterministic_schema():
    stage = MediaFeatureStub()
    out = stage(_batch(PAYLOADS))
    assert out.column_names == ["media_id", "n_bytes", "payload_sha256", "feature"]
    assert out["n_bytes"].to_pylist() == [11, 0, 5000, 0]
    again = stage(_batch(PAYLOADS))
    assert out.equals(again)
    feats = np.array(out["feature"].to_pylist())
    assert feats.shape == (4, FEATURE_DIM)
    assert ((feats >= 0) & (feats < 1)).all()


def test_resize_stub_size_class_and_determinism():
    stage = MediaResizeStub(target_w=16, target_h=8)
    out = stage(_batch(PAYLOADS))
    assert out.column_names == ["media_id", "payload", "width", "height"]
    assert all(len(p) == 16 * 8 for p in out["payload"].to_pylist())
    assert out["width"].to_pylist() == [16] * 4
    assert out.equals(stage(_batch(PAYLOADS)))
    # different payload -> different resized bytes (content-derived stub)
    ps = out["payload"].to_pylist()
    assert ps[0] != ps[2]


def test_frame_sample_flatmap_contract():
    stage = FrameSampleStub(stride=2, n_frames=8)
    out = stage(_batch(PAYLOADS))
    # 4 sampled frames (0,2,4,6) per media row
    assert out.num_rows == 4 * len(PAYLOADS)
    assert out.column_names == ["media_id", "frame_index", "frame"]
    assert out["frame_index"].to_pylist()[:4] == [0, 2, 4, 6]
    assert out.equals(stage(_batch(PAYLOADS)))


@pytest.mark.parametrize("cls,kw", [
    (MediaFeatureStub, {}),
    (MediaResizeStub, {}),
    (FrameSampleStub, {}),
])
def test_real_decoders_are_gated(cls, kw):
    stage = cls(decoder="real", **kw)
    with pytest.raises(NotImplementedError):
        stage(_batch([b"abc"]))
    with pytest.raises(ValueError):
        cls(decoder="nope")


def test_media_frame_features_pipeline(ray_session):
    from graphminingtools_ray.pipelines.text_q import media_frame_features

    out = media_frame_features("/root/testdata/sf0.001").to_pandas()
    # 4 frames per doc (stride 2 over 8), 500 docs
    assert len(out) == 4 * 500
    assert set(out.columns) == {
        "media_id", "frame_index", "n_bytes", "payload_sha256", "feature",
    }
    assert sorted(out["frame_index"].unique()) == [0, 2, 4, 6]
    # frames are the resized-then-sampled 32-byte stubs
    assert (out["n_bytes"] == 32).all()
