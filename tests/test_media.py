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
def test_codec_decoders_are_gated(cls, kw):
    # payloads that are not PPM/BMP/WAV need codec libraries -> gated
    stage = cls(decoder="real", **kw)
    with pytest.raises(NotImplementedError):
        stage(_batch([b"abc"]))
    with pytest.raises(ValueError):
        cls(decoder="nope")


# --- real dependency-free decoders (PPM / BMP / WAV) ---

def test_decode_ppm_known_bytes():
    from graphminingtools_ray.stages.media import decode_ppm

    # 2x1 image, pixels (1,2,3) and (250,251,252); comment + multi-space
    # header exercises the tokenizer
    payload = b"P6\n# a comment\n2  1\n255\n" + bytes([1, 2, 3, 250, 251, 252])
    m = decode_ppm(payload)
    assert (m["width"], m["height"], m["channels"]) == (2, 1, 3)
    assert m["n_values"] == 6 and m["sum_values"] == 1 + 2 + 3 + 250 + 251 + 252
    with pytest.raises(ValueError):
        decode_ppm(b"P3\n1 1\n255\n1 2 3")  # ASCII PPM unsupported


def test_decode_bmp_padding_excluded():
    from graphminingtools_ray.stages.media import decode_bmp, synth_media_payload

    # width 3 -> stride 12, 3 padding bytes/row; synth id 1 is a 3x3 BMP
    m = decode_bmp(synth_media_payload(1))
    assert (m["width"], m["height"]) == (3, 3)
    px = (31 + np.arange(27)) % 256
    assert m["sum_values"] == int(px.sum())


def test_decode_wav_chunks_and_abs_sum():
    from graphminingtools_ray.stages.media import decode_wav, synth_media_payload

    m = decode_wav(synth_media_payload(5))  # ch=2, frames=21
    assert (m["sample_rate"], m["bits"], m["channels"]) == (8000, 16, 2)
    assert m["n_values"] == 42
    s = ((5 * 17 + 7 * np.arange(42)) % 65536) - 32768
    assert m["sum_values"] == int(np.abs(s).sum())
    with pytest.raises(ValueError):
        decode_wav(b"RIFF\x04\x00\x00\x00WAVE")  # missing fmt/data


def test_synth_roundtrip_all_kinds():
    from graphminingtools_ray.stages.media import decode_media, synth_media_payload

    for mid in range(60):
        m = decode_media(synth_media_payload(mid))
        k = mid % 3
        assert m["kind"] == ("ppm", "bmp", "wav")[k]
        if k < 2:
            w, h = 2 + mid % 7, 2 + mid % 5
            px = (mid * 31 + np.arange(w * h * 3)) % 256
            assert (m["width"], m["height"]) == (w, h)
            assert m["sum_values"] == int(px.sum())
        else:
            n = (16 + mid % 48) * (1 + mid % 2)
            s = ((mid * 17 + 7 * np.arange(n)) % 65536) - 32768
            assert m["n_values"] == n
            assert m["sum_values"] == int(np.abs(s).sum())


def test_feature_stub_real_decoder_on_parseable_payloads():
    from graphminingtools_ray.stages.media import synth_media_payload

    stage = MediaFeatureStub(decoder="real")
    out = stage(_batch([synth_media_payload(i) for i in range(3)]))
    feats = np.array(out["feature"].to_pylist())
    # ppm id 0: 2x2x3 px, mean 66/12; bmp id 1: 3x3; wav id 2: 8000 Hz 16-bit
    assert feats[0].tolist() == [2.0, 2.0, 3.0, 5.5]
    assert feats[1][:3].tolist() == [3.0, 3.0, 3.0]
    assert feats[2][:3].tolist() == [8000.0, 16.0, 1.0]


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


def test_jpeg_dc_fixtures_closed_form():
    """DC-only baseline-JPEG fixtures decode to the closed form the SQL
    twin computes: uniform blocks at (id*7 + 13*b) % 256."""
    import numpy as np

    from graphminingtools_ray.stages.jpeg import decode_jpeg, synth_jpeg_payload
    from graphminingtools_ray.stages.media import decode_media

    for mid in range(30):
        p = synth_jpeg_payload(mid)
        m = decode_media(p)  # dispatches on the FFD8 magic
        w, h = 8 * (1 + mid % 3), 8 * (1 + mid % 2)
        nb = (w // 8) * (h // 8)
        assert (m["kind"], m["width"], m["height"], m["channels"]) == (
            "jpeg", w, h, 1)
        assert m["n_values"] == w * h
        assert m["sum_values"] == 64 * sum(
            (mid * 7 + 13 * b) % 256 for b in range(nb))


def test_jpeg_coefficient_roundtrip():
    """Bitstream exactness: random planes (1 and 3 components, restart
    intervals on and off) encode then decode back to the exact quantized
    coefficient blocks — pins Huffman coding, zigzag, byte stuffing, DC
    prediction and RST handling."""
    import numpy as np

    from graphminingtools_ray.stages.jpeg import (
        decode_jpeg,
        encode_jpeg_baseline,
        fdct_block,
    )

    rng = np.random.default_rng(7)
    for trial in range(12):
        h, w = 8 * int(rng.integers(1, 4)), 8 * int(rng.integers(1, 4))
        nc = int(rng.choice([1, 3]))
        planes = [rng.integers(0, 256, size=(h, w)).astype(np.uint8)
                  for _ in range(nc)]
        quant = rng.integers(1, 32, size=64).astype(np.int64)
        quant[0] = max(quant[0], 4)
        ri = int(rng.choice([0, 0, 1, 2]))
        payload = encode_jpeg_baseline(planes, quant, restart_interval=ri)
        got = decode_jpeg(payload, return_coefficients=True)
        for ci, plane in enumerate(planes):
            bi = 0
            for r0 in range(0, h, 8):
                for c0 in range(0, w, 8):
                    coeffs = fdct_block(
                        plane[r0:r0 + 8, c0:c0 + 8].astype(np.float64) - 128)
                    qc = np.floor(
                        coeffs / quant.reshape(8, 8) + 0.5).astype(np.int64)
                    assert np.array_equal(
                        got[ci][bi], qc * quant.reshape(8, 8)), (trial, ci, bi)
                    bi += 1


def test_jpeg_idct_matches_independent_reference():
    """IDCT vs a structurally-independent 4-loop cosine implementation."""
    import math

    import numpy as np

    from graphminingtools_ray.stages.jpeg import idct_block

    def ref_idct(block):
        out = np.zeros((8, 8))
        for y in range(8):
            for x in range(8):
                s = 0.0
                for u in range(8):
                    for v in range(8):
                        cu = 1 / math.sqrt(2) if u == 0 else 1.0
                        cv = 1 / math.sqrt(2) if v == 0 else 1.0
                        s += (cu * cv * block[u, v]
                              * math.cos((2 * x + 1) * u * math.pi / 16)
                              * math.cos((2 * y + 1) * v * math.pi / 16))
                out[x, y] = s / 4
        return out

    rng = np.random.default_rng(11)
    for _ in range(4):
        blk = rng.integers(-300, 300, size=(8, 8)).astype(np.int64)
        assert np.allclose(idct_block(blk), ref_idct(blk), atol=1e-9)


def test_jpeg_lossy_decode_is_faithful():
    """End-to-end lossy sanity: with quant=1 the decode error per pixel is
    bounded by DCT rounding (<= a few levels); with a coarse table the
    image still decodes to the right shape."""
    import numpy as np

    from graphminingtools_ray.stages.jpeg import decode_jpeg, encode_jpeg_baseline

    rng = np.random.default_rng(3)
    # smooth gradient image: quant=1 keeps it near-exact
    x = np.arange(16)[None, :] + np.arange(24)[:, None]
    plane = (x * 5 % 256).astype(np.uint8)
    payload = encode_jpeg_baseline([plane], np.ones(64, np.int64))
    m = decode_jpeg(payload)
    assert (m["width"], m["height"]) == (16, 24)
    # reconstruct via the coefficient API to bound the pixel error
    coeffs = decode_jpeg(payload, return_coefficients=True)[0]
    from graphminingtools_ray.stages.jpeg import idct_block
    recon = np.zeros((24, 16))
    bi = 0
    for r0 in range(0, 24, 8):
        for c0 in range(0, 16, 8):
            recon[r0:r0 + 8, c0:c0 + 8] = idct_block(coeffs[bi]) + 128
            bi += 1
    assert np.abs(recon - plane.astype(np.float64)).max() < 4.0
    assert m["sum_values"] == int(
        np.clip(np.floor(recon + 0.5), 0, 255).astype(np.int64).sum())


def test_jpeg_unsupported_variants_raise():
    import numpy as np
    import pytest

    from graphminingtools_ray.stages.jpeg import decode_jpeg, synth_jpeg_payload

    p = bytearray(synth_jpeg_payload(1))
    # flip SOF0 -> SOF2 (progressive): find FF C0 and patch
    i = bytes(p).find(b"\xff\xc0")
    p[i + 1] = 0xC2
    with pytest.raises(NotImplementedError):
        decode_jpeg(bytes(p))
    with pytest.raises(ValueError):
        decode_jpeg(b"\x00\x11not a jpeg")


def test_png_closed_form_and_roundtrip():
    """PNG decoder: closed-form RGB fixtures (cycling all five row
    filters) + random roundtrips across color types; CRC verification."""
    import numpy as np
    import pytest

    from graphminingtools_ray.stages.media import decode_media
    from graphminingtools_ray.stages.png import (
        decode_png,
        encode_png,
        synth_png_payload,
    )

    for mid in range(25):
        m = decode_media(synth_png_payload(mid))  # FFD8... no: \x89PNG magic
        w, h = 2 + mid % 7, 2 + mid % 5
        assert (m["kind"], m["width"], m["height"], m["channels"]) == (
            "png", w, h, 3)
        assert m["sum_values"] == sum(
            (mid * 31 + i) % 256 for i in range(w * h * 3))

    rng = np.random.default_rng(5)
    for _ in range(8):
        ct = int(rng.choice([0, 2, 4, 6]))
        ch = {0: 1, 2: 3, 4: 2, 6: 4}[ct]
        h, w = int(rng.integers(1, 16)), int(rng.integers(1, 16))
        px = rng.integers(0, 256, size=(h, w, ch)).astype(np.uint8)
        for filters in ("zero", "cycle"):
            m = decode_png(encode_png(px, color_type=ct, filters=filters))
            assert m["sum_values"] == int(px.astype(np.int64).sum())
            assert (m["width"], m["height"], m["channels"]) == (w, h, ch)

    p = bytearray(synth_png_payload(3))
    p[20] ^= 0xFF
    with pytest.raises(ValueError):
        decode_png(bytes(p))


def test_png_palette_and_gates():
    """Palette expansion via PLTE; 16-bit / interlaced gates raise."""
    import struct
    import zlib

    import numpy as np
    import pytest

    from graphminingtools_ray.stages.png import _SIG, _chunk, decode_png

    # hand-built 2x2 palette image: indices [[0,1],[1,0]]
    plte = bytes([10, 20, 30, 200, 100, 50])
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0)
    rows = b"\x00" + bytes([0, 1]) + b"\x00" + bytes([1, 0])
    payload = (_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"PLTE", plte)
               + _chunk(b"IDAT", zlib.compress(rows)) + _chunk(b"IEND", b""))
    m = decode_png(payload)
    assert m["channels"] == 3 and m["n_values"] == 12
    assert m["sum_values"] == 2 * (10 + 20 + 30) + 2 * (200 + 100 + 50)

    ihdr16 = struct.pack(">IIBBBBB", 2, 2, 16, 0, 0, 0, 0)
    bad = (_SIG + _chunk(b"IHDR", ihdr16)
           + _chunk(b"IDAT", zlib.compress(b"\x00" * 10))
           + _chunk(b"IEND", b""))
    with pytest.raises(NotImplementedError):
        decode_png(bad)


def test_jpeg_fill_bytes_and_truncation():
    """T.81 B.1.1.2 fill bytes before markers parse; a truncated entropy
    stream raises a parse-level error, not an arithmetic one."""
    import pytest

    from graphminingtools_ray.stages.jpeg import decode_jpeg, synth_jpeg_payload

    p = synth_jpeg_payload(4)
    ref = decode_jpeg(p)
    # inject a fill 0xFF before the DQT marker (FF DB)
    i = p.find(b"\xff\xdb")
    padded = p[:i] + b"\xff" + p[i:]
    assert decode_jpeg(padded) == ref
    # truncate mid-entropy-data: must raise a ValueError (bad stream), not
    # a negative-shift arithmetic error
    with pytest.raises((ValueError, NotImplementedError)):
        decode_jpeg(p[: len(p) - 12])


def test_gif_closed_form_and_roundtrip():
    """GIF decoder: closed-form fixtures (every third id interlaced) +
    pixel-exact LZW/interlace roundtrips incl. dictionary resets."""
    import numpy as np
    import pytest

    from graphminingtools_ray.stages.gif import (
        decode_gif,
        encode_gif,
        synth_gif_payload,
    )
    from graphminingtools_ray.stages.media import decode_media

    for mid in range(24):
        m = decode_media(synth_gif_payload(mid))
        w, h = 2 + mid % 7, 2 + mid % 5
        want = sum(
            x + (2 * x) % 256 + (3 * x) % 256
            for x in (((mid * 31 + i) % 256) for i in range(w * h))
        )
        assert (m["kind"], m["width"], m["height"], m["channels"]) == (
            "gif", w, h, 3)
        assert m["sum_values"] == want

    rng = np.random.default_rng(5)
    pal = rng.integers(0, 256, size=(256, 3)).astype(np.uint8)
    # large random image: many LZW width increases + 4096-entry resets;
    # interlace path verified pixel-exact (the sum alone cannot see it)
    idx = rng.integers(0, 256, size=(120, 90)).astype(np.uint8)
    for il in (False, True):
        got = decode_gif(encode_gif(idx, pal, interlace=il),
                         return_indices=True)
        assert np.array_equal(got, idx), il

    with pytest.raises(ValueError):
        decode_gif(b"NOTGIF" + b"\x00" * 20)


def test_gif_animation_frames():
    """Animated GIF: iter_gif_frames yields every frame pixel-exact; the
    GifFrameFeatures flat-map stage multiplies rows with stride support."""
    import numpy as np
    import pyarrow as pa

    from graphminingtools_ray.stages.gif import (
        encode_gif_animation,
        iter_gif_frames,
        synth_gif_animation_payload,
    )
    from graphminingtools_ray.stages.media import GifFrameFeatures

    rng = np.random.default_rng(4)
    pal = rng.integers(0, 256, size=(256, 3)).astype(np.uint8)
    frames = [rng.integers(0, 256, size=(12, 9)).astype(np.uint8)
              for _ in range(4)]
    payload = encode_gif_animation(frames, pal)
    got = list(iter_gif_frames(payload))
    assert len(got) == 4
    for f, (w, h, idx, ct) in zip(frames, got):
        assert (w, h) == (9, 12)
        assert np.array_equal(idx, f)
        assert np.array_equal(ct, pal)

    batch = pa.table({
        "media_id": pa.array([7], pa.int64()),
        "payload": pa.array([payload], pa.binary()),
    })
    out = GifFrameFeatures()(batch)
    assert out["frame_index"].to_pylist() == [0, 1, 2, 3]
    assert out["sum_values"].to_pylist() == [
        int(pal[f.reshape(-1)].astype(np.int64).sum()) for f in frames
    ]
    out2 = GifFrameFeatures(stride=2)(batch)
    assert out2["frame_index"].to_pylist() == [0, 2]

    # the synthetic fixture has 1 + id%3 frames
    for mid in (0, 1, 2, 5):
        n = len(list(iter_gif_frames(synth_gif_animation_payload(mid))))
        assert n == 1 + mid % 3


def test_warc_parse_roundtrip():
    """WARC reader: plain and per-record-gzipped layouts round-trip;
    headers parse; truncation and framing errors raise."""
    import pytest

    from graphminingtools_ray.sources.warc import (
        build_warc,
        parse_warc,
        synth_warc_payload,
    )

    records = [
        ({"WARC-Type": "warcinfo"}, b"software: test"),
        ({"WARC-Type": "response",
          "WARC-Target-URI": "https://x.test/a"},
         "héllo\r\nworld".encode("utf-8")),
        ({"WARC-Type": "response"}, b""),  # empty body
    ]
    for gz in (False, True):
        got = parse_warc(build_warc(records, gzip_members=gz))
        assert len(got) == 3
        assert [h["warc-type"] for h, _ in got] == [
            "warcinfo", "response", "response"]
        assert got[1][0]["warc-target-uri"] == "https://x.test/a"
        assert [b for _, b in got] == [b for _, b in records]
        assert all(h["warc-version"] == "WARC/1.0" for h, _ in got)

    p = synth_warc_payload(3, "abc")  # odd id -> gzip members
    assert p[:2] == b"\x1f\x8b"
    assert parse_warc(p)[1][1] == b"abc"
    assert synth_warc_payload(2, "abc")[:5] == b"WARC/"

    plain = build_warc(records)
    with pytest.raises(ValueError):
        parse_warc(plain[:-20])  # truncated body
    with pytest.raises(ValueError):
        parse_warc(b"HTTP/1.1 200 OK\r\n\r\n")
