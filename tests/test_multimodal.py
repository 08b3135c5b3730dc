"""Multimodal binary-column plumbing tests (decode stubbed, plumbing real)."""

from __future__ import annotations

import pytest

from bionext_spark.operators.multimodal import (
    _decode_image,
    decode_stub,
    extract_features,
    media_stats,
    sample_frames,
    synth_media,
)
from bionext_spark.plans import read_schema


def test_feature_extraction_deterministic(spark):
    media = synth_media(spark, 16)
    feats = {r["media_id"]: r["features"] for r in extract_features(media).collect()}
    assert len(feats) == 16 and all(len(v) == 8 for v in feats.values())
    # deterministic: same payload → same features
    local = {r["media_id"]: decode_stub(bytes(r["payload"]), r["meta"]["format"]) for r in media.collect()}
    assert feats == local


def test_real_codec_is_stubbed():
    with pytest.raises(NotImplementedError):
        _decode_image(b"x", "png")


def test_frame_sampling(spark):
    media = synth_media(spark, 8)
    rows = sample_frames(media, every_k=4).collect()
    by_id = {}
    for r in rows:
        by_id.setdefault(r["media_id"], []).append(r["frame_idx"])
    for r in media.collect():
        assert by_id[r["media_id"]] == list(range(0, r["meta"]["n_frames"], 4))


def test_metadata_stats_prune_payload(spark, tmp_path):
    synth_media(spark, 32).write.parquet(str(tmp_path / "media"))
    media = spark.read.parquet(str(tmp_path / "media"))
    df = media_stats(media)
    rs = read_schema(df)
    assert "payload" not in rs, rs  # binary column pruned from the scan
    out = {r["format"]: r["n"] for r in df.collect()}
    assert sum(out.values()) == 32


def test_real_codec_pil_gated(spark):
    """PIL-backed decode path (extras gate): skipped where Pillow is
    absent; on a PIL-equipped machine, real PNG payloads decode through
    the same mapInPandas plumbing and schema as the stub path."""
    Image = pytest.importorskip("PIL.Image")
    import io

    from bionext_spark.operators.multimodal import MEDIA_SCHEMA, extract_features

    rows = []
    for i in range(4):
        img = Image.new("RGB", (8, 8), (i * 40, 100, 200 - i * 30))
        buf = io.BytesIO()
        img.save(buf, format="PNG")
        rows.append((i, bytearray(buf.getvalue()),
                     {"format": "png", "width": 8, "height": 8, "n_frames": 1}))
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = {r["media_id"]: r["features"] for r in
           extract_features(media, use_real_codec=True).collect()}
    assert len(out) == 4
    for feats in out.values():
        assert len(feats) == 8 and all(-1.0 <= f <= 1.0 for f in feats)


def test_real_codec_raises_without_pil():
    """Without Pillow the hook must refuse loudly, never fabricate."""
    try:
        import PIL  # noqa: F401
        pytest.skip("Pillow installed; the raise path is unreachable")
    except ImportError:
        pass
    from bionext_spark.operators.multimodal import _decode_image

    with pytest.raises(NotImplementedError):
        _decode_image(b"\x89PNG...", "png")


# --- gated audio/video hooks: executed in-image against fake codec shims
# (the HF-shim pattern) so the REAL code paths run without the libraries ---


def test_audio_hook_gated():
    from bionext_spark.operators.multimodal import _decode_audio

    try:
        import soundfile  # noqa: F401

        pytest.skip("soundfile present; gate path not exercisable")
    except ImportError:
        pass
    with pytest.raises(NotImplementedError, match="soundfile"):
        _decode_audio(b"RIFF....", "wav")


def test_video_hook_gated():
    from bionext_spark.operators.multimodal import _decode_video

    try:
        import imageio  # noqa: F401

        pytest.skip("imageio present; gate path not exercisable")
    except ImportError:
        pass
    with pytest.raises(NotImplementedError, match="imageio"):
        _decode_video(b"\x00\x00\x00 ftyp", "mp4")


def test_audio_decode_executes_against_shim(monkeypatch):
    """Full _decode_audio path (read → downmix → 8-bin RMS envelope) with
    a fake soundfile module: stereo ramp input, envelope values verified
    against a hand computation."""
    import sys
    import types

    import numpy as np

    def fake_read(buf):
        # 16 stereo samples; channel mean = [0, 1/15, ..., 1]
        mono = np.linspace(0, 1, 16)
        return np.stack([mono, mono], axis=1), 16000

    monkeypatch.setitem(sys.modules, "soundfile", types.SimpleNamespace(read=fake_read))
    from bionext_spark.operators.multimodal import _decode_audio

    out = _decode_audio(b"irrelevant", "wav")
    mono = np.linspace(0, 1, 16)
    expected = [
        float(min(1.0, np.sqrt((b**2).mean())) * 2 - 1) for b in np.array_split(mono, 8)
    ]
    assert out == pytest.approx(expected)
    assert all(-1.0 <= v <= 1.0 for v in out)


def test_video_decode_executes_against_shim(monkeypatch):
    """Full _decode_video path (first frame → grayscale → 4×2 average pool
    → [-1, 1]) with a fake imageio.v3 module; a constant-gray frame pools
    to a constant vector."""
    import sys
    import types

    import numpy as np

    def fake_imiter(payload, extension=None):
        yield np.full((8, 16, 3), 127.5)
        yield np.zeros((8, 16, 3))  # later frames must not be read

    v3 = types.SimpleNamespace(imiter=fake_imiter)
    monkeypatch.setitem(sys.modules, "imageio", types.SimpleNamespace(v3=v3))
    monkeypatch.setitem(sys.modules, "imageio.v3", v3)
    from bionext_spark.operators.multimodal import _decode_video

    out = _decode_video(b"irrelevant", "mp4")
    assert out == pytest.approx([0.0] * 8)


def test_decode_real_dispatches_by_format():
    from bionext_spark.operators.multimodal import decode_real

    with pytest.raises(NotImplementedError, match="Pillow|libvips"):
        decode_real(b"x", "png")
    with pytest.raises(NotImplementedError, match="soundfile"):
        decode_real(b"x", "wav")
    with pytest.raises(NotImplementedError, match="imageio"):
        decode_real(b"x", "mp4")
    with pytest.raises(NotImplementedError, match="unknown media format"):
        decode_real(b"x", "tarball")


def test_video_tiny_frame_falls_back_to_whole_frame_mean(monkeypatch):
    """Frames smaller than the 2x4 pool grid must not yield NaN (empty
    slices); the guard falls back to the whole-frame mean for all 8 bins."""
    import sys
    import types

    import numpy as np

    def fake_imiter(payload, extension=None):
        yield np.full((1, 2), 255.0)  # 1x2 frame: below the 2x4 grid

    v3 = types.SimpleNamespace(imiter=fake_imiter)
    monkeypatch.setitem(sys.modules, "imageio", types.SimpleNamespace(v3=v3))
    monkeypatch.setitem(sys.modules, "imageio.v3", v3)
    from bionext_spark.operators.multimodal import _decode_video

    out = _decode_video(b"irrelevant", "mp4")
    assert out == pytest.approx([1.0] * 8)
    assert all(v == v for v in out)  # no NaN


def test_video_empty_stream_raises_clearly(monkeypatch):
    import sys
    import types

    def fake_imiter(payload, extension=None):
        return iter(())

    v3 = types.SimpleNamespace(imiter=fake_imiter)
    monkeypatch.setitem(sys.modules, "imageio", types.SimpleNamespace(v3=v3))
    monkeypatch.setitem(sys.modules, "imageio.v3", v3)
    from bionext_spark.operators.multimodal import _decode_video

    with pytest.raises(ValueError, match="zero frames"):
        _decode_video(b"irrelevant", "mp4")
