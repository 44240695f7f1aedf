"""Real-decoder conformance contract (mirror of test_lingual_contract):
the fake and real decode paths share one FEATURE CONTRACT — exactly
FEATURE_DIM floats, each in [0, 1), 6-dp rounded, deterministic per
payload — so ``decoder="real"`` is verified the day the environment
provides Pillow, and the fake path is pinned to the same shape today.

The Pillow-backed tests skip when the library is absent (this container);
everything contract-shaped about the fake path runs unconditionally.
"""

import pytest
from pyspark.sql import functions as F

from fonduer_spark.functions import multimodal as mm


def _media(spark, rows):
    return spark.createDataFrame(
        [(i, "image", payload, "image/png", None, None, None)
         for i, payload in rows],
        mm.MEDIA_SCHEMA)


def _assert_feature_contract(feats):
    assert len(feats) == mm.FEATURE_DIM
    for f in feats:
        assert 0.0 <= f < 1.0
        # 6-dp quantization before the float32 column narrows it
        assert abs(f - round(f, 6)) < 1e-6


def test_fake_decoder_meets_contract(spark):
    media = _media(spark, [(1, b"abc"), (2, b""), (3, b"abc")])
    rows = {r.media_id: r for r in mm.extract_features(media).collect()}
    for r in rows.values():
        _assert_feature_contract(r.features)
    assert rows[1].features == rows[3].features  # deterministic per payload
    assert rows[1].features != rows[2].features


def test_fake_and_real_share_output_schema(spark):
    """Both decoders compile to the SAME output schema — the Arrow batch
    shape is decoder-independent (schema is declared, not inferred, so
    this holds without Pillow installed)."""
    media = _media(spark, [(1, b"abc")])
    fake = mm.extract_features(media, decoder="fake")
    real = mm.extract_features(media, decoder="real")
    assert fake.schema == real.schema
    rz_fake = mm.resize_images(media, 8, 8, decoder="fake")
    rz_real = mm.resize_images(media, 8, 8, decoder="real")
    assert rz_fake.schema == rz_real.schema


def test_real_decoder_raises_without_pillow(spark):
    """The env gate stays honest: without Pillow the real path raises
    NotImplementedError inside the task rather than emitting fakes."""
    try:
        import PIL  # noqa: F401
        pytest.skip("Pillow installed — gate not active")
    except ImportError:
        pass
    media = _media(spark, [(1, b"abc")])
    with pytest.raises(Exception, match="NotImplementedError|Pillow|decode"):
        mm.extract_features(media, decoder="real").collect()


def _png_bytes(w, h, color):
    from io import BytesIO

    from PIL import Image

    buf = BytesIO()
    Image.new("RGB", (w, h), color).save(buf, format="PNG")
    return buf.getvalue()


def test_real_decoder_conformance(spark):
    """Runs only when Pillow exists: the real decode of actual PNGs meets
    the shared feature contract, is deterministic, and reflects the pixels
    (a white image's mean-gray feature exceeds a black image's)."""
    pytest.importorskip("PIL")
    media = _media(spark, [
        (1, _png_bytes(16, 8, (0, 0, 0))),
        (2, _png_bytes(16, 8, (255, 255, 255))),
        (3, _png_bytes(16, 8, (0, 0, 0))),
    ])
    rows = {r.media_id: r for r in
            mm.extract_features(media, decoder="real").collect()}
    for r in rows.values():
        _assert_feature_contract(r.features)
    assert rows[1].features == rows[3].features
    assert rows[2].features[5] > rows[1].features[5]  # mean gray
    # local (non-Spark) parity: the same function the task runs
    local = mm._real_decode_image(_png_bytes(16, 8, (0, 0, 0)))
    assert local == rows[1].features


def test_real_resize_conformance(spark):
    """Runs only when Pillow exists: real resize re-encodes a decodable
    PNG of exactly the requested dimensions, metadata matches payload."""
    PIL = pytest.importorskip("PIL")
    from io import BytesIO

    media = _media(spark, [(1, _png_bytes(16, 8, (10, 20, 30)))])
    rows = mm.resize_images(media, width=4, height=6,
                            decoder="real").collect()
    assert rows[0].width == 4 and rows[0].height == 6
    img = PIL.Image.open(BytesIO(bytes(rows[0].payload)))
    assert img.size == (4, 6)
