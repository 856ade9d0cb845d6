from __future__ import annotations

import pytest

from etl_cli_spark.operators.multimodal import (
    decode_images,
    extract_features,
    make_fake_media,
    resize_images,
    sample_frames,
)
from etl_cli_spark.operators.similarity import cosine_topk


@pytest.fixture(scope="module")
def media(spark):
    return make_fake_media(spark, n=12)


def test_decode_real_ppm_and_bmp(media):
    """The PPM/BMP decoders must recover the exact dims and pixel bytes
    that went in (every third row is BMP, including padded-stride widths)."""
    import hashlib

    from etl_cli_spark.operators.multimodal import media_dims, media_pixels

    out = decode_images(media)
    rows = out.collect()
    assert len(rows) == 12
    for r in rows:
        w, h = media_dims(r.media_id)
        assert (r.dec_width, r.dec_height) == (w, h)
        expected = hashlib.sha256(media_pixels(r.media_id, w, h).tobytes()).digest()[:16]
        assert bytes(r.dec_digest) == expected


def test_decode_bmp_padded_stride():
    """w=9 -> 27-byte rows padded to 28: the decoder must strip padding,
    flip bottom-up rows, and swap BGR back to RGB."""
    from etl_cli_spark.operators.multimodal import (
        _decode_bmp,
        encode_bmp,
        media_pixels,
    )

    px = media_pixels(11, 9, 7)
    w, h, dec = _decode_bmp(encode_bmp(px))
    assert (w, h) == (9, 7)
    assert (dec == px).all()


def test_decode_unknown_format_uses_stub(media, spark):
    import hashlib

    from etl_cli_spark.operators.multimodal import MEDIA_SCHEMA

    payload = b"\x89PNG fake bytes"
    df = spark.createDataFrame(
        [(0, "image", bytearray(payload), (1, 1, 0, 0, "png"))], MEDIA_SCHEMA
    )
    r = decode_images(df).first()
    hh = hashlib.sha256(payload).digest()
    assert (r.dec_width, r.dec_height) == (64 + hh[0] % 64, 64 + hh[1] % 64)


def test_resize_schema(media):
    out = resize_images(media, 224, 224)
    r = out.first()
    assert (r.resized_width, r.resized_height) == (224, 224)
    assert len(bytes(r.resized_digest)) == 16


def test_frame_sampling_explodes_rows(media):
    frames = sample_frames(media, every_ms=1000)
    n = frames.count()
    # durations are 5000/6000/7000ms -> 5..7 frames per video
    assert n == sum(5000 + 1000 * (i % 3) for i in range(12)) // 1000
    assert frames.filter("frame_idx = 0").count() == 12


def test_features_compose_with_similarity(media, spark):
    feats = extract_features(media, dim=16).withColumnRenamed("media_id", "vec_id").withColumnRenamed(
        "feature", "embedding"
    )
    q = feats.filter("vec_id = 0").collect()[0].embedding
    top = cosine_topk(feats, [float(x) for x in q], k=3)
    assert top.collect()[0].vec_id == 0  # self is most similar
