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


def test_decode_plumbing(media):
    out = decode_images(media)
    rows = out.collect()
    assert len(rows) == 12
    assert all(64 <= r.dec_width < 128 for r in rows)
    # deterministic: same payload -> same digest on re-run
    again = {r.media_id: r.dec_digest for r in decode_images(media).collect()}
    assert all(bytes(r.dec_digest) == bytes(again[r.media_id]) for r in rows)


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
