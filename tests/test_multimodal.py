"""Multimodal plumbing tests: schemas, batch shapes, fan-out semantics,
determinism of the stubbed decoder, and NotImplementedError gates."""

from __future__ import annotations

import pytest

from matric_spark.operators.multimodal import (
    FEATURE_DIM,
    audio_features,
    image_features,
    resize_images,
    sample_frames,
    synthetic_media,
)


@pytest.fixture(scope="module")
def media(spark):
    return synthetic_media(spark, n=30).repartition(4)


def test_image_features_shape_and_determinism(spark, media):
    out = image_features(media).collect()
    assert len(out) == 10  # 30 rows, 1/3 images
    for r in out:
        assert len(r.features) == FEATURE_DIM
        assert abs(sum(r.features) - 1.0) < 1e-5  # normalized histogram
    again = {r.media_id: r.features for r in image_features(media).collect()}
    assert all(again[r.media_id] == r.features for r in out)


def test_resize_closed_schema(spark, media):
    out = resize_images(media, 4, 4)
    assert out.schema == media.schema  # pipeline-closed: can be re-consumed
    rows = out.collect()
    assert all(r.meta.width == 4 and r.meta.height == 4 for r in rows)
    assert all(len(r.payload) == 16 for r in rows)  # 4x4 uint8


def test_frame_sampling_fanout(spark, media):
    frames = sample_frames(media, every_ms=1000)
    got = frames.groupBy("media_id").count().collect()
    metas = {r.media_id: r.meta.duration_ms for r in media.filter("kind = 'video'").collect()}
    for r in got:
        assert r["count"] == metas[r.media_id] // 1000
    one = frames.filter("media_id = 2 and frame_idx = 0").collect()[0]
    assert one.ts_ms == 0 and len(one.payload) > 0


def test_audio_features(spark, media):
    out = audio_features(media).collect()
    assert len(out) == 10
    assert all(r.n_samples == 64 and r.rms > 0 for r in out)


def test_real_decoder_gated(spark, media):
    with pytest.raises(NotImplementedError):
        image_features(media, decoder="pillow")
    with pytest.raises(NotImplementedError):
        sample_frames(media, decoder="ffmpeg")


def test_media_from_documents_mapping(spark):
    """The gate harness: kind/meta/payload must follow the closed-form
    doc_id mapping mirrored in the DuckDB oracle, and NULL doc_id/text
    must not break the binary column."""
    from matric_spark.operators.multimodal import media_from_documents

    docs = spark.createDataFrame(
        [(0, "alpha"), (1, None), (2, "gamma"), (None, "dropped"), (7, "x")],
        "doc_id long, text string",
    )
    rows = {r.media_id: r for r in media_from_documents(docs).collect()}
    assert set(rows) == {0, 1, 2, 7}  # NULL doc_id dropped
    assert [rows[i].kind for i in (0, 1, 2, 7)] == [
        "image", "audio", "video", "audio",
    ]
    assert rows[0].payload == b"alpha" and rows[1].payload == b""
    m = rows[7].meta
    assert (m.width, m.height, m.duration_ms) == (8 + 3 * 4, 8 + 1 * 4, 5000)
    # frames of the derived table: fan-out count and byte size are the
    # closed-form values the oracle asserts at sf0.01
    fr = sample_frames(media_from_documents(docs), every_ms=1000).collect()
    assert {r.media_id for r in fr} == {2}
    assert sorted(r.ts_ms for r in fr) == [0, 1000, 2000, 3000, 4000]
    assert all(len(r.payload) == rows[2].meta.width * rows[2].meta.height for r in fr)
