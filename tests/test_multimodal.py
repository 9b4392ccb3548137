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


def test_bmp_golden_bytes():
    """encode_bmp against a hand-assembled reference BMP (true
    external-format check — a symmetric encode/decode bug cannot pass
    this), and decode_bmp of hand-built bottom-up AND top-down
    containers with stride padding."""
    import struct

    import numpy as np

    from matric_spark.operators.multimodal import decode_bmp, encode_bmp

    # 2x2 image, width 2 -> stride 4 (2 pad bytes per row)
    px = np.array([[1, 2], [3, 250]], dtype=np.uint8)
    got = encode_bmp(px)
    off = 14 + 40 + 1024
    hand = (
        b"BM"
        + struct.pack("<I", off + 8)     # file size: 2 rows x stride 4
        + b"\x00\x00\x00\x00"
        + struct.pack("<I", off)
        + struct.pack("<IiiHHIIiiII", 40, 2, 2, 1, 8, 0, 8, 2835, 2835, 256, 256)
        + bytes(b for j in range(256) for b in (j, j, j, 0))  # BGRA gray
        + bytes([3, 250, 0, 0])   # bottom row first (bottom-up)
        + bytes([1, 2, 0, 0])
    )
    assert got == hand
    np.testing.assert_array_equal(decode_bmp(got), px)

    # top-down variant (negative height), same pixels
    td = bytearray(hand)
    td[22:26] = struct.pack("<i", -2)
    td[off : off + 8] = bytes([1, 2, 0, 0]) + bytes([3, 250, 0, 0])
    np.testing.assert_array_equal(decode_bmp(bytes(td)), px)

    # palette is honored, not assumed identity: invert the gray ramp
    inv = bytearray(hand)
    for j in range(256):
        p = 14 + 40 + j * 4
        inv[p : p + 3] = bytes([255 - j] * 3)
    np.testing.assert_array_equal(decode_bmp(bytes(inv)), 255 - px)


def test_bmp_roundtrip_odd_widths():
    """decode(encode(px)) == px across widths that exercise every stride
    padding (0..3 pad bytes) and a 1-pixel edge case."""
    import numpy as np

    from matric_spark.operators.multimodal import decode_bmp, encode_bmp

    rng = np.random.default_rng(7)
    for w, h in [(1, 1), (3, 5), (5, 3), (4, 4), (7, 2), (13, 9)]:
        px = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
        np.testing.assert_array_equal(decode_bmp(encode_bmp(px)), px)


def test_bmp_rejects_garbage():
    import pytest as _pytest

    from matric_spark.operators.multimodal import decode_bmp, encode_bmp
    import numpy as np

    with _pytest.raises(ValueError):
        decode_bmp(b"not a bmp at all")
    ok = bytearray(encode_bmp(np.zeros((4, 4), dtype=np.uint8)))
    ok[28] = 24  # claim 24bpp
    with _pytest.raises(ValueError):
        decode_bmp(bytes(ok))
    with _pytest.raises(ValueError):
        decode_bmp(bytes(encode_bmp(np.zeros((4, 4), np.uint8)))[:-8])


def test_bmp_media_pipeline(spark):
    """End-to-end through the REAL decoder: bmp_media_from_documents
    emits genuine BMP containers; sample_frames(decoder='bmp') parses
    them and rolls frames; decoded values match the closed form the
    DuckDB oracle mirrors."""
    import numpy as np

    from matric_spark.operators.multimodal import (
        bmp_media_from_documents,
        decode_bmp,
        image_features,
        resize_images,
        sample_frames,
    )

    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(12)], "doc_id long, text string"
    )
    media = bmp_media_from_documents(docs)
    rows = {r.media_id: r for r in media.collect()}
    # payloads are real BMPs of the closed-form pixel field
    for mid, r in rows.items():
        px = decode_bmp(bytes(r.payload))
        w, h = r.meta.width, r.meta.height
        want = ((mid * 31 + np.arange(w * h)) % 256).reshape(h, w)
        np.testing.assert_array_equal(px, want)

    frames = sample_frames(media, every_ms=1000, decoder="bmp").collect()
    vids = {m: r for m, r in rows.items() if r.kind == "video"}
    assert {f.media_id for f in frames} == set(vids)
    for f in frames:
        meta = vids[f.media_id].meta
        w, h = meta.width, meta.height
        base = ((f.media_id * 31 + np.arange(w * h)) % 256).reshape(h, w)
        want = np.roll(base, -f.frame_idx, axis=0)
        got = np.frombuffer(bytes(f.payload), dtype=np.uint8).reshape(h, w)
        np.testing.assert_array_equal(got, want)

    # features through the real decoder: exact histogram of the field
    feats = {r.media_id: r.features for r in
             image_features(media, decoder="bmp").collect()}
    for mid, fv in feats.items():
        w, h = rows[mid].meta.width, rows[mid].meta.height
        base = (mid * 31 + np.arange(w * h)) % 256
        hist, _ = np.histogram(base, bins=16, range=(0, 256))
        np.testing.assert_allclose(fv, hist / base.size, rtol=1e-6)

    # resize stays pipeline-closed as REAL BMP (decodes again)
    small = resize_images(media, 4, 4, decoder="bmp").collect()
    for r in small:
        assert decode_bmp(bytes(r.payload)).shape == (4, 4)
