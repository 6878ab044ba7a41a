"""Multimodal plumbing tests: schemas, batch shapes, stubbed codec."""

import pytest
from pyspark.sql import functions as F

from biocypher_spark.multimodal import (
    FEATURE_DIM,
    decode_image,
    extract_features,
    media_near_dup,
    sample_frames,
    synthesize_media,
)


def test_feature_extraction(spark):
    media = synthesize_media(spark, 20, kind="image")
    feats = extract_features(media)
    rows = feats.collect()
    assert len(rows) == 20
    assert all(len(r["feature"]) == FEATURE_DIM for r in rows)
    assert all(0.0 <= v <= 1.0 for r in rows for v in r["feature"])
    # deterministic across runs
    again = {r["media_id"]: r["content_sha"] for r in extract_features(media).collect()}
    assert {r["media_id"]: r["content_sha"] for r in rows} == again


def test_codec_stub_raises_for_real_formats():
    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG...", format="image/png")


def test_frame_sampling(spark):
    media = synthesize_media(spark, 4, kind="video")
    frames = sample_frames(media, every_ms=1000)
    rows = frames.collect()
    # 4000ms duration -> 4 frames each
    assert len(rows) == 16
    per = {}
    for r in rows:
        per.setdefault(r["media_id"], []).append(r["frame_ms"])
    assert all(sorted(v) == [0, 1000, 2000, 3000] for v in per.values())


def test_media_exact_dedup(spark):
    a = synthesize_media(spark, 5, kind="image")
    dup = a.unionByName(a.withColumn("media_id", F.concat(F.lit("copy_"), "media_id")))
    groups = media_near_dup(dup).collect()
    assert len(groups) == 5
    assert all(g["n"] == 2 for g in groups)


def test_resize_media_plumbing(spark):
    from biocypher_spark.multimodal import resize_media, synthesize_media

    media = synthesize_media(spark, 6, kind="image")
    out = resize_media(media, width=4, height=4).collect()
    assert len(out) == 6  # one row per input
    for r in out:
        assert r["width"] == 4 and r["height"] == 4
        assert len(r["thumb"]) == 16
        assert all(0 <= px <= 255 for px in r["thumb"])
    # deterministic: identical content -> identical thumbnail
    again = {r["media_id"]: r["thumb"] for r in resize_media(media, 4, 4).collect()}
    assert all(again[r["media_id"]] == r["thumb"] for r in out)


# -- real codecs (PPM / WAV, pure stdlib) -------------------------------------


def test_ppm_roundtrip_and_parser():
    import numpy as np

    from biocypher_spark.multimodal import decode_ppm, encode_ppm

    px = (np.arange(5 * 4 * 3, dtype=np.uint8)).reshape(4, 5, 3)
    assert (decode_ppm(encode_ppm(px)) == px).all()
    # header variations: comments and extra whitespace
    raw = b"P6\n# a comment\n 5  4\n255\n" + px.tobytes()
    assert (decode_ppm(raw) == px).all()
    with pytest.raises(ValueError):
        decode_ppm(b"P3\n1 1\n255\n000")
    with pytest.raises(NotImplementedError):
        decode_ppm(b"P6\n1 1\n65535\n" + b"\x00" * 6)


def test_wav_roundtrip():
    import numpy as np

    from biocypher_spark.multimodal import decode_wav, encode_wav

    samples = (np.sin(np.linspace(0, 20, 800)) * 10000).astype("<i2")
    rate, frames = decode_wav(encode_wav(samples, 8000))
    assert rate == 8000
    assert (frames[:, 0] == samples).all()


def test_real_image_features(spark):
    import numpy as np

    from biocypher_spark.multimodal import encode_ppm, synthesize_real_media

    media = synthesize_real_media(spark, 10, kind="image")
    feats = extract_features(media).collect()
    assert len(feats) == 10
    assert all(len(r["feature"]) == FEATURE_DIM for r in feats)
    # features are real pixel statistics: an all-black vs all-white image
    black = decode_image(encode_ppm(np.zeros((4, 4, 3), dtype=np.uint8)), "image/ppm")
    white = decode_image(encode_ppm(np.full((4, 4, 3), 255, dtype=np.uint8)), "image/ppm")
    assert black.max() == 0.0 and abs(white.min() - 1.0) < 1e-6


def test_real_audio_features_and_frames(spark):
    from biocypher_spark.multimodal import synthesize_real_media

    media = synthesize_real_media(spark, 6, kind="audio")
    feats = extract_features(media).collect()
    assert len(feats) == 6
    # RMS of a +/-12000-amplitude sine is ~0.26 of full scale, nonzero in
    # every chunk
    assert all(min(r["feature"]) > 0.1 for r in feats)
    frames = sample_frames(media, every_ms=1000).collect()
    # durations 1500/2200/2900 -> ceil = 2/3/3 frames, two rows of each
    assert len(frames) == 2 * (2 + 3 + 3)
    # real windows: distinct sample slices hash differently
    by_media = {}
    for r in frames:
        by_media.setdefault(r["media_id"], set()).add(r["frame_sha"])
    assert all(len(v) > 1 for v in by_media.values())


def test_real_image_resize(spark):
    import numpy as np

    from biocypher_spark.multimodal import resize_media, synthesize_real_media

    media = synthesize_real_media(spark, 5, kind="image")
    out = {r["media_id"]: r for r in resize_media(media, width=4, height=4).collect()}
    assert len(out) == 5
    # verify one thumbnail against a direct numpy resample of the source
    from biocypher_spark.multimodal import decode_ppm

    src = media.filter(F.col("media_id") == "i0").collect()[0]
    px = decode_ppm(bytes(src["content"]))
    h, w = px.shape[:2]
    ys = (np.arange(4) * h) // 4
    xs = (np.arange(4) * w) // 4
    expect = px[ys][:, xs].astype(np.float32).mean(axis=2).round().astype(np.uint8).ravel()
    assert list(out["i0"]["thumb"]) == [int(v) for v in expect]


def test_decode_unknown_payload_raises():
    """The sha stub is opt-in via format='fake/*'; an unrecognized payload
    with no format tag must raise, not silently produce sha noise."""
    import pytest as _pytest

    from biocypher_spark.multimodal import decode_image

    with _pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG\r\n\x1a\n....", None)


def test_resize_thumb_carries_full_dims(spark):
    from biocypher_spark.multimodal import media_from_documents, resize_media

    docs = spark.createDataFrame([(1, "hello world " * 10)], "doc_id long, text string")
    media = media_from_documents(docs)
    rows = resize_media(media, width=8, height=8).collect()
    assert rows and all(len(r["thumb"]) == 64 for r in rows)


def test_media_feature_near_dup_pairs(spark):
    from biocypher_spark.multimodal import media_feature_near_dup, media_from_documents

    docs = spark.createDataFrame(
        [(1, "same payload text"), (2, "same payload text"), (3, "totally different !!")],
        "doc_id long, text string",
    )
    media = media_from_documents(docs)
    pairs = media_feature_near_dup(media, threshold=0.999)
    got = {(r["media_a"], r["media_b"]) for r in pairs.collect()}
    # identical payloads -> identical features -> cos 1.0 pair; the
    # different doc must not pair with both at 0.999
    assert any(a != b for a, b in got)
