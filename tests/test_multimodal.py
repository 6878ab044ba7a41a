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
