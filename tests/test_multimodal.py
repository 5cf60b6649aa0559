"""Multimodal plumbing: schema, Arrow batch shape, deterministic features."""

from __future__ import annotations

from llm_document_parser_spark.operators.multimodal import (
    FEATURE_DIM,
    MEDIA_SCHEMA,
    extract_media_features,
    frame_sample_plan,
)
from llm_document_parser_spark.operators.similarity import cosine_topk


def _media_rows():
    return [
        ("m://img1", "image", b"\x89PNG fake bytes " * 40, 64, 64, None),
        ("m://img2", "image", b"\x89PNG fake bytes " * 40, 64, 64, None),
        ("m://img3", "image", b"completely different payload" * 30, 32, 32, None),
        ("m://vid1", "video", b"\x00\x00ftyp fake", None, None, 3500),
        ("m://empty", "image", None, None, None, None),
    ]


def test_feature_extraction_deterministic(spark):
    media = spark.createDataFrame(_media_rows(), MEDIA_SCHEMA)
    feats = extract_media_features(media)
    rows = {r["url"]: r for r in feats.collect()}
    assert len(rows) == 5
    f1, f2 = rows["m://img1"]["feature"], rows["m://img2"]["feature"]
    assert f1 == f2  # identical payloads → identical features
    assert len(f1) == FEATURE_DIM
    assert abs(sum(f1) - 1.0) < 1e-6  # L1-normalized
    assert rows["m://img3"]["feature"] != f1
    assert rows["m://empty"]["feature"] is None
    assert rows["m://img1"]["n_bytes"] == len(b"\x89PNG fake bytes " * 40)


def test_features_compose_with_similarity(spark):
    media = spark.createDataFrame(_media_rows()[:3], MEDIA_SCHEMA)
    feats = extract_media_features(media).withColumnRenamed("url", "vec_id")
    topk = cosine_topk(
        feats.filter("vec_id = 'm://img1'"), feats, k=2, id_col="vec_id", vec_col="feature"
    )
    rows = topk.orderBy("rank").collect()
    assert rows[0]["neighbor_id"] == "m://img2"  # identical payload ranks first
    assert rows[0]["score"] == 1.0


def test_frame_sample_plan(spark):
    media = spark.createDataFrame(_media_rows(), MEDIA_SCHEMA)
    frames = frame_sample_plan(media, every_ms=1000).collect()
    assert len(frames) == 3  # 3500ms at 1/s → frames 0,1,2
    assert {f["frame_ts_ms"] for f in frames} == {0, 1000, 2000}
