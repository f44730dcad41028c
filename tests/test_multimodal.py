"""Tests for the multimodal column plumbing: payload round-trip,
Arrow batch shapes, the 1:N frame fan-out, and the stub gates."""

from __future__ import annotations

import hashlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from nyc_taxi_data_engineering_spark.operators import multimodal as M


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_payload_roundtrip_and_metadata(spark):
    media = M.attach_media(_docs(spark, ["hello world", "abc"]))
    # compare names/types only — lit-built structs are non-nullable
    assert [(f.name, f.dataType.simpleString()) for f in media.schema.fields] == [
        (f.name, f.dataType.simpleString()) for f in M.MEDIA_SCHEMA.fields
    ]
    rows = {r["doc_id"]: r for r in media.collect()}
    assert bytes(rows[0]["payload"]) == b"hello world"
    assert rows[0]["meta"]["n_bytes"] == 11
    assert rows[1]["meta"]["n_frames"] == 3 % 8 + 1


def test_feature_extraction_shape_and_determinism(spark):
    media = M.attach_media(_docs(spark, ["hello world", ""]))
    rows = {r["doc_id"]: r for r in M.extract_features(media).collect()}
    v = np.array(rows[0]["features"])
    assert v.shape == (M.FEATURE_BINS,) and abs(v.sum() - 1.0) < 1e-6
    assert rows[1]["features"] == [0.0] * M.FEATURE_BINS  # empty payload
    # deterministic: same payload, same vector
    again = {r["doc_id"]: r for r in M.extract_features(media).collect()}
    assert again[0]["features"] == rows[0]["features"]


def test_frame_sampling_fanout(spark):
    # payload of 12 bytes -> n_frames = 12 % 8 + 1 = 5, every=2 -> frames 0,2,4
    media = M.attach_media(_docs(spark, ["abcdefghijkl"]))
    frames = M.sample_frames(media, every=2).collect()
    assert [f["frame_no"] for f in frames] == [0, 2, 4]
    size = 12 // 5
    assert all(len(bytes(f["frame_payload"])) == size for f in frames)
    assert bytes(frames[1]["frame_payload"]) == b"abcdefghijkl"[2 * size : 3 * size]


def test_payload_hash_matches_python(spark):
    media = M.attach_media(_docs(spark, ["héllo ✓ unicode"]))
    got = media.select(F.sha2("payload", 256).alias("h")).collect()[0]["h"]
    assert got == hashlib.sha256("héllo ✓ unicode".encode()).hexdigest()


def test_decode_stub_shape_and_resize_gate(spark):
    img = M.decode_image(b"some image bytes")
    assert img.shape == (64, 64, 3) and img.dtype == np.uint8
    if not M.HAS_PIL:
        with pytest.raises(NotImplementedError):
            M.resize(b"payload", 32, 32)
