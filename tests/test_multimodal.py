"""Multimodal plumbing tests: binary columns, mapInPandas decode (fake
codec), frame sampling, feature extraction shapes."""

import os

import pytest
from pyspark.sql import functions as F

from streaming_parquet_spark.operators.multimodal import (
    attach_binary,
    decode_images,
    extract_features,
    sample_frames,
)


@pytest.fixture(scope="module")
def blobs(spark, sf_dir):
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    return attach_binary(docs.limit(50))


def test_attach_binary_byte_length(blobs):
    row = blobs.select(
        F.length("blob").alias("bl"), F.length("text").alias("tl")
    ).first()
    assert row["bl"] == row["tl"]  # ascii fixture text


def test_decode_images_fake_deterministic(blobs):
    a = {r["id"]: (r["width"], r["height"], r["channels"], r["format"])
         for r in decode_images(blobs).collect()}
    b = {r["id"]: (r["width"], r["height"], r["channels"], r["format"])
         for r in decode_images(blobs).collect()}
    assert a == b and len(a) == 50
    w, h, c, fmt = next(iter(a.values()))
    assert 64 <= w < 256 and 64 <= h < 256 and c in (1, 3) and fmt == "fake"


def test_decode_images_strict_raises(blobs):
    with pytest.raises(Exception) as exc:
        decode_images(blobs, strict=True).collect()
    assert "NotImplementedError" in str(exc.value) or isinstance(
        exc.value, NotImplementedError
    )


def test_sample_frames_shape(blobs):
    frames = sample_frames(blobs, max_frames=4, every_n_bytes=64)
    per_doc = frames.groupBy("id").count().collect()
    assert all(1 <= r["count"] <= 4 for r in per_doc)
    fb = frames.select(F.length("frame_bytes").alias("n")).collect()
    assert all(1 <= r["n"] <= 64 for r in fb)


def test_extract_features_dims(blobs):
    out = extract_features(blobs, dims=16).collect()
    assert len(out) == 50
    assert all(len(r["features"]) == 16 for r in out)
    assert all(-1.0 <= v <= 1.0 for r in out for v in r["features"])


def test_resize_images_shapes(blobs):
    from streaming_parquet_spark.operators.multimodal import resize_images

    out = resize_images(blobs, width=8, height=4)
    rows = out.collect()
    assert len(rows) == blobs.count()
    for r in rows:
        assert r["width"] == 8 and r["height"] == 4
        assert len(r["resized_bytes"]) == 8 * 4
    # deterministic: same payload -> same resized bytes
    again = {r["id"]: bytes(r["resized_bytes"]) for r in resize_images(
        blobs, width=8, height=4).collect()}
    assert {r["id"]: bytes(r["resized_bytes"]) for r in rows} == again


def test_resize_strict_raises(blobs):
    import pytest as _pytest
    from py4j.protocol import Py4JJavaError
    from streaming_parquet_spark.operators.multimodal import resize_images

    with _pytest.raises(Exception) as ei:
        resize_images(blobs, strict=True).collect()
    assert "NotImplementedError" in str(ei.value) or isinstance(
        ei.value, Py4JJavaError
    )


def test_decode_audio_meta(blobs):
    from streaming_parquet_spark.operators.multimodal import decode_audio

    rows = decode_audio(blobs).collect()
    assert len(rows) == blobs.count()
    for r in rows:
        assert r["sample_rate"] in (8000, 16000, 22050, 44100)
        assert r["n_samples"] > 0
        assert abs(r["duration_sec"] - r["n_samples"] / r["sample_rate"]) < 1e-4
