"""Multimodal binary-column plumbing tests."""

from __future__ import annotations

import numpy as np
import pytest

from hive_udf_spark.operators.multimodal import (
    attach_blob_columns,
    decode_image_features,
    sample_frames,
)
from hive_udf_spark.sources import load_table


def test_blob_schema_and_features(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(20)
    blobs = attach_blob_columns(docs)
    assert dict(blobs.dtypes)["blob"] == "binary"
    feats = decode_image_features(blobs, fake=True)
    rows = {r.doc_id: r for r in feats.collect()}
    raw = {r.doc_id: r.text for r in docs.collect()}
    for doc_id, r in rows.items():
        b = raw[doc_id].encode()
        assert r.n_bytes == len(b)
        assert abs(r.mean_byte - np.frombuffer(b, dtype=np.uint8).mean()) < 1e-9
        assert 0 < r.byte_entropy < 8


def test_real_decode_raises_not_implemented(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(1)
    blobs = attach_blob_columns(docs)
    with pytest.raises(Exception) as ei:
        decode_image_features(blobs, fake=False).collect()
    assert "NotImplementedError" in str(ei.value) or isinstance(ei.value, NotImplementedError)


def test_frame_sampling_explodes_metadata(spark):
    df = spark.createDataFrame([(1, b"xx")], "doc_id long, blob binary").selectExpr(
        "doc_id", "blob", "named_struct('mime', 'video/fake', 'width', 4, 'height', 4, 'n_frames', 10) AS meta"
    )
    out = sample_frames(df, every_nth=3)
    assert [r.frame_idx for r in out.collect()] == [0, 3, 6, 9]


def test_resize_images_fake_path(spark, sf_dir):
    from hive_udf_spark.operators.multimodal import resize_images

    docs = load_table(spark, sf_dir, "documents").limit(10)
    blobs = attach_blob_columns(docs)
    out = resize_images(blobs, width=8, height=8, fake=True)
    rows = out.collect()
    assert len(rows) == 10
    for r in rows:
        assert len(r.blob) == 64 and r.width == 8 and r.height == 8 and r.n_bytes == 64
    # deterministic
    again = {r.doc_id: bytes(r.blob) for r in resize_images(blobs, 8, 8, fake=True).collect()}
    assert {r.doc_id: bytes(r.blob) for r in rows} == again


def test_resize_real_path_raises(spark, sf_dir):
    from hive_udf_spark.operators.multimodal import resize_images

    docs = load_table(spark, sf_dir, "documents").limit(1)
    blobs = attach_blob_columns(docs)
    with pytest.raises(Exception) as ei:
        resize_images(blobs, fake=False).collect()
    assert "NotImplementedError" in str(ei.value) or isinstance(ei.value, NotImplementedError)
