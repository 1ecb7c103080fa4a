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


def _has_pil() -> bool:
    try:
        import PIL.Image  # noqa: F401

        return True
    except ImportError:
        return False


def test_real_codec_raises_without_pil(spark, sf_dir):
    """fake=False must fail EXPLICITLY when no codec library exists —
    never silently fall back to the byte-level stand-in."""
    import pytest as _pytest

    if _has_pil():
        _pytest.skip("PIL present: the explicit-failure branch is unreachable")
    from pyspark.errors.exceptions.captured import PythonException

    from hive_udf_spark.operators.multimodal import (
        attach_blob_columns,
        decode_image_features,
    )

    docs = load_table(spark, sf_dir, "documents").limit(5)
    blobs = attach_blob_columns(docs)
    with _pytest.raises(PythonException, match="NotImplementedError"):
        decode_image_features(blobs, fake=False).collect()


def test_real_codec_decodes_png_with_pil(spark):
    """Real path (runs wherever pillow is installed): a generated PNG
    decodes to known grayscale pixel statistics, and resize honors the
    width*height size contract."""
    import pytest as _pytest

    if not _has_pil():
        _pytest.skip("pillow not installed in this container")
    import io

    import PIL.Image as Image

    from hive_udf_spark.operators.multimodal import (
        decode_image_features,
        resize_images,
    )

    # 4x2 grayscale gradient PNG
    im = Image.new("L", (4, 2))
    im.putdata([0, 32, 64, 96, 128, 160, 192, 224])
    buf = io.BytesIO()
    im.save(buf, format="PNG")
    blobs = spark.createDataFrame(
        [(1, buf.getvalue())], "doc_id long, blob binary"
    ).withColumn(
        "meta",
        F.struct(
            F.lit("image/png").alias("mime"),
            F.lit(4).alias("width"),
            F.lit(2).alias("height"),
            F.lit(1).alias("n_frames"),
        ),
    )
    feat = decode_image_features(blobs, fake=False).collect()[0]
    assert feat.n_bytes == 8  # pixel count, not encoded size
    assert feat.mean_byte == sum([0, 32, 64, 96, 128, 160, 192, 224]) / 8
    assert feat.max_byte == 224
    resized = resize_images(blobs, width=2, height=2, fake=False).collect()[0]
    assert resized.n_bytes == 4 and len(resized.blob) == 4
