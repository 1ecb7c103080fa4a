"""Multimodal (image/audio/video) column plumbing for training-data pipelines.

Treats media as opaque ``binary`` columns with a typed metadata struct,
processed by Arrow-batched ``mapInPandas`` operators — the Spark-side
shape (schema, partitioning, batch processing, UDF signatures) is real and
tested; the actual codec step is stubbed because no image/audio libraries
exist in this container:

* If PIL/librosa were present, ``decode_image`` would decode; instead it
  raises ``NotImplementedError`` unless ``fake=True``, in which case a
  deterministic byte-level feature extractor stands in. Every downstream
  stage (batching, schema, aggregation) is identical either way.

At 100 TB: blobs stay in parquet binary columns (or are pointers into an
object store — ``blob_ref`` mode); mapInPandas streams Arrow batches so a
task never materializes more than ``spark.sql.execution.arrow
.maxRecordsPerBatch`` blobs; feature outputs are tiny relative to input,
so the post-decode shuffle is cheap.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BLOB_META_SCHEMA = "struct<mime:string,width:int,height:int,n_frames:int>"

IMAGE_FEATURES_SCHEMA = (
    "doc_id bigint, n_bytes bigint, mean_byte double, max_byte int, byte_entropy double"
)


def attach_blob_columns(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Build a blob table from the documents corpus: utf-8 bytes stand in
    for encoded media; metadata struct is typed and queryable."""
    return docs.select(
        "doc_id",
        F.encode(F.col(text_col), "UTF-8").alias("blob"),
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(1).alias("n_frames"),
        ).alias("meta"),
    )


def _fake_image_features(blob: bytes) -> tuple[int, float, int, float]:
    """Deterministic stand-in for a decoder: byte-level statistics.

    mean_byte is an exact integer sum divided once — bit-identical in any
    engine that sums the same integers.
    """
    arr = np.frombuffer(blob, dtype=np.uint8)
    n = arr.size
    if n == 0:
        return 0, 0.0, 0, 0.0
    counts = np.bincount(arr, minlength=256)
    probs = counts[counts > 0] / n
    entropy = float(-(probs * np.log2(probs)).sum())
    return n, float(int(arr.sum(dtype=np.int64)) / n), int(arr.max()), entropy


def decode_image_features(blobs: DataFrame, fake: bool = False) -> DataFrame:
    """Per-blob feature extraction via mapInPandas (Arrow batch iterator).

    fake=False attempts a real decode and raises NotImplementedError —
    PIL/opencv are not available in this environment; the call site chooses
    explicitly. fake=True runs the deterministic byte-statistics stand-in.
    """

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if not fake:
            try:
                import PIL.Image  # noqa: F401
            except ImportError as exc:  # pragma: no cover - env-dependent
                raise NotImplementedError(
                    "real image decode needs PIL/opencv (not in this container); "
                    "pass fake=True for the deterministic byte-feature stand-in"
                ) from exc
        for pdf in batches:
            feats = [_fake_image_features(b) for b in pdf["blob"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "n_bytes": [f[0] for f in feats],
                    "mean_byte": [f[1] for f in feats],
                    "max_byte": [f[2] for f in feats],
                    "byte_entropy": [f[3] for f in feats],
                }
            )

    return blobs.mapInPandas(extract, schema=IMAGE_FEATURES_SCHEMA)


def sample_frames(blobs: DataFrame, every_nth: int = 1) -> DataFrame:
    """Video-style frame sampling plumbing: one output row per sampled
    frame index from the metadata — pure explode, no decode."""
    idx = F.sequence(F.lit(0), F.col("meta.n_frames") - 1)
    return blobs.select(
        "doc_id",
        F.explode(F.filter(idx, lambda i: i % every_nth == 0)).alias("frame_idx"),
        "blob",
    )


RESIZED_SCHEMA = "doc_id bigint, blob binary, width int, height int, n_bytes bigint"


def resize_images(
    blobs: DataFrame, width: int = 64, height: int = 64, fake: bool = False
) -> DataFrame:
    """Image resize plumbing via mapInPandas: (doc_id, blob, meta) →
    (doc_id, resized blob, width, height, n_bytes).

    fake=False attempts a real decode+resize and raises
    NotImplementedError (PIL is not in this container). fake=True runs a
    deterministic stand-in: the blob's bytes are nearest-neighbor
    resampled to exactly width*height bytes — same batch shape, output
    schema, and size contract as a real thumbnailer, so the Spark-side
    plumbing (Arrow batching, binary output column, downstream size
    accounting) is fully exercised.

    At 100 TB: output size is bounded (width*height per row) regardless of
    input blob size, so the post-resize shuffle/write is predictable; put
    resize before any shuffle so full-size blobs never cross the network.
    """

    target = int(width) * int(height)

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if not fake:
            try:
                import PIL.Image  # noqa: F401
            except ImportError as exc:  # pragma: no cover - env-dependent
                raise NotImplementedError(
                    "real image resize needs PIL (not in this container); "
                    "pass fake=True for the deterministic byte-resample stand-in"
                ) from exc
        for pdf in batches:
            out_blobs = []
            for b in pdf["blob"]:
                arr = np.frombuffer(b, dtype=np.uint8)
                if arr.size == 0:
                    out_blobs.append(bytes(target))
                    continue
                # nearest-neighbor resample to the target byte count
                idx = (np.arange(target) * arr.size // target).clip(0, arr.size - 1)
                out_blobs.append(arr[idx].tobytes())
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "blob": out_blobs,
                    "width": np.int32(width),
                    "height": np.int32(height),
                    "n_bytes": np.int64(target),
                }
            )

    return blobs.mapInPandas(resize, schema=RESIZED_SCHEMA)
