"""Streaming compressed-shard ingestion: ``.jsonl.{zst,xz,gz,bz2}``
corpus shards arrive as a stream; each micro-batch is decoded map-side
(zstd through the vendored RFC 8878 codec, xz/gzip/bz2 through stdlib
under the repo-wide bounded-inflate discipline), split into lines,
parsed with an EXPLICIT schema, appended to the documents table, and
folded into per-(codec, lang) ingest statistics — the delivery format
actually used by public corpus drops, as streaming state.

Same one-commit contract as the WARC ingest sink (warc_sink.py): the
state directory holds ``docs/`` (append-only parsed documents),
``stats/`` (merge-on-write additive aggregates) and ``quarantine/``
(append-only per-shard decode failures) plus the batch high-water
mark, swapped atomically as a whole — a foreachBatch retry skips the
committed batch, keeping the additive stats exactly-once. Decoding is
per-shard and stats are additive/commutative, so the final state
equals the batch computation regardless of batching — which the
registry oracle computes in SQL from the documents table alone.

Untrusted-input discipline (r9 verdict item + shard hardening, r10):
every codec decodes through a BOUNDED decompressor (size cap, stream-
completeness check, no trailing bytes — warc.py's ``_bounded_inflate``
contract), so a hostile "zip bomb" shard errors at the cap instead of
ballooning an executor; and a corrupt/bomb shard yields ONE quarantine
row (shard, codec, NULL line, decode_error) instead of raising out of
``mapInPandas`` and killing the task — at 100 TB a malformed shard in
a million-file drop is a certainty, and one bad object must never cost
a task retry storm or poison its batch.

At 100 TB: shards are non-splittable, so the streaming source's unit of
parallelism is the FILE, matching the batch scan's story; a micro-batch
of N shards decodes as N map tasks and only parsed rows ever shuffle.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hive_udf_spark.sources.sinks import append_parquet_state, swap_dir

SHARD_DOCS_SCHEMA = (
    "doc_id bigint, codec string, lang string, n_chars bigint, parsed_chars bigint"
)
SHARD_STATS_SCHEMA = "codec string, lang string, n_docs bigint, total_chars bigint"
SHARD_LINES_SCHEMA = "shard int, codec string, line string, decode_error string"

# Per-shard decode cap: compressed shard formats carry no trustworthy
# decompressed-size field (gzip's ISIZE is mod-2^32 and attacker-set),
# so the cap is the only defense against a bomb shard.
_MAX_SHARD_BYTES = 1 << 28


def _bounded_decompress(codec: str, data: bytes, max_output: int) -> bytes:
    """One complete compressed shard → bytes, under the repo-wide
    untrusted-inflate contract (size cap, eof check, no trailing
    bytes), for all four shard codecs.  Raises ValueError on anything
    malformed — the caller routes that to a quarantine row."""
    if codec == "zstd":
        # native-or-vendored dispatch, same cap-bounded contract
        # (zstdcodec.zstd_decompress_fast; equivalence pytested)
        from hive_udf_spark.operators.zstdcodec import zstd_decompress_fast

        return zstd_decompress_fast(data, max_output=max_output)
    if codec == "xz":
        import lzma

        return _multi_member(
            data, max_output, "xz shard", lzma.LZMADecompressor, lzma.LZMAError
        )
    if codec == "bz2":
        import bz2

        # bz2 raises OSError on corrupt streams
        return _multi_member(
            data, max_output, "bz2 shard", bz2.BZ2Decompressor, OSError
        )
    if codec == "br":
        # .jsonl.br shards (decoder-side support; the fixture rotation
        # stays zstd/xz/gz/bz2): native libbrotli under the same
        # cap-bounded contract, quarantine when the library is absent
        from hive_udf_spark.operators.native import brotli_native_decompress

        return brotli_native_decompress(data, max_output=max_output)
    if codec in ("gzip", "gz"):
        import functools
        import zlib

        return _multi_member(
            data,
            max_output,
            "gzip shard",
            functools.partial(zlib.decompressobj, wbits=31),
            zlib.error,
        )
    raise ValueError(f"unknown shard codec {codec!r}")


def _multi_member(
    data: bytes, max_output: int, what: str, make, err_type
) -> bytes:
    """Concatenated-member inflate under one CUMULATIVE output cap.

    Multi-member ``.gz`` (pigz/bgzip, block-parallel writers) and
    concatenated ``.xz``/``.bz2`` streams are valid per RFC 1952 /
    the format specs and common in the wild; rejecting ``unused_data``
    as "trailing bytes" quarantined legitimate shards (r10 advice —
    data-loss regression).  After each member's ``eof``, any
    ``unused_data`` is fed to a fresh decompressor; genuinely trailing
    garbage still fails, as the next "member" is a corrupt stream."""
    chunks: list[bytes] = []
    total = 0
    while True:
        d = make()
        try:
            out = d.decompress(data, max_output - total + 1)
        except err_type as exc:
            raise ValueError(f"{what}: corrupt stream: {exc}") from exc
        total += len(out)
        if total > max_output:
            raise ValueError(f"{what}: inflates past the {max_output}-byte cap")
        chunks.append(out)
        if not d.eof:
            raise ValueError(f"{what}: stream truncated")
        data = d.unused_data
        if not data:
            return b"".join(chunks)


def decode_shard_lines(
    shards: DataFrame, max_output: int = _MAX_SHARD_BYTES
) -> DataFrame:
    """(shard, codec, blob) → (shard, codec, line, decode_error):
    map-side shard decode + line split, shared by the batch scan query
    and the streaming sink.

    A shard that fails to decode (corrupt stream, bomb past the cap,
    non-UTF-8 payload, unknown codec) contributes ONE quarantine row
    with ``line`` NULL and ``decode_error`` set — never a task failure.
    Blank/whitespace-only lines are skipped: real ``.jsonl`` shards end
    with a trailing newline, and without the skip that final empty
    line would parse to an all-NULL struct and append a phantom row."""
    import pandas as pd

    def run(batches):
        for pdf in batches:
            rows = []
            for shard, codec, blob in zip(pdf["shard"], pdf["codec"], pdf["blob"]):
                shard = int(shard)
                try:
                    payload = _bounded_decompress(codec, bytes(blob), max_output)
                    text = payload.decode("utf-8")
                except (ValueError, UnicodeDecodeError) as exc:
                    rows.append((shard, codec, None, str(exc)))
                    continue
                for ln in text.split("\n"):
                    if ln.strip():
                        rows.append((shard, codec, ln, None))
            yield pd.DataFrame(
                rows, columns=["shard", "codec", "line", "decode_error"]
            )

    return shards.mapInPandas(run, SHARD_LINES_SCHEMA)


def _resolve(state_path: str) -> str | None:
    if os.path.islink(state_path):
        return os.path.join(
            os.path.dirname(os.path.abspath(state_path)), os.readlink(state_path)
        )
    if os.path.isdir(state_path):
        return state_path
    return None


def _read_state(
    spark: SparkSession, state_path: str
) -> tuple[DataFrame | None, DataFrame | None, DataFrame | None, int]:
    cur = _resolve(state_path)
    if cur is None:
        return None, None, None, -1
    hwm = -1
    meta = os.path.join(cur, "meta.json")
    if os.path.exists(meta):
        hwm = json.load(open(meta)).get("last_batch", -1)
    docs = spark.read.parquet(os.path.join(cur, "docs"))
    stats = spark.read.parquet(os.path.join(cur, "stats"))
    qdir = os.path.join(cur, "quarantine")
    quarantine = spark.read.parquet(qdir) if os.path.isdir(qdir) else None
    return docs, stats, quarantine, hwm


def incremental_shard_ingest_sink(
    shards: DataFrame,
    state_path: str,
    checkpoint_dir: str,
):
    """Streaming query maintaining (parsed docs, per-codec/lang stats,
    per-shard quarantine) under the one-commit contract.  ``shards`` is
    a streaming DataFrame of (shard int, codec string, blob binary).
    Read results with ``spark.read.parquet(f"{state_path}/docs")`` /
    ``.../stats`` / ``.../quarantine``."""

    def _merge(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        # only the merged stats table is re-READ per batch; docs/ and
        # quarantine/ advance by hard-linked append below, so their
        # (ever-growing) file sets are never re-opened
        cur0 = _resolve(state_path)
        hwm, stats = -1, None
        if cur0 is not None:
            meta = os.path.join(cur0, "meta.json")
            if os.path.exists(meta):
                hwm = json.load(open(meta)).get("last_batch", -1)
            stats = spark.read.parquet(os.path.join(cur0, "stats"))
        if hwm == batch_id:
            return  # retry of the committed batch: additive state, skip
        if hwm > batch_id:
            raise ValueError(
                f"state at {state_path} has last_batch={hwm} but the stream "
                f"delivered batch_id={batch_id}: checkpoint lineage mismatch."
            )
        # one materialization: the decoded line stream feeds both the
        # quarantine branch and the parse branch (the Python shard
        # decode must not run twice); the raw batch itself is consumed
        # only by this decode, so it is not separately checkpointed
        lines = decode_shard_lines(batch_df).localCheckpoint(eager=True)
        batch_quar = lines.filter(F.col("decode_error").isNotNull()).select(
            F.lit(int(batch_id)).alias("batch_id"), "shard", "codec", "decode_error"
        )
        parsed = lines.filter(F.col("line").isNotNull()).select(
            "codec",
            F.from_json(
                "line", "doc_id bigint, text string, lang string, n_chars bigint"
            ).alias("r"),
        )
        batch_docs = parsed.select(
            F.col("r.doc_id").alias("doc_id"),
            "codec",
            F.col("r.lang").alias("lang"),
            F.col("r.n_chars").alias("n_chars"),
            F.length("r.text").cast("long").alias("parsed_chars"),
        )
        batch_stats = batch_docs.groupBy("codec", "lang").agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("parsed_chars").cast("long").alias("total_chars"),
        )
        if stats is not None:  # merge-on-write: additive fold
            new_stats = (
                stats.unionByName(batch_stats)
                .groupBy("codec", "lang")
                .agg(
                    F.sum("n_docs").cast("long").alias("n_docs"),
                    F.sum("total_chars").cast("long").alias("total_chars"),
                )
            )
        else:
            new_stats = batch_stats
        # the parquet writes below are the materialization — each plan
        # reads the OLD state dir plus the checkpointed line stream and
        # lands in new_dir, which only becomes visible via the swap
        # after all three writes and the meta stamp succeed, so no
        # intermediate eager checkpoint is needed (r14: dropping the
        # three pre-write checkpoints removed three full extra passes
        # per micro-batch). docs/ and quarantine/ are APPEND-ONLY:
        # write the batch rows and hard-link the previous version's
        # files (r15, O(batch) per commit — the union-rewrite re-read
        # and re-wrote the whole accumulated state every batch); only
        # the merged stats/ aggregate rewrites.
        new_dir = f"{state_path}.v-{uuid.uuid4().hex[:8]}"
        append_parquet_state(
            batch_docs,
            os.path.join(cur0, "docs") if cur0 else None,
            os.path.join(new_dir, "docs"),
        )
        new_stats.write.parquet(os.path.join(new_dir, "stats"))
        append_parquet_state(
            batch_quar,
            os.path.join(cur0, "quarantine") if cur0 else None,
            os.path.join(new_dir, "quarantine"),
        )
        with open(os.path.join(new_dir, "meta.json"), "w") as f:
            json.dump({"last_batch": int(batch_id)}, f)
        swap_dir(state_path, new_dir)

    return (
        shards.writeStream.foreachBatch(_merge)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
        .start()
    )
