"""WARC / HTTP container walk (operators/warc.py, r6)."""

from __future__ import annotations

import pytest

from hive_udf_spark.operators.warc import (
    encode_http_response,
    encode_warc,
    http_response_body,
    split_warc_records,
)

HTML = b"<html><body><p>Hello &amp; goodbye</p></body></html>"


def test_plain_record_roundtrip():
    http = encode_http_response(HTML)
    w = encode_warc(
        [{"headers": {"WARC-Target-URI": "http://x.test/a"}, "payload": http}]
    )
    recs = split_warc_records(w)
    assert len(recs) == 1
    assert recs[0]["version"] == "WARC/1.0"
    assert recs[0]["headers"]["WARC-Target-URI"] == "http://x.test/a"
    assert int(recs[0]["headers"]["Content-Length"]) == len(http)
    st, hh, body = http_response_body(recs[0]["payload"])
    assert st == 200 and body == HTML
    assert hh["content-type"].startswith("text/html")


def test_gzip_members_and_mixed_concatenation():
    http = encode_http_response(HTML)
    plain = encode_warc([{"headers": {}, "payload": http}])
    gz = encode_warc(
        [
            {"headers": {}, "payload": http},
            {"headers": {"WARC-Type": "request"}, "payload": b"GET / HTTP/1.1\r\n\r\n"},
        ],
        gzip_records=True,
    )
    assert gz[:2] == b"\x1f\x8b"
    assert len(split_warc_records(gz)) == 2
    assert len(split_warc_records(plain + gz)) == 3  # mixed plain+gz tail


def test_chunked_transfer_encoding_reassembles():
    body = HTML * 57
    http = encode_http_response(body, chunked=True, chunk_size=100)
    assert b"Transfer-Encoding: chunked" in http
    st, hh, got = http_response_body(http)
    assert st == 200 and got == body
    # chunk extensions after ';' are ignored per RFC 7230
    ext = http.replace(b"64\r\n", b"64;ext=1\r\n", 1)
    assert http_response_body(ext)[2] == body


def test_content_encoding_gzip_deflate_roundtrip():
    """r8 verdict item 1: bodies stored with Content-Encoding come back
    as page bytes — gzip, zlib deflate, raw deflate (the common server
    misbehavior), and chunked transfer stacked over gzip."""
    body = HTML * 31
    for coding in ("gzip", "deflate", "deflate-raw"):
        http = encode_http_response(body, content_encoding=coding)
        label = "deflate" if coding == "deflate-raw" else coding
        assert f"Content-Encoding: {label}".encode() in http
        st, hh, got = http_response_body(http)
        assert st == 200 and got == body
        assert hh["content-encoding"] == label
    # stacked: chunked transfer over a gzip-coded body
    http = encode_http_response(body, chunked=True, chunk_size=64, content_encoding="gzip")
    assert b"Transfer-Encoding: chunked" in http
    assert http_response_body(http)[2] == body
    # close-delimited (no Content-Length) + gzip
    import zlib as _zlib

    co = _zlib.compressobj(9, _zlib.DEFLATED, 31)
    gz = co.compress(body) + co.flush()
    raw = b"HTTP/1.1 200 OK\r\nContent-Encoding: gzip\r\n\r\n" + gz
    assert http_response_body(raw)[2] == body
    # x-gzip alias and identity token list
    raw = b"HTTP/1.1 200 OK\r\nContent-Encoding: identity, x-gzip\r\n\r\n" + gz
    assert http_response_body(raw)[2] == body


def test_content_encoding_zstd_roundtrip():
    """r9: bodies stored with Content-Encoding: zstd (RFC 9659) decode
    through the vendored RFC 8878 codec — plain, under chunked
    transfer, and stacked over gzip (decode right-to-left)."""
    from hive_udf_spark.operators.zstdcodec import zstd_compress

    body = HTML * 31
    http = encode_http_response(body, content_encoding="zstd")
    assert b"Content-Encoding: zstd" in http
    st, hh, got = http_response_body(http)
    assert st == 200 and got == body
    # chunked transfer over a zstd-coded body
    http = encode_http_response(
        body, chunked=True, chunk_size=64, content_encoding="zstd")
    assert http_response_body(http)[2] == body
    # stacked content codings: gzip applied first, then zstd
    import zlib as _zlib

    co = _zlib.compressobj(9, _zlib.DEFLATED, 31)
    stacked = zstd_compress(co.compress(body) + co.flush(), shape="auto")
    raw = (
        b"HTTP/1.1 200 OK\r\nContent-Encoding: gzip, zstd\r\n"
        + b"Content-Length: " + str(len(stacked)).encode() + b"\r\n\r\n"
        + stacked
    )
    assert http_response_body(raw)[2] == body
    # truncated zstd body → ValueError, not junk text
    http_bad = encode_http_response(body, content_encoding="zstd")
    head_end = http_bad.index(b"\r\n\r\n") + 4
    cut = http_bad[: head_end + 20]
    cut = cut.replace(
        b"Content-Length: " + str(len(http_bad) - head_end).encode(),
        b"Content-Length: 20")
    with pytest.raises(ValueError):
        http_response_body(cut)


def test_content_encoding_unknown_or_corrupt_raises():
    body = HTML
    good = encode_http_response(body, content_encoding="gzip")
    # br is a SUPPORTED coding since r10 (native libbrotli dispatch):
    # gzip bytes under a br label must surface as a brotli malformation
    # (or the library-absent message), never pass through as text
    bad = good.replace(b"Content-Encoding: gzip", b"Content-Encoding: br")
    with pytest.raises(ValueError, match="brotli|libbrotli"):
        http_response_body(bad)
    # a coding nothing supports stays the unsupported error
    bad2 = good.replace(b"Content-Encoding: gzip", b"Content-Encoding: xc")
    with pytest.raises(ValueError, match="unsupported content-coding 'xc'"):
        http_response_body(bad2)
    # zstd is now a SUPPORTED coding (r9) — malformed zstd bytes must
    # surface as a zstd malformation error, not pass through
    with pytest.raises(ValueError, match="zstd"):
        http_response_body(
            b"HTTP/1.1 200 OK\r\nContent-Encoding: zstd\r\n\r\nxxxx"
        )
    # truncated gzip body (drop Content-Length so the transfer layer
    # passes and the content layer sees the truncation)
    import re as _re

    import zlib as _zlib

    co = _zlib.compressobj(9, _zlib.DEFLATED, 31)
    gz = co.compress(body) + co.flush()
    raw = b"HTTP/1.1 200 OK\r\nContent-Encoding: gzip\r\n\r\n" + gz[:-5]
    with pytest.raises(ValueError, match="truncated"):
        http_response_body(raw)
    # trailing bytes after the deflate stream end
    raw = b"HTTP/1.1 200 OK\r\nContent-Encoding: gzip\r\n\r\n" + gz + b"XX"
    with pytest.raises(ValueError, match="trailing bytes"):
        http_response_body(raw)
    del _re


def test_warc_records_table_per_record_content_quarantine(spark):
    """A record whose body claims an unknown coding quarantines ONLY
    that record — siblings in the same chunk still extract."""
    from hive_udf_spark.operators.warc import warc_records_table

    good_http = encode_http_response(HTML, content_encoding="gzip")
    br_http = (
        b"HTTP/1.1 200 OK\r\nContent-Encoding: br\r\n"
        + f"Content-Length: {len(HTML)}\r\n\r\n".encode()
        + HTML
    )
    blob = encode_warc(
        [
            {"headers": {"WARC-Target-URI": "http://x.test/good"}, "payload": good_http},
            {"headers": {"WARC-Target-URI": "http://x.test/br"}, "payload": br_http},
        ],
        gzip_records=True,
    )
    blobs = spark.createDataFrame([(1, bytearray(blob))], "doc_id bigint, blob binary")
    rows = {
        r.record_idx: r
        for r in warc_records_table(blobs, on_error="quarantine").collect()
    }
    assert bytes(rows[0].body) == HTML and rows[0].decode_error is None
    assert rows[1].decode_error and "br" in rows[1].decode_error
    assert rows[1].body is None and rows[1].target_uri == "http://x.test/br"
    # raise mode propagates instead
    from pyspark.errors.exceptions.captured import PythonException

    with pytest.raises(PythonException, match="ValueError"):
        warc_records_table(blobs).collect()


def test_http_content_length_truncates_trailing_bytes():
    http = encode_http_response(HTML) + b"GARBAGE-AFTER-BODY"
    assert http_response_body(http)[2] == HTML


def test_malformed_streams_raise():
    http = encode_http_response(HTML)
    good = encode_warc([{"headers": {}, "payload": http}])
    with pytest.raises(ValueError, match="truncated|unterminated"):
        split_warc_records(good[:-6])
    with pytest.raises(ValueError, match="bad version"):
        split_warc_records(b"HARC/1.0\r\nContent-Length: 0\r\n\r\n\r\n\r\n")
    with pytest.raises(ValueError, match="Content-Length"):
        split_warc_records(b"WARC/1.0\r\nWARC-Type: response\r\n\r\n\r\n\r\n")
    gz = encode_warc([{"headers": {}, "payload": http}], gzip_records=True)
    with pytest.raises(ValueError, match="gzip member"):
        split_warc_records(gz[:-4])
    with pytest.raises(ValueError, match="status line"):
        http_response_body(b"NOTHTTP 200 OK\r\n\r\nbody")
    with pytest.raises(ValueError, match="chunk truncated"):
        http_response_body(
            b"HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\nff\r\nshort"
        )


def test_negative_content_length_raises_not_hangs():
    """r6 advisor: a Content-Length of -(header_len+8) made next_pos land
    at/before the record start, re-parsing the same record forever.  Must
    raise (so on_error='quarantine' can route it), never loop."""
    # header block is 43 bytes + CRLFCRLF; -(43+8) re-anchors exactly at pos 0
    rec = b"WARC/1.0\r\nContent-Length: -51\r\n\r\n\r\n\r\n"
    with pytest.raises(ValueError, match="negative Content-Length"):
        split_warc_records(rec)
    # any negative value is rejected before arithmetic, not just the fixpoint
    with pytest.raises(ValueError, match="negative Content-Length"):
        split_warc_records(b"WARC/1.0\r\nContent-Length: -1\r\n\r\n\r\n\r\n")


def test_negative_chunk_size_raises_not_hangs():
    """r6 advisor: int(token, 16) accepts '-6', stepping the chunk cursor
    backwards onto its own size line (infinite loop)."""
    msg = b"HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\n-6\r\nabcdef\r\n0\r\n\r\n"
    with pytest.raises(ValueError, match="bad chunk-size token"):
        http_response_body(msg)
    # '+6' and '0x6' are equally accepted by int(_, 16); reject them too
    for tok in (b"+6", b"0x6", b""):
        bad = b"HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\n%s\r\nabcdef\r\n0\r\n\r\n" % tok
        with pytest.raises(ValueError, match="bad chunk-size token"):
            http_response_body(bad)


def test_negative_http_content_length_raises():
    """raw[:n] with negative n silently returned a tail-truncated body."""
    msg = b"HTTP/1.1 200 OK\r\nContent-Length: -5\r\n\r\n" + HTML
    with pytest.raises(ValueError, match="negative Content-Length"):
        http_response_body(msg)


def test_gzip_member_inflate_cap():
    """A tiny crafted gzip member must not balloon past the decode cap."""
    import gzip as _gzip

    from hive_udf_spark.operators import warc as warc_mod

    bomb = _gzip.compress(b"\x00" * (1 << 22))  # 4 MiB of zeros, ~4 KiB gz
    old = warc_mod._MAX_MEMBER_BYTES
    warc_mod._MAX_MEMBER_BYTES = 1 << 20  # 1 MiB cap for the test
    try:
        with pytest.raises(ValueError, match="decode cap"):
            split_warc_records(bomb)
    finally:
        warc_mod._MAX_MEMBER_BYTES = old


def test_warc_records_table_through_spark(spark):
    """Production mapInPandas walk: gzip member -> record -> HTTP parse;
    non-response records pass payload through with NULL status."""
    from hive_udf_spark.operators.warc import warc_records_table

    http = encode_http_response(HTML, chunked=True, chunk_size=16)
    blob = encode_warc(
        [
            {
                "headers": {"WARC-Target-URI": "http://x.test/page"},
                "payload": http,
            },
            {
                "headers": {"WARC-Type": "metadata", "WARC-Target-URI": "http://x.test/meta"},
                "payload": b"key: value",
            },
        ],
        gzip_records=True,
    )
    blobs = spark.createDataFrame([(7, bytearray(blob))], "doc_id bigint, blob binary")
    rows = {r.record_idx: r for r in warc_records_table(blobs).collect()}
    assert len(rows) == 2
    assert rows[0].warc_type == "response"
    assert rows[0].http_status == 200
    assert bytes(rows[0].body) == HTML
    assert rows[0].target_uri == "http://x.test/page"
    assert rows[1].warc_type == "metadata"
    assert rows[1].http_status is None
    assert bytes(rows[1].body) == b"key: value"


def test_streaming_warc_ingest_sink_stream_equals_batch(spark, tmp_path):
    """5-batch streamed ingestion ends at exactly the batch-mode state;
    a manual replay of a committed batch is hwm-skipped (additive
    aggregates stay exactly-once)."""
    import json

    from pyspark.sql import functions as F

    from hive_udf_spark.functions.html import html_to_text
    from hive_udf_spark.operators.warc import (
        warc_page_encoder_udf,
        warc_records_table,
    )
    from hive_udf_spark.streaming.warc_sink import incremental_warc_ingest_sink

    docs = spark.createDataFrame(
        [(i, f"doc number {i} & some <text> here") for i in range(40)],
        "doc_id bigint, text string",
    )
    enc = warc_page_encoder_udf("<html><body><p>", "</p></body></html>", n_hosts=3)
    blobs = docs.select("doc_id", enc("doc_id", "text").alias("blob"))
    src = str(tmp_path / "src")
    for b in range(5):
        blobs.filter(F.col("doc_id") % 5 == b).coalesce(1).write.parquet(f"{src}/b{b}")
    stream = (
        spark.readStream.schema("doc_id bigint, blob binary")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/*")
    )
    state = str(tmp_path / "state")
    q = incremental_warc_ingest_sink(stream, state, str(tmp_path / "ckpt"))
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got_docs = spark.read.parquet(f"{state}/docs")
    assert got_docs.count() == 40
    # batch-mode equivalent
    ext = html_to_text(F.decode("body", "UTF-8"))
    batch = (
        warc_records_table(blobs)
        .filter(F.col("warc_type") == "response")
        .select(
            F.regexp_extract("target_uri", r"^[a-z]+://([^/]+)/", 1).alias("host"),
            F.length(ext).cast("long").alias("n_chars"),
        )
        .groupBy("host")
        .agg(F.count("*").alias("n_docs"), F.sum("n_chars").alias("total_chars"))
    )
    want = {r.host: (r.n_docs, r.total_chars) for r in batch.collect()}
    got = {
        r.host: (r.n_docs, r.total_chars)
        for r in spark.read.parquet(f"{state}/hosts").collect()
    }
    assert got == want
    hwm = json.load(open(f"{state}/meta.json"))
    assert hwm["last_batch"] == 4
    # restart on the same checkpoint: nothing new to process, and any
    # replayed batch is hwm-skipped — additive counts must not move
    stream2 = (
        spark.readStream.schema("doc_id bigint, blob binary")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/*")
    )
    q2 = incremental_warc_ingest_sink(stream2, state, str(tmp_path / "ckpt"))
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()
    got2 = {
        r.host: (r.n_docs, r.total_chars)
        for r in spark.read.parquet(f"{state}/hosts").collect()
    }
    assert got2 == want


def test_warc_records_table_quarantine(spark):
    from hive_udf_spark.operators.warc import warc_records_table

    http = encode_http_response(HTML)
    good = encode_warc([{"headers": {"WARC-Target-URI": "http://x.test/a"}, "payload": http}])
    rows = [(1, bytearray(good)), (2, bytearray(good[:-6])), (3, bytearray(b"junk"))]
    blobs = spark.createDataFrame(rows, "doc_id bigint, blob binary")
    out = {
        (r.doc_id, r.record_idx): r
        for r in warc_records_table(blobs, on_error="quarantine").collect()
    }
    assert out[(1, 0)].warc_type == "response" and out[(1, 0)].decode_error is None
    for bad in (2, 3):
        r = out[(bad, -1)]
        assert r.warc_type is None and r.decode_error
    # default mode still raises on the same input
    import pytest as _pytest
    from pyspark.errors.exceptions.captured import PythonException

    with _pytest.raises(PythonException, match="ValueError"):
        warc_records_table(blobs).collect()
