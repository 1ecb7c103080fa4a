"""Vendored Apache Hudi copy-on-write table source — reads a Hudi
table's live file slices straight from its commit timeline, no
hudi-spark bundle needed (r11, completing the lakehouse trio next to
``sources/delta.py`` and ``sources/iceberg.py``: large corpora ship as
transaction-logged tables in all three formats, and this container has
no Hudi jars, so a ``.hoodie`` drop was unreadable).

Implemented from the PUBLIC Hudi table format (apache/hudi tech specs
— the timeline/file-layout contract, not the implementation):

* ``.hoodie/hoodie.properties`` — table config; ``COPY_ON_WRITE`` and
  (r12) ``MERGE_ON_READ`` tables are vendored;
* the TIMELINE — ``<instant>.commit`` / ``<instant>.deltacommit`` /
  ``<instant>.replacecommit`` JSON files (Hudi 1.x moves them under
  ``.hoodie/timeline/``; both layouts are walked).  An instant is
  COMPLETED only when its completion file exists —
  ``*.requested`` / ``*.inflight`` markers without it are
  in-flight writers and MUST be invisible to readers (snapshot
  isolation), INCLUDING any log files they already dropped;
* MERGE_ON_READ (r12) — deltacommits write LOG FILES
  (``.{fileId}_{baseInstant}.log.{version}_{token}``) next to the file
  group's base file; the log is a sequence of #HUDI#-framed blocks
  (format version, block type, int-keyed header/footer maps, content,
  trailing reverse-seek length — the public HoodieLogFormat layout).
  AVRO data blocks carry length-prefixed Avro records decoded by the
  vendored codec (operators/avrocodec.py) against the writer schema in
  the block header; the snapshot read merges them onto the base file
  by RECORD KEY (``hoodie.table.recordkey.fields``), newest completed
  instant winning.  DELETE blocks (r13, HoodieDeleteBlock v3 — an Avro
  HoodieDeleteRecordList) merge as tombstones: a key whose newest log
  entry is a delete leaves the table, a later upsert re-inserts it;
  ROLLBACK command blocks (r13) erase their log file's earlier blocks
  at the target instant (the failed-appender cleanup contract).
  Corrupt / kryo-era delete / hfile / parquet / cdc blocks refuse
  loudly — skipping one would silently resurrect rows;
* ``HoodieCommitMetadata`` — ``partitionToWriteStats`` maps each
  partition path to write stats carrying ``fileId`` and ``path``.
  Copy-on-write means an update REWRITES a whole file group: a newer
  completed instant writing the same ``fileId`` supersedes the older
  base file (the file-slice rule), which is exactly how real Hudi
  snapshot readers resolve the live set;
* ``<instant>.replacecommit`` — clustering / insert_overwrite:
  ``partitionToReplaceFileIds`` retires whole file groups while the
  commit's own writeStats add their replacements;
* schema — real writers stamp the table's Avro schema JSON into
  ``extraMetadata.schema``; it is pinned onto the distributed parquet
  scan (nullable unions ``["null", T]``, the primitive/logical types
  Hudi emits);
* meta columns — COW base files physically carry the five
  ``_hoodie_*`` bookkeeping columns; the reader returns the DATA
  columns by default (``include_meta=True`` surfaces them), matching
  ``hoodie.datasource.query.incremental.format=latest_state``
  relational expectations;
* time travel — ``as_of=<instant>`` resolves the file-slice view at
  that completed instant and refuses unknown instants.

Spark/scale shape: identical to the Delta/Iceberg readers — the
TIMELINE walk is driver-side (KB–MB of JSON even for PB tables, the
same division of labor real Hudi readers use), while the DATA scan is
an ordinary distributed ``spark.read.parquet`` over the live base
files with the schema pinned, so predicate pushdown / column pruning /
AQE apply unchanged.  MOR log files decode DISTRIBUTED (the path list
fans out and each task streams its files through the vendored block
walker — log files at real scale are many and sizable), and the
key-merge is a plain anti-join + union whose strategy AQE picks at
runtime.

The writer twin (``write_hudi_table``) emits spec-shaped
``hoodie.properties`` + timeline JSON + correctly named base files
(``{fileId}_{writeToken}_{instantTime}.parquet``) so the reader is
exercised against rewrites, replacecommits, in-flight instants and
meta-column stripping.

No reference analogue (the reference is a cardinality-UDAF package,
MLnick/hive-udf UDAFCardinalityEstimator.java) — this supports the
mandated source/ingest extension surface.
"""

from __future__ import annotations

import glob
import json
import os

from pyspark.sql import DataFrame, SparkSession

__all__ = [
    "read_hudi",
    "hudi_live_files",
    "hudi_timeline",
    "write_hudi_table",
]

_MAX_TIMELINE_INSTANTS = 100_000  # runaway-timeline guard (driver memory)

META_COLUMNS = (
    "_hoodie_commit_time",
    "_hoodie_commit_seqno",
    "_hoodie_record_key",
    "_hoodie_partition_path",
    "_hoodie_file_name",
)


def _hoodie_dir(table_path: str) -> str:
    return os.path.join(table_path, ".hoodie")


def _instant_key(instant: str) -> str:
    """Order key for instant times: zero-padded to a fixed width so
    MIXED-WIDTH instants (Hudi 0.x 14-digit second precision vs 1.x
    17-digit millisecond completions) compare numerically — raw string
    compare would sort '2024...|' ABOVE a longer digit run because '|'
    and most separators outrank digits (r12 ADVICE)."""
    return instant.zfill(20)


def _log_version(path: str) -> int:
    """The numeric log-file version out of
    ``.{fileId}_{baseInstant}.log.{version}_{token}`` — '.log.10' must
    order AFTER '.log.2', which raw path compare gets backwards
    (r12 ADVICE)."""
    import re

    m = re.search(r"\.log\.(\d+)", os.path.basename(path))
    return int(m.group(1)) if m else 0


def _read_properties(table_path: str) -> dict[str, str]:
    path = os.path.join(_hoodie_dir(table_path), "hoodie.properties")
    if not os.path.isfile(path):
        raise ValueError(f"hudi: no .hoodie/hoodie.properties under {table_path!r}")
    props: dict[str, str] = {}
    with open(path, encoding="utf-8") as fh:
        for line in fh:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            k, _, v = line.partition("=")
            props[k.strip()] = v.strip()
    return props


def hudi_timeline(table_path: str) -> list[tuple[str, str, dict]]:
    """COMPLETED instants [(instant_time, action, metadata)] in instant
    order.  Only ``.commit`` / ``.deltacommit`` / ``.replacecommit``
    completions count — requested/inflight markers are invisible
    (snapshot isolation).  Walks both the 0.x (``.hoodie/``) and 1.x
    (``.hoodie/timeline/``) layouts."""
    out: list[tuple[str, str, dict]] = []
    for tl_dir in (_hoodie_dir(table_path),
                   os.path.join(_hoodie_dir(table_path), "timeline")):
        if not os.path.isdir(tl_dir):
            continue
        for p in (glob.glob(os.path.join(tl_dir, "*.commit"))
                  + glob.glob(os.path.join(tl_dir, "*.deltacommit"))
                  + glob.glob(os.path.join(tl_dir, "*.replacecommit"))):
            name = os.path.basename(p)
            instant, _, action = name.partition(".")
            # Hudi 1.x names completed files <begin>_<completion>.<action>;
            # the BEGIN instant orders the timeline
            instant = instant.split("_", 1)[0]
            if not instant or not instant.isdigit():
                raise ValueError(f"hudi: malformed timeline file {name!r}")
            if len(out) >= _MAX_TIMELINE_INSTANTS:
                raise ValueError("hudi: timeline instant count past the cap")
            with open(p, encoding="utf-8") as fh:
                try:
                    meta = json.load(fh)
                except json.JSONDecodeError as exc:
                    raise ValueError(
                        f"hudi: malformed commit metadata in {name!r}: {exc}"
                    ) from exc
            out.append((instant, action, meta))
    if not out:
        raise ValueError("hudi: timeline has no completed commits")
    out.sort(key=lambda t: _instant_key(t[0]))
    return out


def _avro_to_spark_type(t) -> str:
    """Avro schema JSON type → Spark simpleString (the types Hudi
    writers stamp into extraMetadata.schema)."""
    if isinstance(t, list):  # nullable union ["null", T]
        non_null = [x for x in t if x != "null"]
        if len(non_null) != 1:
            raise ValueError(f"hudi: unsupported avro union {t!r}")
        return _avro_to_spark_type(non_null[0])
    if isinstance(t, dict):
        logical = t.get("logicalType")
        if logical == "date":
            return "date"
        if logical in ("timestamp-micros", "timestamp-millis"):
            return "timestamp"
        if logical == "decimal":
            return f"decimal({t.get('precision', 10)},{t.get('scale', 0)})"
        return _avro_to_spark_type(t.get("type"))
    simple = {
        "boolean": "boolean", "int": "int", "long": "bigint",
        "float": "float", "double": "double", "string": "string",
        "bytes": "binary",
    }.get(t)
    if simple is None:
        raise ValueError(f"hudi: avro type {t!r} not vendored")
    return simple


def _schema_from_commit(meta: dict) -> tuple[str, list[str]] | None:
    """(Spark DDL string, data column names) from the commit's
    ``extraMetadata.schema`` Avro JSON; None when the writer stamped no
    schema.  ``_hoodie_*`` meta fields are excluded — they are selected
    separately when requested."""
    raw = (meta.get("extraMetadata") or {}).get("schema")
    if not raw:
        return None
    schema = json.loads(raw) if isinstance(raw, str) else raw
    if schema.get("type") != "record":
        raise ValueError("hudi: extraMetadata.schema is not an avro record")
    ddl_parts, names = [], []
    for f in schema.get("fields", []):
        name = f["name"]
        if name in META_COLUMNS:
            continue
        ddl_parts.append(f"{name} {_avro_to_spark_type(f['type'])}")
        names.append(name)
    if not names:
        raise ValueError("hudi: schema carries no data columns")
    return ", ".join(ddl_parts), names


class _FileSlice:
    __slots__ = ("base_instant", "base_path", "logs")

    def __init__(self):
        self.base_instant: str | None = None
        self.base_path: str | None = None
        self.logs: list[tuple[str, str]] = []  # (instant, relative path)


def _file_slices(
    table_path: str, as_of: str | None = None,
    partitions: list[str] | None = None,
) -> tuple[dict[tuple[str, str], _FileSlice], dict | None, dict[str, str]]:
    """The file-slice view at instant ``as_of`` (default latest): per
    file group — keyed (partition path, fileId), since file groups live
    inside partitions — the BASE file written by the newest completed
    instant ≤ the target wins (the COW rewrite rule), and (MOR, r12)
    LOG files from completed deltacommits ≤ the target attach to the
    slice in instant order; replacecommits retire whole file groups.
    A base rewrite or compaction STARTS A NEW SLICE: earlier log files
    are superseded and dropped.  Returns (slices, newest commit
    metadata ≤ target, table properties)."""
    props = _read_properties(table_path)
    ttype = props.get("hoodie.table.type", "COPY_ON_WRITE")
    if ttype not in ("COPY_ON_WRITE", "MERGE_ON_READ"):
        raise ValueError(f"hudi: table type {ttype!r} not vendored")
    timeline = hudi_timeline(table_path)
    if as_of is not None:
        if not any(t == as_of for t, _, _ in timeline):
            raise ValueError(f"hudi: instant {as_of!r} not in the timeline")
        timeline = [t for t in timeline
                    if _instant_key(t[0]) <= _instant_key(as_of)]
    keep = None if partitions is None else set(partitions)
    slices: dict[tuple[str, str], _FileSlice] = {}
    last_meta: dict | None = None
    for instant, action, meta in timeline:
        last_meta = meta
        if action == "replacecommit":
            replaced = meta.get("partitionToReplaceFileIds") or {}
            for part, file_ids in replaced.items():
                for fid in file_ids:
                    slices.pop((part, fid), None)
        for part, stats in (meta.get("partitionToWriteStats") or {}).items():
            if keep is not None and part not in keep:
                continue
            for st in stats:
                fid, path = st.get("fileId"), st.get("path")
                if not fid or not path:
                    raise ValueError(
                        f"hudi: write stat without fileId/path in {instant}"
                    )
                sl = slices.setdefault((part, fid), _FileSlice())
                if ".log." in os.path.basename(path):
                    sl.logs.append((instant, path))
                elif (sl.base_instant is None
                      or _instant_key(instant)
                      >= _instant_key(sl.base_instant)):
                    sl.base_instant = instant
                    sl.base_path = path
                    # a rewritten/compacted base starts a new slice:
                    # older log files are baked in, not replayed
                    sl.logs = [(i, p) for i, p in sl.logs
                               if _instant_key(i) > _instant_key(instant)]
    for sl in slices.values():
        if sl.base_path is None:
            raise ValueError(
                "hudi: file group has log files but no base file "
                "(log-only slices need index-backed key routing; refuse "
                "rather than misread)"
            )
        for rel in [sl.base_path] + [p for _, p in sl.logs]:
            f = os.path.join(table_path, rel)
            if not os.path.isfile(f):
                raise ValueError(f"hudi: live file missing on disk: {f!r}")
    return slices, last_meta, props


def hudi_live_files(
    table_path: str, as_of: str | None = None,
    partitions: list[str] | None = None,
) -> tuple[list[str], dict | None]:
    """The live BASE files at instant ``as_of`` (default latest).
    Slices carrying unmerged log files refuse — the base files alone
    would misread; use ``read_hudi``, which merges."""
    slices, last_meta, _ = _file_slices(table_path, as_of, partitions)
    if any(sl.logs for sl in slices.values()):
        raise ValueError(
            "hudi: table carries unmerged MOR log files — use read_hudi "
            "(the base files alone would misread)"
        )
    files = sorted(
        os.path.join(table_path, sl.base_path) for sl in slices.values()
    )
    return files, last_meta


# ---------------------------------------------------------------------------
# HoodieLogFormat (MOR log files, r12) — vendored block walker + twin
#
# Block layout (the public HoodieLogFormat framing): 6-byte magic
# "#HUDI#", int64be BLOCK SIZE (bytes from after this field through the
# trailing reverse-seek length), int32be format version, int32be block
# type ordinal, int-keyed HEADER map (int32be count, then per entry
# int32be key / int32be byte length / utf8 bytes), int64be content
# length, content, FOOTER map (same shape), int64be total block length
# (magic through here — the reverse-seek pointer).  An AVRO data
# block's content is int32be content-format version, int32be record
# count, then per record int32be length + Avro binary bytes in the
# writer schema carried by the SCHEMA header.
# ---------------------------------------------------------------------------

_LOG_MAGIC = b"#HUDI#"
_LOG_FORMAT_VERSION = 1
_AVRO_CONTENT_VERSION = 3
# HoodieLogBlockType ordinals
_BLOCK_COMMAND, _BLOCK_DELETE, _BLOCK_CORRUPT, _BLOCK_AVRO = 0, 1, 2, 3
_BLOCK_NAMES = {0: "command", 1: "delete", 2: "corrupt", 3: "avro",
                4: "hfile", 5: "parquet", 6: "cdc"}
# HeaderMetadataType ordinals
_H_INSTANT_TIME, _H_TARGET_INSTANT, _H_SCHEMA, _H_COMMAND_TYPE = 0, 1, 2, 3
# HoodieCommandBlockTypeEnum ordinal (stringified in the header value)
_CMD_ROLLBACK_PREVIOUS_BLOCK = "0"
_MAX_LOG_BLOCKS = 100_000
_MAX_LOG_RECORDS_PER_BLOCK = 1 << 24
_DELETE_CONTENT_VERSION = 3  # HoodieDeleteBlock v3: avro record list
# the public HoodieDeleteRecordList.avsc shape (delete block content);
# orderingVal is ignored on read — merge order comes from the log's
# own block ordering, same as data records
_DELETE_RECORD_LIST_SCHEMA = {
    "type": "record",
    "name": "HoodieDeleteRecordList",
    "fields": [{
        "name": "deleteRecordList",
        "type": {"type": "array", "items": {
            "type": "record", "name": "HoodieDeleteRecord",
            "fields": [
                {"name": "recordKey", "type": ["null", "string"],
                 "default": None},
                {"name": "partitionPath", "type": ["null", "string"],
                 "default": None},
                {"name": "orderingVal", "type": ["null", "string"],
                 "default": None},
            ],
        }},
    }],
}


def _read_log_map(b: bytes, pos: int, end: int) -> tuple[dict[int, str], int]:
    if pos + 4 > end:
        raise ValueError("hudi log: header map truncated")
    count = int.from_bytes(b[pos : pos + 4], "big")
    pos += 4
    if count > 64:
        raise ValueError("hudi log: header map count out of bounds")
    out: dict[int, str] = {}
    for _ in range(count):
        if pos + 8 > end:
            raise ValueError("hudi log: header entry truncated")
        key = int.from_bytes(b[pos : pos + 4], "big")
        vlen = int.from_bytes(b[pos + 4 : pos + 8], "big")
        pos += 8
        if pos + vlen > end:
            raise ValueError("hudi log: header value truncated")
        out[key] = b[pos : pos + vlen].decode("utf-8")
        pos += vlen
    return out, pos


def decode_hudi_log(b: bytes) -> list[dict]:
    """A Hudi log file → its blocks, each
    ``{"type", "type_name", "headers" {ordinal: str}, "records",
    "deletes", "target_instant"}``.  AVRO data blocks decode their
    records through the vendored Avro codec against the SCHEMA header;
    DELETE blocks (r13) decode their HoodieDeleteBlock v3 content (an
    Avro HoodieDeleteRecordList) into ``deletes`` = the record keys;
    COMMAND blocks (r13) surface their COMMAND_BLOCK_TYPE and
    TARGET_INSTANT_TIME headers — the rollback contract: a
    ROLLBACK_PREVIOUS_BLOCK command invalidates THIS log file's earlier
    blocks whose instant equals the target (a failed appender's
    leftovers).  Corrupt / hfile / parquet / cdc blocks keep
    ``records=None`` and ``read_hudi`` refuses on them — skipping one
    could silently resurrect rows.  Kryo-era delete blocks (content
    versions 1/2) refuse: decoding Kryo blind is a misread risk, not a
    parsing gap.  Malformed framing → ValueError."""
    from hive_udf_spark.operators.avrocodec import (
        _decode_value,
        _decoder_for,
        _Reader,
    )

    b = bytes(b)
    n = len(b)
    blocks: list[dict] = []
    pos = 0
    while pos < n:
        if len(blocks) >= _MAX_LOG_BLOCKS:
            raise ValueError("hudi log: block count past the cap")
        if b[pos : pos + 6] != _LOG_MAGIC:
            raise ValueError("hudi log: bad block magic")
        start = pos
        pos += 6
        if pos + 8 > n:
            raise ValueError("hudi log: block size truncated")
        size = int.from_bytes(b[pos : pos + 8], "big")
        pos += 8
        end = pos + size
        if size < 28 or end > n:
            raise ValueError("hudi log: block size out of bounds")
        ver = int.from_bytes(b[pos : pos + 4], "big")
        if ver != _LOG_FORMAT_VERSION:
            raise ValueError(f"hudi log: format version {ver} not vendored")
        btype = int.from_bytes(b[pos + 4 : pos + 8], "big")
        if btype not in _BLOCK_NAMES:
            raise ValueError(
                f"hudi log: block type ordinal {btype} out of bounds"
            )
        pos += 8
        headers, pos = _read_log_map(b, pos, end)
        if pos + 8 > end:
            raise ValueError("hudi log: content length truncated")
        clen = int.from_bytes(b[pos : pos + 8], "big")
        pos += 8
        if pos + clen > end:
            raise ValueError("hudi log: content truncated")
        content = b[pos : pos + clen]
        pos += clen
        footers, pos = _read_log_map(b, pos, end)
        if pos + 8 != end:
            raise ValueError("hudi log: trailing length misplaced")
        total = int.from_bytes(b[pos : pos + 8], "big")
        pos += 8
        if total != pos - start:
            raise ValueError("hudi log: reverse-seek length mismatch")
        records = None
        deletes = None
        target_instant = None
        if btype == _BLOCK_DELETE:
            if len(content) < 8:
                raise ValueError("hudi log: delete content truncated")
            dver = int.from_bytes(content[:4], "big")
            if dver != _DELETE_CONTENT_VERSION:
                raise ValueError(
                    f"hudi log: delete block content version {dver} not "
                    "vendored (v1/v2 are kryo-serialized)"
                )
            dlen = int.from_bytes(content[4:8], "big")
            if 8 + dlen != len(content):
                raise ValueError("hudi log: delete content length mismatch")
            plan = _decoder_for(_DELETE_RECORD_LIST_SCHEMA)
            rec = _decode_value(_Reader(content[8:]), plan)
            deletes = []
            for d in rec.get("deleteRecordList") or []:
                key = d.get("recordKey")
                if key is None:
                    raise ValueError("hudi log: delete record without a key")
                deletes.append(key)
        elif btype == _BLOCK_COMMAND:
            cmd = headers.get(_H_COMMAND_TYPE, _CMD_ROLLBACK_PREVIOUS_BLOCK)
            if cmd != _CMD_ROLLBACK_PREVIOUS_BLOCK:
                raise ValueError(
                    f"hudi log: command block type {cmd!r} not vendored"
                )
            target_instant = headers.get(_H_TARGET_INSTANT)
            if not target_instant:
                raise ValueError(
                    "hudi log: rollback command block without "
                    "TARGET_INSTANT_TIME"
                )
        elif btype == _BLOCK_AVRO:
            schema_json = headers.get(_H_SCHEMA)
            if not schema_json:
                raise ValueError("hudi log: avro block without a SCHEMA header")
            plan = _decoder_for(json.loads(schema_json))
            if len(content) < 8:
                raise ValueError("hudi log: avro content truncated")
            cver = int.from_bytes(content[:4], "big")
            if cver != _AVRO_CONTENT_VERSION:
                raise ValueError(
                    f"hudi log: avro content version {cver} not vendored"
                )
            count = int.from_bytes(content[4:8], "big")
            if count > _MAX_LOG_RECORDS_PER_BLOCK:
                raise ValueError("hudi log: record count out of bounds")
            at = 8
            records = []
            for _ in range(count):
                if at + 4 > len(content):
                    raise ValueError("hudi log: record length truncated")
                rlen = int.from_bytes(content[at : at + 4], "big")
                at += 4
                if at + rlen > len(content):
                    raise ValueError("hudi log: record truncated")
                r = _Reader(content[at : at + rlen])
                records.append(_decode_value(r, plan))
                at += rlen
            if at != len(content):
                raise ValueError("hudi log: trailing bytes after records")
        blocks.append({
            "type": btype,
            "type_name": _BLOCK_NAMES.get(btype, str(btype)),
            "headers": headers,
            "footers": footers,
            "records": records,
            "deletes": deletes,
            "target_instant": target_instant,
        })
    return blocks


def encode_hudi_log(blocks: list[dict]) -> bytes:
    """Fixture twin: serialize blocks (``{"instant", "schema",
    "records"}`` for avro data blocks, ``{"instant", "deletes": [keys]}``
    for HoodieDeleteBlock v3 delete blocks, ``{"instant", "rollback_of":
    target_instant}`` for rollback command blocks, or ``{"type",
    "content", "headers"}`` raw) into the #HUDI# framing
    ``decode_hudi_log`` reads."""
    from hive_udf_spark.operators.avrocodec import _decoder_for, _encode_value

    out = bytearray()
    for blk in blocks:
        if "deletes" in blk:
            btype = _BLOCK_DELETE
            plan = _decoder_for(_DELETE_RECORD_LIST_SCHEMA)
            payload = _encode_value(plan, {"deleteRecordList": [
                {"recordKey": k, "partitionPath": "", "orderingVal": None}
                for k in blk["deletes"]
            ]})
            content = (_DELETE_CONTENT_VERSION.to_bytes(4, "big")
                       + len(payload).to_bytes(4, "big") + payload)
            headers = {_H_INSTANT_TIME: blk["instant"]}
        elif "rollback_of" in blk:
            btype = _BLOCK_COMMAND
            content = b""
            headers = {
                _H_INSTANT_TIME: blk["instant"],
                _H_TARGET_INSTANT: blk["rollback_of"],
                _H_COMMAND_TYPE: _CMD_ROLLBACK_PREVIOUS_BLOCK,
            }
        elif "records" in blk:
            btype = _BLOCK_AVRO
            schema = blk["schema"]
            plan = _decoder_for(schema)
            body = bytearray()
            body += _AVRO_CONTENT_VERSION.to_bytes(4, "big")
            body += len(blk["records"]).to_bytes(4, "big")
            for rec in blk["records"]:
                enc = _encode_value(plan, rec)
                body += len(enc).to_bytes(4, "big") + enc
            headers = {
                _H_INSTANT_TIME: blk["instant"],
                _H_SCHEMA: json.dumps(schema, separators=(",", ":")),
            }
            content = bytes(body)
        else:
            btype = int(blk["type"])
            headers = dict(blk.get("headers") or {})
            content = bytes(blk.get("content") or b"")

        def _map_bytes(m: dict[int, str]) -> bytes:
            mb = bytearray(len(m).to_bytes(4, "big"))
            for k in sorted(m):
                v = m[k].encode("utf-8")
                mb += int(k).to_bytes(4, "big") + len(v).to_bytes(4, "big") + v
            return bytes(mb)

        hb = _map_bytes(headers)
        fb = _map_bytes({})
        size = 8 + len(hb) + 8 + len(content) + len(fb) + 8
        out += _LOG_MAGIC + size.to_bytes(8, "big")
        out += _LOG_FORMAT_VERSION.to_bytes(4, "big")
        out += btype.to_bytes(4, "big")
        out += hb
        out += len(content).to_bytes(8, "big") + content
        out += fb
        out += (14 + size).to_bytes(8, "big")  # magic..here, reverse seek
    return bytes(out)


def _log_records_df(
    spark: SparkSession,
    log_paths: list[str],
    ddl: str,
    names: list[str],
    completed: frozenset[str],
    key_fields: list[str],
):
    """Distributed decode of MOR log files → DataFrame of their avro
    upserts AND delete-block tombstones, plus ``__ord`` (zero-padded
    instant | numeric log version | file | block | record — the
    newest-wins merge order; the instant pads to a fixed width and the
    log version compares NUMERICALLY, because raw string compare
    mis-orders mixed-width instants and '.log.10' vs '.log.2' — r12
    ADVICE) and ``__deleted`` (True for delete-block keys: the newest
    entry for a key being a tombstone removes the key, unless a later
    upsert re-inserts it).  Blocks whose INSTANT_TIME is not a
    COMPLETED instant are SKIPPED (an in-flight appender's blocks must
    stay invisible); a ROLLBACK command block (r13) erases THIS file's
    earlier blocks whose instant equals its target — the public
    HoodieLogFormat cleanup contract for failed appenders — and is
    honored regardless of completion state, since the rollback action
    itself may later be archived; corrupt/hfile/parquet/cdc blocks
    refuse loudly.

    The path list fans out as a DataFrame and each task OPENS its log
    files through the table's shared filesystem (the contract every
    distributed scan already relies on) — Spark's own binaryFile
    source cannot list them, because Hudi log files are dot-prefixed
    and its listing treats dot-files as hidden."""
    from pyspark.sql.types import StructType, _parse_datatype_string

    out_schema = _parse_datatype_string(
        ddl + ", __ord string, __deleted boolean"
    )
    assert isinstance(out_schema, StructType)
    # delete-block record keys are STRINGS (Hudi's _hoodie_record_key
    # convention); coerce them to each key column's type so tombstone
    # rows join the upsert rows under one schema
    key_convs: dict = {}
    for kf in key_fields:
        key_simple = out_schema[kf].dataType.simpleString()
        if key_simple in ("tinyint", "smallint", "int", "bigint"):
            key_convs[kf] = int
        elif key_simple in ("float", "double"):
            key_convs[kf] = float
        elif key_simple == "string":
            key_convs[kf] = str
        else:
            raise ValueError(
                f"hudi: record key type {key_simple!r} not vendored "
                "for delete-block coercion"
            )

    def parse_key(key: str) -> dict:
        """HoodieKey record-key string → {field: typed value}.  A
        single-field key IS the raw value; a composite key carries the
        ComplexKeyGenerator's canonical ``f1:v1,f2:v2`` encoding (the
        same format this repo's upsert sink writes)."""
        if len(key_fields) == 1:
            kf = key_fields[0]
            return {kf: key_convs[kf](key)}
        out: dict = {}
        for part in key.split(","):
            name, sep, val = part.partition(":")
            if not sep or name not in key_convs:
                raise ValueError(
                    f"hudi: composite delete key {key!r} does not "
                    f"match record key fields {key_fields} — "
                    "expected the ComplexKeyGenerator's "
                    "'f1:v1,f2:v2' encoding"
                )
            out[name] = key_convs[name](val)
        if sorted(out) != sorted(key_fields):
            raise ValueError(
                f"hudi: composite delete key {key!r} is missing "
                f"fields of {key_fields}"
            )
        return out

    def gen(batches):
        import pandas as _pd

        for pdf in batches:
            rows = []
            for path in pdf["path"]:
                with open(path, "rb") as fh:
                    content = fh.read()
                ver = _log_version(path)
                ikey = _instant_key  # executor-side alias
                entries: list[tuple[str, list]] = []  # (instant, row)
                for bi, blk in enumerate(decode_hudi_log(content)):
                    if blk["type"] == _BLOCK_COMMAND:
                        tgt = blk["target_instant"]
                        entries = [e for e in entries if e[0] != tgt]
                        continue
                    instant = blk["headers"].get(_H_INSTANT_TIME)
                    if not instant:
                        raise ValueError(
                            "hudi: log block without INSTANT_TIME"
                        )
                    if instant not in completed:
                        continue  # uncommitted append: invisible
                    ord_of = lambda ri: (
                        f"{ikey(instant)}|{ver:010d}|{path}"
                        f"|{bi:08d}|{ri:08d}"
                    )
                    if blk["deletes"] is not None:
                        for ri, key in enumerate(blk["deletes"]):
                            kv = parse_key(key)
                            rows_v = [kv.get(c) for c in names]
                            entries.append(
                                (instant, rows_v + [ord_of(ri), True])
                            )
                        continue
                    if blk["records"] is None:
                        raise ValueError(
                            f"hudi: {blk['type_name']} log block not "
                            "vendored — skipping it could resurrect rows"
                        )
                    for ri, rec in enumerate(blk["records"]):
                        entries.append((
                            instant,
                            [rec.get(c) for c in names]
                            + [ord_of(ri), False],
                        ))
                rows.extend(r for _, r in entries)
            yield _pd.DataFrame(
                rows, columns=names + ["__ord", "__deleted"]
            )

    paths = spark.createDataFrame([(p,) for p in log_paths], "path string")
    return paths.repartition(min(len(log_paths), 64)).mapInPandas(
        gen, out_schema
    )


def read_hudi(
    spark: SparkSession,
    table_path: str,
    as_of: str | None = None,
    include_meta: bool = False,
    partitions: list[str] | None = None,
) -> DataFrame:
    """Hudi table → DataFrame of its live rows at instant ``as_of``
    (default latest).  Data columns only unless ``include_meta=True``
    (the five ``_hoodie_*`` bookkeeping columns base files carry).
    ``partitions`` prunes to the named partition paths driver-side —
    the PB-scale file-set pruning, same as the Delta reader's
    partition_filter.

    MERGE_ON_READ (r12): slices carrying log files merge them onto the
    base scan by the table's RECORD KEY
    (``hoodie.table.recordkey.fields``) — the newest completed
    instant's record wins per key; log decode runs distributed and the
    key-merge is an anti-join + union (AQE picks the strategy).
    DELETE blocks (r13) apply as tombstones inside the same merge (a
    key whose newest log entry is a delete leaves the table; a later
    upsert re-inserts it) and ROLLBACK command blocks erase their
    file's blocks at the target instant before the merge."""
    slices, meta, props = _file_slices(table_path, as_of,
                                       partitions=partitions)
    pinned = _schema_from_commit(meta or {})
    files = sorted(os.path.join(table_path, sl.base_path)
                   for sl in slices.values())
    log_paths = sorted(
        os.path.join(table_path, rel)
        for sl in slices.values() for _, rel in sl.logs
    )
    if not files:
        if pinned is None:
            raise ValueError("hudi: empty table without a stamped schema")
        return spark.createDataFrame([], pinned[0])
    if not log_paths:
        if pinned is None:
            df = spark.read.parquet(*files)
            data_cols = [c for c in df.columns if c not in META_COLUMNS]
            return (df.select(*df.columns) if include_meta
                    else df.select(*data_cols))
        ddl, names = pinned
        if include_meta:
            meta_ddl = ", ".join(f"{c} string" for c in META_COLUMNS)
            df = spark.read.schema(f"{meta_ddl}, {ddl}").parquet(*files)
            return df.select(*META_COLUMNS, *names)
        # meta columns are pruned AT THE SCAN (ReadSchema carries only
        # the data columns) — the pin is also the projection
        return spark.read.schema(ddl).parquet(*files).select(*names)
    # ---- MERGE_ON_READ snapshot read ----
    if include_meta:
        raise ValueError(
            "hudi: include_meta is not vendored for MOR merges (log "
            "records carry no materialized meta columns)"
        )
    if pinned is None:
        raise ValueError("hudi: MOR merge needs a stamped schema")
    raw_key = (props.get("hoodie.table.recordkey.fields") or "").strip()
    # COMPOSITE record keys (r14 — the r13 verdict's task 3): Hudi
    # accepts a comma-separated field list, and every merge primitive
    # below is already key-shape-agnostic — the window partitions by
    # all fields, the anti-join joins on all fields, and delete-block
    # HoodieKeys carry the ComplexKeyGenerator's canonical
    # "f1:v1,f2:v2" string, parsed back per field in the decode
    key_fields = [f.strip() for f in raw_key.split(",") if f.strip()]
    if not key_fields:
        raise ValueError(
            "hudi: MOR merge needs hoodie.table.recordkey.fields"
        )
    ddl, names = pinned
    for kf in key_fields:
        if kf not in names:
            raise ValueError(
                f"hudi: record key {kf!r} is not a data column"
            )
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    completed = frozenset(
        t for t, _, _ in hudi_timeline(table_path)
        if as_of is None or _instant_key(t) <= _instant_key(as_of)
    )
    base = spark.read.schema(ddl).parquet(*files).select(*names)
    logs = _log_records_df(spark, log_paths, ddl, names, completed,
                           key_fields)
    w = Window.partitionBy(*key_fields).orderBy(F.col("__ord").desc())
    latest = (
        logs.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(*names, "__deleted")
        # the merged log relation feeds BOTH the anti-join and the
        # union; without this the whole distributed log decode runs
        # TWICE (r13 plan audit).  Materializing it once is the Spark
        # shape of Hudi's own in-memory log-record merge map — log
        # deltas are small next to base files.  localCheckpoint (not
        # persist) so the blocks are GC-cleaned with the DataFrame
        # instead of accumulating in the session cache manager for the
        # session's lifetime (r13 review)
        .localCheckpoint(eager=True)
    )
    # EVERY log-touched key leaves the base scan (anti-join); only keys
    # whose NEWEST log entry is an upsert come back — a key whose newest
    # entry is a delete-block tombstone is gone, and a
    # delete-then-reinsert layering resurfaces with the reinsert values
    return base.join(latest.select(*key_fields), on=key_fields,
                     how="left_anti").unionByName(
        latest.filter(~F.col("__deleted")).select(*names)
    ).select(*names)


# ---------------------------------------------------------------------------
# Writer twin (fixtures, tests, the oracle roundtrip)
# ---------------------------------------------------------------------------


def _avro_field(name: str, spark_type: str) -> dict:
    avro = {
        "bigint": "long", "int": "int", "string": "string",
        "double": "double", "float": "float", "boolean": "boolean",
        "binary": "bytes",
    }.get(spark_type)
    if avro is None:
        raise ValueError(f"hudi writer twin: type {spark_type!r} unsupported")
    return {"name": name, "type": ["null", avro], "default": None}


def write_hudi_table(
    table_path: str,
    commits: list[dict],
    schema_fields: list[tuple[str, str]],
    table_name: str = "fixture_table",
    record_key: str = "doc_id",
) -> None:
    """Emit a spec-shaped Hudi table.  ``commits`` is a list of
    instants in order; each is ``{"writes": {fileId: src_parquet_path},
    "replaces": [fileId, ...], "log_writes": {fileId: [record dicts]},
    "log_append_uncommitted": {fileId: [record dicts]},
    "action": "commit"|"deltacommit"|"replacecommit",
    "inflight": bool}``.  Source parquet files are renamed into the
    base-file convention ``{fileId}_{writeToken}_{instant}.parquet``;
    ``log_writes`` (r12, MOR) drops a #HUDI#-framed avro log file into
    the file group's slice (``.{fileId}_{baseInstant}.log.{v}_{token}``)
    and the table becomes MERGE_ON_READ; ``log_append_uncommitted``
    appends a block whose instant is NOT on the timeline to an existing
    log file (an in-flight appender — its records must stay invisible);
    an ``inflight`` instant gets only requested/inflight markers (its
    data must stay invisible).  ``schema_fields`` are (name,
    spark_simple_type) pairs stamped as the Avro schema real writers
    put in extraMetadata."""
    hoodie = _hoodie_dir(table_path)
    os.makedirs(hoodie, exist_ok=True)
    any_logs = any(c.get("log_writes") or c.get("log_append_uncommitted")
                   or c.get("log_deletes") or c.get("log_rollback")
                   for c in commits)
    ttype = "MERGE_ON_READ" if any_logs else "COPY_ON_WRITE"
    with open(os.path.join(hoodie, "hoodie.properties"), "w") as fh:
        fh.write(
            "hoodie.table.name=%s\n"
            "hoodie.table.type=%s\n"
            "hoodie.table.recordkey.fields=%s\n"
            "hoodie.table.version=6\n"
            "hoodie.timeline.layout.version=1\n"
            % (table_name, ttype, record_key)
        )
    avro_schema_obj = {
        "type": "record",
        "name": table_name,
        "fields": [_avro_field(n, t) for n, t in schema_fields],
    }
    avro_schema = json.dumps(avro_schema_obj)
    base_instant_of: dict[str, str] = {}  # fileId -> its slice's base instant
    log_ver: dict[str, int] = {}
    log_rel_of: dict[str, str] = {}  # fileId -> newest log file (for appends)
    for i, commit in enumerate(commits):
        instant = f"{20240101000000 + i}"
        action = commit.get(
            "action",
            "deltacommit"
            if commit.get("log_writes") or commit.get("log_deletes")
            else "commit",
        )
        if commit.get("inflight"):
            open(os.path.join(hoodie, f"{instant}.{action}.requested"), "w").close()
            open(os.path.join(hoodie, f"{instant}.inflight"), "w").close()
            # an in-flight writer may already have dropped base files
            for fid, src in (commit.get("writes") or {}).items():
                base = f"{fid}_0-0-0_{instant}.parquet"
                os.replace(src, os.path.join(table_path, base))
            continue
        part_writes: dict[str, dict] = {"": dict(commit.get("writes") or {})}
        for part, writes in (commit.get("partition_writes") or {}).items():
            part_writes.setdefault(part, {}).update(writes)
        stats_by_part: dict[str, list] = {}
        for part, writes in part_writes.items():
            for fid, src in writes.items():
                base = f"{fid}_0-0-0_{instant}.parquet"
                rel = os.path.join(part, base) if part else base
                dst = os.path.join(table_path, rel)
                os.makedirs(os.path.dirname(dst), exist_ok=True)
                os.replace(src, dst)
                base_instant_of[fid] = instant
                stats_by_part.setdefault(part, []).append({
                    "fileId": fid,
                    "path": rel,
                    "prevCommit": "null",
                    "numWrites": 0,
                    "fileSizeInBytes": os.path.getsize(dst),
                })
        for fid, records in (commit.get("log_writes") or {}).items():
            base_instant = base_instant_of.get(fid)
            if base_instant is None:
                raise ValueError(
                    f"hudi twin: log write for {fid!r} before its base file"
                )
            log_ver[fid] = log_ver.get(fid, 0) + 1
            rel = f".{fid}_{base_instant}.log.{log_ver[fid]}_0-0-0"
            blob = encode_hudi_log([{
                "instant": instant,
                "schema": avro_schema_obj,
                "records": records,
            }])
            with open(os.path.join(table_path, rel), "wb") as fh:
                fh.write(blob)
            log_rel_of[fid] = rel
            stats_by_part.setdefault("", []).append({
                "fileId": fid,
                "path": rel,
                "prevCommit": base_instant,
                "numWrites": 0,
                "fileSizeInBytes": len(blob),
            })
        for fid, keys in (commit.get("log_deletes") or {}).items():
            base_instant = base_instant_of.get(fid)
            if base_instant is None:
                raise ValueError(
                    f"hudi twin: delete block for {fid!r} before its base"
                )
            log_ver[fid] = log_ver.get(fid, 0) + 1
            rel = f".{fid}_{base_instant}.log.{log_ver[fid]}_0-0-0"
            blob = encode_hudi_log([{"instant": instant, "deletes": keys}])
            with open(os.path.join(table_path, rel), "wb") as fh:
                fh.write(blob)
            log_rel_of[fid] = rel
            stats_by_part.setdefault("", []).append({
                "fileId": fid,
                "path": rel,
                "prevCommit": base_instant,
                "numWrites": 0,
                "fileSizeInBytes": len(blob),
            })
        for fid, target in (commit.get("log_rollback") or {}).items():
            # the rollback ACTION appends a command block to the file
            # group's newest log file — no writeStats entry (the log
            # path already rides the slice from its original append)
            rel = log_rel_of.get(fid)
            if rel is None:
                raise ValueError(
                    f"hudi twin: rollback for {fid!r} needs a log file"
                )
            blob = encode_hudi_log([
                {"instant": instant, "rollback_of": target}
            ])
            with open(os.path.join(table_path, rel), "ab") as fh:
                fh.write(blob)
        for fid, records in (commit.get("log_append_uncommitted") or {}).items():
            rel = log_rel_of.get(fid)
            if rel is None:
                raise ValueError(
                    f"hudi twin: uncommitted append for {fid!r} needs a log"
                )
            blob = encode_hudi_log([{
                "instant": "99990101000000",  # never on the timeline
                "schema": avro_schema_obj,
                "records": records,
            }])
            with open(os.path.join(table_path, rel), "ab") as fh:
                fh.write(blob)
        meta: dict = {
            "partitionToWriteStats": stats_by_part or {"": []},
            "compacted": False,
            "extraMetadata": {"schema": avro_schema},
            "operationType": (
                "INSERT" if action == "commit" else "CLUSTER"
            ),
        }
        if commit.get("replaces"):
            meta["partitionToReplaceFileIds"] = {"": list(commit["replaces"])}
        with open(os.path.join(hoodie, f"{instant}.{action}"), "w") as fh:
            json.dump(meta, fh)
