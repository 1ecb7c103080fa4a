"""Vendored Apache Hudi COW source (sources/hudi.py, r11): file-slice
resolution (rewrites supersede), replacecommit retirement, in-flight
invisibility, time travel, meta-column stripping, MOR refusal, schema
pinning, corrupt-timeline errors."""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from hive_udf_spark.sources.hudi import (
    META_COLUMNS,
    hudi_live_files,
    hudi_timeline,
    read_hudi,
    write_hudi_table,
)

FIELDS = [("doc_id", "bigint"), ("lang", "string"), ("n", "bigint")]


def _src(tmp, name: str, rows: list[tuple], meta: bool = True) -> str:
    cols = {
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "lang": pa.array([r[1] for r in rows], pa.string()),
        "n": pa.array([r[2] for r in rows], pa.int64()),
    }
    if meta:
        cols = {
            "_hoodie_commit_time": pa.array(["t"] * len(rows)),
            "_hoodie_commit_seqno": pa.array(["s"] * len(rows)),
            "_hoodie_record_key": pa.array([str(r[0]) for r in rows]),
            "_hoodie_partition_path": pa.array([""] * len(rows)),
            "_hoodie_file_name": pa.array([name] * len(rows)),
            **cols,
        }
    path = str(tmp / f"src_{name}.parquet")
    pq.write_table(pa.table(cols), path)
    return path


def _basic(tmp, table: str) -> None:
    """instant 1: file groups a + b; instant 2: rewrite b (same fileId)."""
    write_hudi_table(table, [
        {"writes": {"fg-a": _src(tmp, "a", [(1, "en", 10), (2, "de", 20)]),
                    "fg-b": _src(tmp, "b", [(3, "fr", 30)])}},
        {"writes": {"fg-b": _src(tmp, "b2", [(3, "fr", 31), (4, "es", 40)])}},
    ], FIELDS)


def test_file_slice_rewrite_supersedes(spark, tmp_path):
    table = str(tmp_path / "t")
    _basic(tmp_path, table)
    got = sorted(tuple(r) for r in read_hudi(spark, table).collect())
    assert got == [(1, "en", 10), (2, "de", 20), (3, "fr", 31), (4, "es", 40)]


def test_meta_columns_stripped_by_scan_schema(spark, tmp_path):
    table = str(tmp_path / "t")
    _basic(tmp_path, table)
    df = read_hudi(spark, table)
    assert df.columns == ["doc_id", "lang", "n"]
    # the pin is also the projection: the scan's ReadSchema must not
    # carry the meta columns at all
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "_hoodie_commit_time" not in plan
    withmeta = read_hudi(spark, table, include_meta=True)
    assert withmeta.columns[:5] == list(META_COLUMNS)
    assert withmeta.filter("_hoodie_record_key = '3'").count() == 1


def test_time_travel_and_unknown_instant(spark, tmp_path):
    table = str(tmp_path / "t")
    _basic(tmp_path, table)
    instants = [t for t, _, _ in hudi_timeline(table)]
    at_first = read_hudi(spark, table, as_of=instants[0])
    got = sorted(tuple(r) for r in at_first.collect())
    assert got == [(1, "en", 10), (2, "de", 20), (3, "fr", 30)]
    with pytest.raises(ValueError, match="not in the timeline"):
        read_hudi(spark, table, as_of="19990101000000")


def test_inflight_instants_invisible(spark, tmp_path):
    table = str(tmp_path / "t")
    write_hudi_table(table, [
        {"writes": {"fg-a": _src(tmp_path, "a", [(1, "en", 10)])}},
        {"writes": {"fg-x": _src(tmp_path, "x", [(9, "xx", 99)])},
         "inflight": True},
    ], FIELDS)
    got = sorted(tuple(r) for r in read_hudi(spark, table).collect())
    assert got == [(1, "en", 10)]
    # the in-flight base file IS on disk, proving invisibility is
    # timeline-driven, not listing-driven
    assert any("fg-x" in f for f in os.listdir(table))


def test_replacecommit_retires_file_groups(spark, tmp_path):
    table = str(tmp_path / "t")
    write_hudi_table(table, [
        {"writes": {"fg-a": _src(tmp_path, "a", [(1, "en", 10)]),
                    "fg-b": _src(tmp_path, "b", [(2, "de", 20)])}},
        {"action": "replacecommit", "replaces": ["fg-a", "fg-b"],
         "writes": {"fg-c": _src(tmp_path, "c", [(1, "en", 10), (2, "de", 20)])}},
    ], FIELDS)
    files, _ = hudi_live_files(table)
    assert len(files) == 1 and "fg-c" in files[0]
    assert read_hudi(spark, table).count() == 2


def test_unknown_table_type_refuses(tmp_path):
    """MOR is vendored since r12; anything else still refuses."""
    table = str(tmp_path / "t")
    _basic(tmp_path, table)
    props = os.path.join(table, ".hoodie", "hoodie.properties")
    body = open(props).read().replace("COPY_ON_WRITE", "SOME_FUTURE_TYPE")
    open(props, "w").write(body)
    with pytest.raises(ValueError, match="not vendored"):
        hudi_live_files(table)


def test_corrupt_timeline_errors(tmp_path):
    table = str(tmp_path / "t")
    _basic(tmp_path, table)
    hoodie = os.path.join(table, ".hoodie")
    commits = sorted(p for p in os.listdir(hoodie) if p.endswith(".commit"))
    with open(os.path.join(hoodie, commits[0]), "w") as fh:
        fh.write("{not json")
    with pytest.raises(ValueError, match="malformed commit metadata"):
        hudi_timeline(table)
    os.remove(os.path.join(hoodie, commits[0]))
    os.remove(os.path.join(hoodie, commits[1]))
    with pytest.raises(ValueError, match="no completed commits"):
        hudi_timeline(table)


def test_missing_properties_and_missing_base_file(tmp_path):
    with pytest.raises(ValueError, match="hoodie.properties"):
        hudi_live_files(str(tmp_path / "nope"))
    table = str(tmp_path / "t")
    _basic(tmp_path, table)
    files, _ = hudi_live_files(table)
    os.remove(files[0])
    with pytest.raises(ValueError, match="missing on disk"):
        hudi_live_files(table)


def test_schema_pinned_from_avro_extra_metadata(spark, tmp_path):
    table = str(tmp_path / "t")
    _basic(tmp_path, table)
    df = read_hudi(spark, table)
    assert [f.dataType.simpleString() for f in df.schema.fields] == [
        "bigint", "string", "bigint"
    ]
    # a commit whose schema the reader cannot map must refuse loudly
    hoodie = os.path.join(table, ".hoodie")
    commits = sorted(p for p in os.listdir(hoodie) if p.endswith(".commit"))
    meta = json.load(open(os.path.join(hoodie, commits[-1])))
    meta["extraMetadata"]["schema"] = json.dumps(
        {"type": "record", "name": "r",
         "fields": [{"name": "x", "type": {"type": "array", "items": "long"}}]}
    )
    json.dump(meta, open(os.path.join(hoodie, commits[-1]), "w"))
    with pytest.raises(ValueError, match="not vendored"):
        read_hudi(spark, table)


def test_hudi_1x_timeline_filenames(spark, tmp_path):
    """Hudi 1.x names completed instants <begin>_<completion>.<action>;
    the begin instant orders the timeline."""
    import shutil

    table = str(tmp_path / "t")
    _basic(tmp_path, table)
    hoodie = os.path.join(table, ".hoodie")
    tl = os.path.join(hoodie, "timeline")
    os.makedirs(tl)
    for f in sorted(os.listdir(hoodie)):
        if f.endswith(".commit"):
            begin = f.split(".")[0]
            shutil.move(os.path.join(hoodie, f),
                        os.path.join(tl, f"{begin}_{begin}9.commit"))
    got = sorted(tuple(r) for r in read_hudi(spark, table).collect())
    assert got == [(1, "en", 10), (2, "de", 20), (3, "fr", 31), (4, "es", 40)]


def test_partitioned_table_and_pruning(spark, tmp_path):
    """File groups live inside partitions: the slice key is
    (partition, fileId) — the same fileId in two partitions must not
    collide — and `partitions=` prunes the file set driver-side."""
    write_hudi_table(str(tmp_path / "t"), [
        {"partition_writes": {
            "day=7": {"fg-a": _src(tmp_path, "a", [(1, "en", 10)])},
            "day=8": {"fg-a": _src(tmp_path, "b", [(2, "de", 20)])},
        }},
        {"partition_writes": {
            "day=8": {"fg-a": _src(tmp_path, "b2", [(2, "de", 22)])},
        }},
    ], FIELDS)
    table = str(tmp_path / "t")
    got = sorted(tuple(r) for r in read_hudi(spark, table).collect())
    assert got == [(1, "en", 10), (2, "de", 22)]  # day=8 rewrite applied
    pruned = read_hudi(spark, table, partitions=["day=7"])
    assert len(pruned.inputFiles()) == 1 and "day=7" in pruned.inputFiles()[0]
    assert [tuple(r) for r in pruned.collect()] == [(1, "en", 10)]


# ---------------------------------------------------------------------------
# MERGE_ON_READ (r12)
# ---------------------------------------------------------------------------


def test_hudi_log_codec_roundtrip():
    """#HUDI#-framed avro blocks survive encode -> decode exactly."""
    from hive_udf_spark.sources.hudi import decode_hudi_log, encode_hudi_log

    schema = {"type": "record", "name": "r", "fields": [
        {"name": "doc_id", "type": ["null", "long"], "default": None},
        {"name": "lang", "type": ["null", "string"], "default": None},
    ]}
    recs1 = [{"doc_id": 1, "lang": "en"}, {"doc_id": 2, "lang": None}]
    recs2 = [{"doc_id": 3, "lang": "fr"}]
    blob = encode_hudi_log([
        {"instant": "20240101000001", "schema": schema, "records": recs1},
        {"instant": "20240101000002", "schema": schema, "records": recs2},
    ])
    blocks = decode_hudi_log(blob)
    assert [b["type_name"] for b in blocks] == ["avro", "avro"]
    assert blocks[0]["records"] == recs1 and blocks[1]["records"] == recs2
    assert blocks[0]["headers"][0] == "20240101000001"
    # framing fuzz: truncation and byte flips never crash non-ValueError
    import numpy as np

    rng = np.random.RandomState(5)
    for _ in range(200):
        m = bytearray(blob)
        m[rng.randint(len(m))] ^= 1 << rng.randint(8)
        try:
            decode_hudi_log(bytes(m))
        except ValueError:
            pass
    for cut in range(0, len(blob), 7):
        try:
            decode_hudi_log(blob[:cut])
        except ValueError:
            pass


def test_hudi_log_delete_command_codec_roundtrip_and_fuzz():
    """r13: delete + rollback blocks survive encode -> decode exactly,
    and byte flips / truncation over the new block types never crash
    with anything but ValueError."""
    from hive_udf_spark.sources.hudi import decode_hudi_log, encode_hudi_log

    blob = encode_hudi_log([
        {"instant": "20240101000001", "deletes": ["7", "42"]},
        {"instant": "20240101000002", "rollback_of": "20240101000001"},
    ])
    blocks = decode_hudi_log(blob)
    assert [b["type_name"] for b in blocks] == ["delete", "command"]
    assert blocks[0]["deletes"] == ["7", "42"]
    assert blocks[0]["records"] is None
    assert blocks[1]["target_instant"] == "20240101000001"
    import numpy as np

    rng = np.random.RandomState(13)
    for _ in range(300):
        m = bytearray(blob)
        m[rng.randint(len(m))] ^= 1 << rng.randint(8)
        try:
            out = decode_hudi_log(bytes(m))
            # a surviving decode must still be structurally sane
            for b in out:
                assert b["type"] in (0, 1, 2, 3, 4, 5, 6)
        except ValueError:
            pass
    for cut in range(0, len(blob), 5):
        try:
            decode_hudi_log(blob[:cut])
        except ValueError:
            pass


def test_mor_snapshot_merges_newest_record_per_key(spark, tmp_path):
    """r12 (r11 verdict task 4): deltacommit log records override base
    rows by record key; two stacked updates — the newest wins."""
    table = str(tmp_path / "t")
    write_hudi_table(table, [
        {"writes": {"fg-a": _src(tmp_path, "a",
                                 [(1, "en", 10), (2, "de", 20), (3, "fr", 30)])}},
        {"log_writes": {"fg-a": [{"doc_id": 2, "lang": "de", "n": 21},
                                 {"doc_id": 4, "lang": "es", "n": 40}]}},
        {"log_writes": {"fg-a": [{"doc_id": 2, "lang": "de", "n": 22}]}},
    ], FIELDS)
    got = sorted(tuple(r) for r in read_hudi(spark, table).collect())
    assert got == [(1, "en", 10), (2, "de", 22), (3, "fr", 30),
                   (4, "es", 40)]
    # time travel: at the first deltacommit the n=21 update is live
    got1 = sorted(tuple(r) for r in
                  read_hudi(spark, table, as_of="20240101000001").collect())
    assert got1 == [(1, "en", 10), (2, "de", 21), (3, "fr", 30),
                    (4, "es", 40)]
    # and at the base commit, no log applies
    got0 = sorted(tuple(r) for r in
                  read_hudi(spark, table, as_of="20240101000000").collect())
    assert got0 == [(1, "en", 10), (2, "de", 20), (3, "fr", 30)]
    # base listing refuses under unmerged logs
    with pytest.raises(ValueError, match="unmerged"):
        hudi_live_files(table)


def test_mor_compaction_starts_new_slice(spark, tmp_path):
    """A base rewrite (compaction) supersedes earlier log files —
    their updates are baked in, not replayed on the new base."""
    table = str(tmp_path / "t")
    write_hudi_table(table, [
        {"writes": {"fg-a": _src(tmp_path, "a", [(1, "en", 10)])}},
        {"log_writes": {"fg-a": [{"doc_id": 1, "lang": "en", "n": 11}]}},
        # compaction result: the log update baked in
        {"writes": {"fg-a": _src(tmp_path, "a2", [(1, "en", 11)])}},
    ], FIELDS)
    got = [tuple(r) for r in read_hudi(spark, table).collect()]
    assert got == [(1, "en", 11)]
    # base-only again: the listing works
    files, _ = hudi_live_files(table)
    assert len(files) == 1 and "a2" not in files[0]  # renamed by instant


def test_mor_uncommitted_log_block_invisible(spark, tmp_path):
    """An appender's block whose instant never completed must stay
    invisible (snapshot isolation inside a shared log file)."""
    table = str(tmp_path / "t")
    write_hudi_table(table, [
        {"writes": {"fg-a": _src(tmp_path, "a", [(1, "en", 10)])}},
        {"log_writes": {"fg-a": [{"doc_id": 1, "lang": "en", "n": 11}]},
         "log_append_uncommitted": {"fg-a": [{"doc_id": 1, "lang": "en",
                                              "n": 99},
                                             {"doc_id": 7, "lang": "xx",
                                              "n": 70}]}},
    ], FIELDS)
    got = sorted(tuple(r) for r in read_hudi(spark, table).collect())
    assert got == [(1, "en", 11)]


def test_mor_unvendored_block_types_refuse(spark, tmp_path):
    """hfile blocks, kryo-era delete blocks, and command blocks missing
    their rollback target refuse loudly — skipping or guessing any of
    them would resurrect rolled-back or deleted rows (r13: well-formed
    delete + rollback blocks are now vendored, so the refusal boundary
    moved to the genuinely undecodable shapes)."""
    from hive_udf_spark.sources.hudi import decode_hudi_log, encode_hudi_log

    table = str(tmp_path / "t")
    write_hudi_table(table, [
        {"writes": {"fg-a": _src(tmp_path, "a", [(1, "en", 10)])}},
        {"log_writes": {"fg-a": [{"doc_id": 1, "lang": "en", "n": 11}]}},
    ], FIELDS)
    import glob as _glob

    log = _glob.glob(os.path.join(table, ".fg-a_*.log.*"))[0]
    with open(log, "rb") as fh:
        clean = fh.read()
    with open(log, "ab") as fh:
        fh.write(encode_hudi_log([{
            "type": 4,  # hfile data block: not vendored
            "headers": {0: "20240101000001"},
            "content": b"",
        }]))
    with pytest.raises(Exception, match="hfile log block not"):
        read_hudi(spark, table).collect()

    # a kryo-era delete block (content version 2) refuses at decode
    with open(log, "wb") as fh:
        fh.write(clean)
        fh.write(encode_hudi_log([{
            "type": 1,
            "headers": {0: "20240101000001"},
            "content": (2).to_bytes(4, "big") + (0).to_bytes(4, "big"),
        }]))
    with pytest.raises(ValueError, match="content version 2"):
        with open(log, "rb") as fh:
            decode_hudi_log(fh.read())

    # a command block without TARGET_INSTANT_TIME refuses at decode
    with pytest.raises(ValueError, match="TARGET_INSTANT_TIME"):
        decode_hudi_log(encode_hudi_log([{
            "type": 0,
            "headers": {0: "20240101000001"},
            "content": b"",
        }]))
    with open(log, "wb") as fh:
        fh.write(clean)


def test_mor_delete_block_tombstones(spark, tmp_path):
    """r13 (r12 verdict task 1): a delete block removes its keys; a
    LATER upsert re-inserts one — the delete-then-reinsert layering."""
    table = str(tmp_path / "t")
    write_hudi_table(table, [
        {"writes": {"fg-a": _src(
            tmp_path, "a", [(1, "en", 10), (2, "de", 20), (3, "fr", 30)]
        )}},
        {"log_writes": {"fg-a": [{"doc_id": 2, "lang": "de", "n": 21}]}},
        {"log_deletes": {"fg-a": ["1", "2"]}},
        {"log_writes": {"fg-a": [{"doc_id": 2, "lang": "de", "n": 22}]}},
    ], FIELDS, record_key="doc_id")
    got = sorted(tuple(r) for r in read_hudi(spark, table).collect())
    # key 1 deleted (newest entry = tombstone); key 2 deleted then
    # re-inserted with the newest upsert's values; key 3 untouched
    assert got == [(2, "de", 22), (3, "fr", 30)]
    # time travel to before the delete still sees the first upsert
    assert sorted(
        tuple(r)
        for r in read_hudi(spark, table,
                           as_of="20240101000001").collect()
    ) == [(1, "en", 10), (2, "de", 21), (3, "fr", 30)]


def test_mor_delete_block_newest_wins_over_base_and_logs(spark, tmp_path):
    """A tombstone newest in the layering removes the key entirely,
    even when base file AND earlier log upserts carry it."""
    table = str(tmp_path / "t")
    write_hudi_table(table, [
        {"writes": {"fg-a": _src(tmp_path, "a",
                                 [(1, "en", 10), (2, "de", 20)])}},
        {"log_writes": {"fg-a": [{"doc_id": 1, "lang": "en", "n": 11}]}},
        {"log_deletes": {"fg-a": ["1"]}},
    ], FIELDS, record_key="doc_id")
    got = sorted(tuple(r) for r in read_hudi(spark, table).collect())
    assert got == [(2, "de", 20)]


def test_mor_rollback_command_block_erases_target_instant(spark, tmp_path):
    """r13: a ROLLBACK command block erases its log file's earlier
    blocks at the target instant — honored even when that instant is
    on the timeline (the reader must not resurrect rolled-back
    blocks)."""
    table = str(tmp_path / "t")
    write_hudi_table(table, [
        {"writes": {"fg-a": _src(tmp_path, "a", [(1, "en", 10)])}},
        # instant 20240101000001 upserts n=11 ...
        {"log_writes": {"fg-a": [{"doc_id": 1, "lang": "en", "n": 11}]}},
        # ... and the next instant rolls that block back
        {"log_rollback": {"fg-a": "20240101000001"},
         "action": "deltacommit"},
    ], FIELDS, record_key="doc_id")
    got = sorted(tuple(r) for r in read_hudi(spark, table).collect())
    assert got == [(1, "en", 10)]


def test_mor_log_version_orders_numerically(spark, tmp_path):
    """r12 ADVICE: '.log.10' must merge AFTER '.log.2' — raw path
    compare gets it backwards.  Craft versions 2 and 10 of one file
    group in one instant with conflicting upserts."""
    from hive_udf_spark.sources.hudi import encode_hudi_log

    table = str(tmp_path / "t")
    write_hudi_table(table, [
        {"writes": {"fg-a": _src(tmp_path, "a", [(1, "en", 10)])}},
        {"log_writes": {"fg-a": [{"doc_id": 1, "lang": "en", "n": 11}]}},
    ], FIELDS, record_key="doc_id")
    import glob as _glob

    log1 = _glob.glob(os.path.join(table, ".fg-a_*.log.1_*"))[0]
    instant = "20240101000001"
    schema = {
        "type": "record", "name": "fixture_table",
        "fields": [
            {"name": "doc_id", "type": ["null", "long"], "default": None},
            {"name": "lang", "type": ["null", "string"], "default": None},
            {"name": "n", "type": ["null", "long"], "default": None},
        ],
    }
    for ver, n in ((2, 12), (10, 20)):
        path = log1.replace(".log.1_", f".log.{ver}_")
        with open(path, "wb") as fh:
            fh.write(encode_hudi_log([{
                "instant": instant, "schema": schema,
                "records": [{"doc_id": 1, "lang": "en", "n": n}],
            }]))
        # attach the extra log file to the slice via a synthetic
        # deltacommit naming it in writeStats
        tl = os.path.join(table, ".hoodie", f"{instant}.deltacommit")
        meta = json.load(open(tl))
        meta["partitionToWriteStats"][""].append({
            "fileId": "fg-a", "path": os.path.basename(path),
            "prevCommit": instant, "numWrites": 0,
            "fileSizeInBytes": os.path.getsize(path),
        })
        json.dump(meta, open(tl, "w"))
    got = sorted(tuple(r) for r in read_hudi(spark, table).collect())
    assert got == [(1, "en", 20)]  # version 10 wins, not version 2


def test_timeline_mixed_width_instants_order_numerically(spark, tmp_path):
    """r12 ADVICE: a 17-digit ms-precision instant must order after a
    14-digit one with the same second prefix — raw string compare gets
    file-slice resolution and the __ord merge key wrong."""
    table = str(tmp_path / "t")
    write_hudi_table(table, [
        {"writes": {"fg-a": _src(tmp_path, "a", [(1, "en", 10)])}},
        {"writes": {"fg-a": _src(tmp_path, "b", [(1, "en", 11)])}},
    ], FIELDS)
    # rename the SECOND rewrite's instant to 17-digit ms precision,
    # numerically later but lexicographically messier
    hoodie = os.path.join(table, ".hoodie")
    old, new = "20240101000001", "20240101000001500"
    os.rename(os.path.join(hoodie, f"{old}.commit"),
              os.path.join(hoodie, f"{new}.commit"))
    base = [p for p in os.listdir(table) if p.endswith(f"{old}.parquet")][0]
    os.rename(os.path.join(table, base),
              os.path.join(table, base.replace(old, new)))
    meta = json.load(open(os.path.join(hoodie, f"{new}.commit")))
    for stats in meta["partitionToWriteStats"].values():
        for st in stats:
            st["path"] = st["path"].replace(old, new)
    json.dump(meta, open(os.path.join(hoodie, f"{new}.commit"), "w"))
    got = sorted(tuple(r) for r in read_hudi(spark, table).collect())
    assert got == [(1, "en", 11)]  # the ms-precision rewrite wins


def test_upsert_sink_full_lifecycle(spark, tmp_path):
    """r13 hudi_upsert_sink: insert -> upsert -> delete -> reinsert
    through REAL MOR deltacommits (bucket-index routing), merged back
    by the vendored reader; retry no-ops; clustering then compacts the
    logs away."""
    from hive_udf_spark.sources.maintenance import cluster_hudi_table
    from hive_udf_spark.streaming.hudi_upsert_sink import (
        upsert_batch_to_hudi,
    )

    table = str(tmp_path / "t")
    ddl = "doc_id long, lang string, n bigint"
    b0 = spark.createDataFrame(
        [(i, "en", i * 10) for i in range(1, 9)], ddl)
    assert upsert_batch_to_hudi(b0, 0, table, n_buckets=3)
    got = sorted(tuple(r) for r in read_hudi(spark, table).collect())
    assert got == [(i, "en", i * 10) for i in range(1, 9)]

    # batch 1: upsert rows 2 and 5
    b1 = spark.createDataFrame([(2, "de", 999), (5, "fr", 555)], ddl)
    assert upsert_batch_to_hudi(b1, 1, table, n_buckets=3)
    assert not upsert_batch_to_hudi(b1, 1, table, n_buckets=3)  # retry
    got = {r.doc_id: (r.lang, r.n)
           for r in read_hudi(spark, table).collect()}
    assert got[2] == ("de", 999) and got[5] == ("fr", 555)
    assert got[3] == ("en", 30) and len(got) == 8

    # batch 2: delete 2 and 7, upsert 8 — one mixed batch
    b2 = spark.createDataFrame(
        [(2, None, None, True), (7, None, None, True),
         (8, "es", 888, False)],
        ddl + ", _deleted boolean",
    )
    assert upsert_batch_to_hudi(b2, 2, table, n_buckets=3)
    got = {r.doc_id: (r.lang, r.n)
           for r in read_hudi(spark, table).collect()}
    assert 2 not in got and 7 not in got
    assert got[8] == ("es", 888) and len(got) == 6

    # batch 3: reinsert 7 (delete-then-reinsert through the SINK)
    b3 = spark.createDataFrame([(7, "pt", 777)], ddl)
    assert upsert_batch_to_hudi(b3, 3, table, n_buckets=3)
    before = sorted(tuple(r) for r in read_hudi(spark, table).collect())
    assert (7, "pt", 777) in before and len(before) == 7

    # clustering bakes the whole layering into base files
    assert cluster_hudi_table(spark, table, target_files=1)
    assert sorted(tuple(r)
                  for r in read_hudi(spark, table).collect()) == before

    # wrong bucket count refuses rather than mis-routing keys
    with pytest.raises(ValueError, match="buckets"):
        upsert_batch_to_hudi(b3, 9, table, n_buckets=5)


def test_upsert_sink_batch0_crash_retry_converges(spark, tmp_path):
    """r13 review: a batch-0 crash after base files land but before the
    deltacommit publishes must be detected from the TIMELINE — the
    retry re-runs the first-batch path and overwrites its own orphans,
    never mistaking them for a later batch's base files."""
    from hive_udf_spark.streaming.hudi_upsert_sink import (
        upsert_batch_to_hudi,
    )

    table = str(tmp_path / "t")
    b0 = spark.createDataFrame(
        [(i, "en", i) for i in range(1, 5)],
        "doc_id long, lang string, n bigint",
    )
    assert upsert_batch_to_hudi(b0, 0, table, n_buckets=2)
    # simulate the crash: base files on disk, commit file gone
    hoodie = os.path.join(table, ".hoodie")
    os.remove(os.path.join(hoodie, "20400101000000.deltacommit"))
    assert upsert_batch_to_hudi(b0, 0, table, n_buckets=2)  # retry
    got = sorted(tuple(r) for r in read_hudi(spark, table).collect())
    assert got == [(i, "en", i) for i in range(1, 5)]  # no duplicates


def test_sinks_refuse_fresh_checkpoint_against_existing_table(
    spark, tmp_path
):
    """r13 review: both Hudi sinks stamp app/batch identity into the
    commit and refuse a foreign instant instead of silently dropping
    the new batch."""
    from hive_udf_spark.streaming.hudi_sink import commit_batch_to_hudi
    from hive_udf_spark.streaming.hudi_upsert_sink import (
        upsert_batch_to_hudi,
    )

    ddl = "doc_id long, lang string, n bigint"
    b = spark.createDataFrame([(1, "en", 10)], ddl)

    t1 = str(tmp_path / "append")
    assert commit_batch_to_hudi(b, 0, t1, table_name="stream-A")
    assert not commit_batch_to_hudi(b, 0, t1, table_name="stream-A")
    with pytest.raises(ValueError, match="fresh checkpoint"):
        commit_batch_to_hudi(b, 0, t1, table_name="stream-B")

    t2 = str(tmp_path / "upsert")
    assert upsert_batch_to_hudi(b, 0, t2, table_name="stream-A")
    assert not upsert_batch_to_hudi(b, 0, t2, table_name="stream-A")
    with pytest.raises(ValueError, match="fresh checkpoint"):
        upsert_batch_to_hudi(b, 0, t2, table_name="stream-B")


def test_cleaner_keeps_unlisted_logs_of_live_groups(spark, tmp_path):
    """r13 review: a log file of a LIVE file group that no completed
    writeStats lists yet may belong to a mid-commit appender — the
    cleaner must keep it (its filename carries the BASE instant, so no
    pending-marker check can clear it)."""
    from hive_udf_spark.sources.maintenance import clean_hudi_table

    table = str(tmp_path / "t")
    write_hudi_table(table, [
        {"writes": {"fg-a": _src(tmp_path, "a", [(1, "en", 10)])}},
        {"log_writes": {"fg-a": [{"doc_id": 1, "lang": "en", "n": 11}]}},
    ], FIELDS, record_key="doc_id")
    # a concurrent appender's not-yet-committed log file for the live group
    import glob as _glob

    listed = _glob.glob(os.path.join(table, ".fg-a_*.log.1_*"))[0]
    pending_log = listed.replace(".log.1_", ".log.2_")
    import shutil

    shutil.copy(listed, pending_log)
    deleted = clean_hudi_table(table)
    assert deleted == []  # live group: both its logs survive
    assert os.path.exists(pending_log)


def test_upsert_sink_corrupt_timeline_propagates(spark, tmp_path):
    """r13 review: only the EMPTY-timeline error means 'first batch' —
    a corrupt commit file must propagate, never trigger a silent
    re-bootstrap over an existing table."""
    from hive_udf_spark.streaming.hudi_upsert_sink import (
        upsert_batch_to_hudi,
    )

    table = str(tmp_path / "t")
    b = spark.createDataFrame([(1, "en", 10)],
                              "doc_id long, lang string, n bigint")
    assert upsert_batch_to_hudi(b, 0, table)
    # corrupt the completed commit's metadata
    hoodie = os.path.join(table, ".hoodie")
    with open(os.path.join(hoodie, "20400101000000.deltacommit"),
              "w") as fh:
        fh.write("{not json")
    with pytest.raises(ValueError, match="malformed"):
        upsert_batch_to_hudi(b, 1, table)


def test_upsert_sink_deletes_against_empty_table_refuse(spark, tmp_path):
    from hive_udf_spark.streaming.hudi_upsert_sink import (
        upsert_batch_to_hudi,
    )

    table = str(tmp_path / "t")
    b = spark.createDataFrame(
        [(1, "en", 10, True)],
        "doc_id long, lang string, n bigint, _deleted boolean",
    )
    with pytest.raises(ValueError, match="empty table"):
        upsert_batch_to_hudi(b, 0, table)


def test_sink_crash_between_data_and_commit_recovers(
    spark, tmp_path, monkeypatch
):
    """r13 (r12 verdict task 8): kill the sink between the base-file
    move and the timeline publish — orphan base files exist but stay
    invisible (no completed instant), and the retry converges to
    exactly-once contents."""
    from hive_udf_spark.streaming.hudi_sink import commit_batch_to_hudi

    table = str(tmp_path / "t")
    b0 = spark.createDataFrame([(1, "en", 10), (2, "de", 20)],
                               "doc_id long, lang string, n bigint")
    b1 = spark.createDataFrame([(3, "fr", 30)],
                               "doc_id long, lang string, n bigint")
    assert commit_batch_to_hudi(b0, 0, table)

    # the publish is now put-if-absent os.link (sources/txn.py, r14)
    import hive_udf_spark.sources.txn as txn

    real_link = os.link

    def crash_link(src, dst, *a, **kw):
        raise OSError("injected crash before the atomic publish")

    monkeypatch.setattr(txn.os, "link", crash_link)
    with pytest.raises(OSError, match="injected crash"):
        commit_batch_to_hudi(b1, 1, table)
    monkeypatch.setattr(txn.os, "link", real_link)

    # orphan base files on disk, but readers see only batch 0 (their
    # instant never completed)
    import glob as _glob

    orphans = _glob.glob(os.path.join(table, "ing-0000000001-*"))
    assert orphans
    assert read_hudi(spark, table).count() == 2
    # the retry converges: deterministic names overwrite the orphans
    assert commit_batch_to_hudi(b1, 1, table)
    got = sorted(tuple(r) for r in read_hudi(spark, table).collect())
    assert got == [(1, "en", 10), (2, "de", 20), (3, "fr", 30)]


def test_streaming_sink_commits_and_idempotence(spark, tmp_path):
    """r12 hudi_sink: batches become completed commits; a retried batch
    no-ops; an uncommitted (crashed) batch's base files stay invisible;
    time travel sees each prefix."""
    from hive_udf_spark.streaming.hudi_sink import commit_batch_to_hudi

    table = str(tmp_path / "t")
    b0 = spark.createDataFrame([(1, "en", 10), (2, "de", 20)],
                               "doc_id long, lang string, n bigint")
    b1 = spark.createDataFrame([(3, "fr", 30)],
                               "doc_id long, lang string, n bigint")
    assert commit_batch_to_hudi(b0, 0, table)
    assert commit_batch_to_hudi(b1, 1, table)
    assert not commit_batch_to_hudi(b1, 1, table)  # retry no-op
    got = sorted(tuple(r) for r in read_hudi(spark, table).collect())
    assert got == [(1, "en", 10), (2, "de", 20), (3, "fr", 30)]
    # time travel to the first commit
    assert read_hudi(spark, table, as_of="20300101000000").count() == 2
    # a crash AFTER the data move but BEFORE the commit publish: drop a
    # base file shaped like batch 2's output with no commit file
    import shutil

    import glob as _glob

    src = sorted(_glob.glob(
        os.path.join(table, "ing-0000000000-*_20300101000000.parquet")
    ))[0]
    shutil.copy(src, os.path.join(
        table, "ing-0000000002-00000_0-0-0_20300101000002.parquet"))
    assert read_hudi(spark, table).count() == 3  # still invisible


# ---------------------------------------------------------------------------
# r14 verdict task 3: composite record keys
# ---------------------------------------------------------------------------


def test_mor_composite_key_merge_and_deletes(spark, tmp_path):
    """A 2-field record key merges by BOTH fields: upserting
    (1, 'en') leaves (1, 'de') alone, a composite delete tombstones
    exactly its key, and a decoy delete naming a lang no row carries
    removes nothing — a doc_id-only merge would drop it."""
    table = str(tmp_path / "t")
    base = _src(tmp_path, "b", [(1, "en", 10), (1, "de", 20),
                                (2, "en", 30)], meta=False)
    write_hudi_table(table, [
        {"writes": {"fg-0": base}},
        {"log_writes": {"fg-0": [
            {"doc_id": 1, "lang": "en", "n": 11}]}},
        {"log_deletes": {"fg-0": [
            "doc_id:1,lang:de",      # real composite tombstone
            "doc_id:2,lang:zz",      # decoy: no such (2, zz) row
        ]}},
        # delete-then-reinsert on the composite key resurfaces the row
        {"log_writes": {"fg-0": [
            {"doc_id": 1, "lang": "de", "n": 99}]}},
    ], FIELDS, record_key="doc_id,lang")
    got = sorted(tuple(r) for r in read_hudi(spark, table).collect())
    assert got == [(1, "de", 99), (1, "en", 11), (2, "en", 30)]
    # as-of BEFORE the reinsert: the tombstone holds, the decoy no-ops
    instants = [t for t, _, _ in hudi_timeline(table)]
    got = sorted(tuple(r) for r in
                 read_hudi(spark, table, as_of=instants[-2]).collect())
    assert got == [(1, "en", 11), (2, "en", 30)]


def test_mor_composite_delete_key_must_parse(spark, tmp_path):
    """A composite-key table whose delete block carries a key string
    NOT in the ComplexKeyGenerator encoding refuses loudly instead of
    guessing which field the value belongs to."""
    table = str(tmp_path / "t")
    base = _src(tmp_path, "b", [(1, "en", 10)], meta=False)
    write_hudi_table(table, [
        {"writes": {"fg-0": base}},
        {"log_deletes": {"fg-0": ["1"]}},  # bare value, 2-field key
    ], FIELDS, record_key="doc_id,lang")
    with pytest.raises(Exception, match="composite delete key"):
        read_hudi(spark, table).collect()


def test_upsert_sink_composite_key_lifecycle(spark, tmp_path):
    """The bucket-index upsert sink accepts a composite record_key:
    upserts and deletes for one (doc_id, lang) key route to one
    bucket, and upsert -> delete -> reinsert layers correctly."""
    from hive_udf_spark.streaming.hudi_upsert_sink import (
        upsert_batch_to_hudi,
    )

    table = str(tmp_path / "t")
    b0 = spark.createDataFrame(
        [(1, "en", 10), (1, "de", 20), (2, "en", 30)],
        "doc_id long, lang string, n long",
    )
    assert upsert_batch_to_hudi(b0, 0, table, record_key="doc_id,lang",
                                n_buckets=2)
    b1 = spark.createDataFrame(
        [(1, "en", 11, False), (1, "de", 0, True)],
        "doc_id long, lang string, n long, _deleted boolean",
    )
    assert upsert_batch_to_hudi(b1, 1, table, record_key="doc_id,lang",
                                n_buckets=2)
    got = sorted(tuple(r) for r in read_hudi(spark, table).collect())
    assert got == [(1, "en", 11), (2, "en", 30)]
    b2 = spark.createDataFrame(
        [(1, "de", 99, False)],
        "doc_id long, lang string, n long, _deleted boolean",
    )
    assert upsert_batch_to_hudi(b2, 2, table, record_key="doc_id,lang",
                                n_buckets=2)
    got = sorted(tuple(r) for r in read_hudi(spark, table).collect())
    assert got == [(1, "de", 99), (1, "en", 11), (2, "en", 30)]


def test_upsert_sink_composite_key_missing_column_refuses(spark, tmp_path):
    from hive_udf_spark.streaming.hudi_upsert_sink import (
        upsert_batch_to_hudi,
    )

    df = spark.createDataFrame([(1, 10)], "doc_id long, n long")
    with pytest.raises(ValueError, match="no 'lang' column"):
        upsert_batch_to_hudi(df, 0, str(tmp_path / "t"),
                             record_key="doc_id,lang")
