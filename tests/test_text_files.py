"""JSONL/CSV connector round-trips and corrupt-record quarantine."""

from __future__ import annotations

from pyspark.sql import functions as F

from hive_udf_spark.sources.text_files import DOCUMENTS_SCHEMA, read_csv, read_jsonl


def test_jsonl_roundtrip_and_quarantine(spark, tmp_path):
    p = tmp_path / "docs.jsonl"
    p.write_text(
        '{"doc_id": 1, "text": "hello world", "lang": "en", "source": "web", "n_chars": 11}\n'
        '{"doc_id": 2, "text": "bonjour", "lang": "fr", "source": "web", "n_chars": 7}\n'
        "this line is not json at all\n"
    )
    # Spark disallows plans that reference ONLY _corrupt_record over a raw
    # file scan; cache the parsed frame first (the documented pattern)
    df = read_jsonl(spark, str(p), DOCUMENTS_SCHEMA).cache()
    clean = df.filter(F.col("_corrupt_record").isNull())
    bad = df.filter(F.col("_corrupt_record").isNotNull())
    assert clean.count() == 2 and bad.count() == 1
    assert {r.doc_id for r in clean.collect()} == {1, 2}
    assert "not json" in bad.collect()[0]["_corrupt_record"]


def test_csv_roundtrip(spark, tmp_path):
    p = tmp_path / "docs.csv"
    p.write_text(
        "doc_id,text,lang,source,n_chars\n"
        "1,hello world,en,web,11\n"
        "2,bonjour,fr,web,7\n"
    )
    df = read_csv(spark, str(p), DOCUMENTS_SCHEMA)
    rows = df.filter(F.col("_corrupt_record").isNull()).collect()
    assert len(rows) == 2
    assert {(r.doc_id, r.lang) for r in rows} == {(1, "en"), (2, "fr")}


def test_jsonl_feeds_dedup_pipeline(spark, tmp_path):
    """Connector output plugs straight into the dedup operators."""
    from hive_udf_spark.operators.dedup import exact_dedup

    p = tmp_path / "dup.jsonl"
    p.write_text(
        '{"doc_id": 1, "text": "same text", "lang": "en", "source": "a", "n_chars": 9}\n'
        '{"doc_id": 2, "text": "same text", "lang": "en", "source": "b", "n_chars": 9}\n'
        '{"doc_id": 3, "text": "other", "lang": "en", "source": "c", "n_chars": 5}\n'
    )
    df = read_jsonl(spark, str(p), DOCUMENTS_SCHEMA, quarantine_corrupt=False)
    kept = exact_dedup(df, "text", "doc_id")
    assert sorted(r.doc_id for r in kept.collect()) == [1, 3]


def test_orc_roundtrip_pushdown_and_partitioning(spark, tmp_path, sf_dir):
    from pyspark.sql import functions as F

    from hive_udf_spark.sources import load_table, read_orc, write_orc

    docs = load_table(spark, sf_dir, "documents")
    path = str(tmp_path / "docs_orc")
    write_orc(docs, path, partition_by="lang")
    back = read_orc(spark, path)
    # round-trip (lang becomes a partition column; values preserved)
    a = sorted((r.doc_id, r.text, r.lang) for r in back.collect())
    b = sorted((r.doc_id, r.text, r.lang) for r in docs.collect())
    assert a == b
    # partition pruning: a lang filter must prune partitions at scan
    plan = back.filter(F.col("lang") == "en")._sc._jvm.PythonSQLUtils.explainString(
        back.filter(F.col("lang") == "en")._jdf.queryExecution(), "formatted"
    )
    assert "PartitionFilters: [isnotnull(lang" in plan
    # predicate pushdown on a data column
    plan2 = back.filter(F.col("doc_id") > 100)._sc._jvm.PythonSQLUtils.explainString(
        back.filter(F.col("doc_id") > 100)._jdf.queryExecution(), "formatted"
    )
    assert "PushedFilters: [IsNotNull(doc_id), GreaterThan(doc_id" in plan2


def test_xml_roundtrip_explicit_schema(spark, tmp_path, sf_dir):
    """r9: the XML connector round-trips markup-laden text byte-exact
    (writer escapes, reader unescapes, surrounding spaces preserved)."""
    from hive_udf_spark.sources.text_files import read_xml, write_xml

    df = spark.createDataFrame(
        [(1, "a < b & c > d", "en"), (2, "  padded  ", "fr"),
         (3, 'quotes "and" <tags/>', "de")],
        "doc_id long, text string, lang string",
    )
    path = str(tmp_path / "docs_xml")
    write_xml(df, path)
    back = read_xml(spark, path, "doc_id long, text string, lang string")
    got = sorted((r.doc_id, r.text, r.lang) for r in back.collect())
    want = sorted((r.doc_id, r.text, r.lang) for r in df.collect())
    assert got == want
