"""Text-format connectors: JSONL and CSV ingestion with explicit schemas.

Raw training-data drops arrive as JSONL/CSV long before they are parquet.
Rules that matter at 100 TB:

- **Always pass an explicit schema.** Schema inference reads the data
  TWICE (a full inference pass before the real scan) and can silently
  widen types between drops; an explicit schema makes ingestion one pass
  and type-stable.
- **Capture corrupt records, don't crash.** PERMISSIVE mode with a
  ``_corrupt_record`` column quarantines bad lines for later inspection —
  a malformed row on TB 73 must not kill a 12-hour job.
- **JSONL is splittable; gzip is not.** A .json.gz file is one task no
  matter its size; prefer uncompressed/zstd-framed drops or many files.
- Spark rejects plans that reference ONLY ``_corrupt_record`` over a raw
  file scan — ``.cache()`` the parsed frame before auditing corrupt rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

DOCUMENTS_SCHEMA = (
    "doc_id bigint, text string, lang string, source string, n_chars bigint"
)
EVENTS_SCHEMA = (
    "event_id bigint, ts timestamp, user_id bigint, event_type string, "
    "value double, props string"
)


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: str,
    quarantine_corrupt: bool = True,
) -> DataFrame:
    """Read line-delimited JSON with a required explicit schema.

    With quarantine_corrupt, malformed lines land in ``_corrupt_record``
    (select it + filter NOT NULL to audit); clean rows parse normally.
    """
    full_schema = schema + (", _corrupt_record string" if quarantine_corrupt else "")
    reader = (
        spark.read.schema(full_schema)
        .option("mode", "PERMISSIVE" if quarantine_corrupt else "FAILFAST")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
    )
    return reader.json(path)


def read_csv(
    spark: SparkSession,
    path: str,
    schema: str,
    header: bool = True,
    delimiter: str = ",",
    quarantine_corrupt: bool = True,
) -> DataFrame:
    """Read CSV with a required explicit schema (same corruption policy
    as read_jsonl)."""
    full_schema = schema + (", _corrupt_record string" if quarantine_corrupt else "")
    return (
        spark.read.schema(full_schema)
        .option("header", str(header).lower())
        .option("sep", delimiter)
        .option("mode", "PERMISSIVE" if quarantine_corrupt else "FAILFAST")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .csv(path)
    )


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """Read ORC (Spark-native vectorized reader; predicate pushdown and
    column pruning work as with parquet — asserted in tests)."""
    return spark.read.orc(path)


def write_orc(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | str | None = None,
) -> None:
    """Write ORC, optionally hive-partitioned. ORC matters for
    interoperability with Hive-era warehouses — the reference's host
    (Hive 0.9, pom.xml:16) predates parquet ubiquity; an engine claiming
    its workloads meets ORC tables in the wild."""
    w = df.write.mode(mode)
    if partition_by is not None:
        cols = [partition_by] if isinstance(partition_by, str) else list(partition_by)
        w = w.partitionBy(*cols)
    w.orc(path)


def read_xml(
    spark: SparkSession,
    path: str,
    schema: str,
    row_tag: str = "doc",
    keep_spaces: bool = True,
) -> DataFrame:
    """Read XML via Spark 4's built-in XML source with an EXPLICIT
    schema (one pass, type-stable — the JSONL rule applies doubly to
    XML, whose inference pass is costlier).  ``keep_spaces`` disables
    surrounding-whitespace trimming so text round-trips byte-exact."""
    return (
        spark.read.format("xml")
        .option("rowTag", row_tag)
        .option("ignoreSurroundingSpaces", "false" if keep_spaces else "true")
        .schema(schema)
        .load(path)
    )


def write_xml(
    df: DataFrame, path: str, row_tag: str = "doc", mode: str = "overwrite"
) -> None:
    """Write XML (one row element per record; markup entity-escaped by
    the writer).  XML matters for feed interchange — sitemaps, wiki
    dumps, API exports — not as a warehouse format."""
    df.write.mode(mode).format("xml").option("rowTag", row_tag).save(path)
