"""Web/URL pipeline queries: canonicalization, URL-identity dedup,
per-domain quotas, host stats.

The corpus tables carry no URL column, so each query derives a
deterministic, deliberately messy URL per document from ``doc_id`` via
``functions/url.synth_url_sql`` — the SAME generator expression runs in
Spark (``F.expr``) and in the DuckDB oracle, and the SAME step list
(``functions/url._steps``) canonicalizes it in both engines (the
``html.py`` single-source-of-truth discipline).  What the oracle checks
is therefore the full production chain, not a reimplementation.

Scale: canonicalization is scalar string codegen (no shuffle, no
Python); dedup/quota shuffle only on the short canonical-key strings —
at 100 TB these are plain hash-aggregations/window-topk over bounded
keys, with WindowGroupLimit keeping the quota query's per-group state at
K rows before the exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hive_udf_spark.functions.url import (
    synth_url_sql,
    url_parts_cols,
    url_parts_sql,
)
from hive_udf_spark.plans.registry import register
from hive_udf_spark.sources import load_table


def _docs_with_urls(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return url_parts_cols(
        docs.withColumn("url", F.expr(synth_url_sql("spark")))
    )


_ORACLE_PARTS = url_parts_sql(
    f"SELECT doc_id, n_chars, {synth_url_sql('duckdb')} AS url FROM documents"
)


@register(
    "web_url_canonicalize",
    oracle=f"""
    SELECT doc_id, url, canonical_url, url_key, registrable_domain,
           u_host AS host
    FROM ({_ORACLE_PARTS})
    """,
)
def web_url_canonicalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFC-3986-style URL canonicalization as pure Catalyst string
    expressions: scheme/host case, userinfo, default ports, fragments,
    dot-segments, duplicate slashes, %-escape normalization, tracking-
    param drop + query-param sort — per-row codegen, no shuffle."""
    d = _docs_with_urls(spark, sf_dir)
    return d.select(
        "doc_id",
        "url",
        "canonical_url",
        "url_key",
        "registrable_domain",
        F.col("u_host").alias("host"),
    )


@register(
    "web_url_dedup",
    oracle=f"""
    SELECT url_key,
           CAST(min(doc_id) AS BIGINT) AS canonical_doc,
           CAST(count(*) AS BIGINT) AS n_dups,
           CAST(count(DISTINCT canonical_url) AS BIGINT) AS n_url_variants
    FROM ({_ORACLE_PARTS})
    WHERE url_key IS NOT NULL
    GROUP BY url_key
    """,
)
def web_url_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL-identity dedup: group on the canonical url_key (www + trailing
    slash folded), keep the earliest doc as representative.  The shuffle
    key is the bounded canonical string — the cheapest dedup axis a crawl
    has, run before any content hashing."""
    d = _docs_with_urls(spark, sf_dir).filter(F.col("url_key").isNotNull())
    return d.groupBy("url_key").agg(
        F.min("doc_id").cast("long").alias("canonical_doc"),
        F.count("*").cast("long").alias("n_dups"),
        F.countDistinct("canonical_url").cast("long").alias("n_url_variants"),
    )


@register(
    "web_domain_quota_cap",
    oracle=f"""
    WITH ranked AS (
      SELECT doc_id, registrable_domain, n_chars,
             row_number() OVER (
               PARTITION BY registrable_domain
               ORDER BY n_chars DESC, doc_id
             ) AS rk
      FROM ({_ORACLE_PARTS})
    )
    SELECT doc_id, registrable_domain, CAST(n_chars AS BIGINT) AS n_chars,
           CAST(rk AS BIGINT) AS rk
    FROM ranked WHERE rk <= 25
    """,
)
def web_domain_quota_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-registrable-domain quota: keep the 25 largest docs per eTLD+1
    (the anti-SEO-farm cap every crawl corpus applies).  row_number ≤ K
    compiles to WindowGroupLimit — per-group state is K rows map-side
    BEFORE the exchange, so one hot domain cannot skew the shuffle."""
    d = _docs_with_urls(spark, sf_dir)
    w = (
        Window.partitionBy("registrable_domain")
        .orderBy(F.col("n_chars").desc(), F.col("doc_id"))
    )
    return (
        d.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 25)
        .select(
            "doc_id",
            "registrable_domain",
            F.col("n_chars").cast("long").alias("n_chars"),
            F.col("rk").cast("long").alias("rk"),
        )
    )


@register(
    "web_host_stats",
    oracle=f"""
    SELECT u_host AS host, registrable_domain,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(DISTINCT url_key) AS BIGINT) AS n_unique_urls,
           CAST(sum(n_chars) AS BIGINT) AS total_chars
    FROM ({_ORACLE_PARTS})
    WHERE canonical_url IS NOT NULL
    GROUP BY u_host, registrable_domain
    """,
)
def web_host_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-host crawl profile (doc count, unique canonical URLs, bytes):
    the table a crawl scheduler and a quota policy both read.  Plain
    partial-aggregated groupBy on the host string."""
    d = _docs_with_urls(spark, sf_dir).filter(F.col("canonical_url").isNotNull())
    return d.groupBy(F.col("u_host").alias("host"), "registrable_domain").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.countDistinct("url_key").cast("long").alias("n_unique_urls"),
        F.sum("n_chars").cast("long").alias("total_chars"),
    )
