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


# --- compute-once shared relations (r8 verdict item 5) -----------------
#
# The canonicalization chain is pure scalar codegen, but it is a BIG
# expression tree: every consumer stage used to re-plan it (~seconds of
# driver time) and ship it in its task binaries (3.7-7.6 MiB per stage,
# SCALE_NOTES r8 batch 3) — six registry queries each paid that
# constant.  Since the chain's output is tiny relative to the work of
# re-deriving it, the family now materializes each shared relation ONCE
# per (session, sf_dir) to local parquet and every consumer scans that:
# downstream plans carry a columnar scan instead of the whole tree, and
# the constant is paid once per session instead of once per stage.
# This is exactly the shape the pipeline would have at 100 TB — a
# `canonical_urls` table written once and read by every consumer.
_MATERIALIZED: dict[tuple[str, str, str], str] = {}


def _scratch_root() -> str:
    """Root for materialized shared relations.  Configurable via
    SPARK_GRAFT_SCRATCH so a real deployment points it at a cluster-
    visible warehouse/scratch location (a driver-local tempdir only
    works in local mode); defaults to the system tempdir for tests."""
    import os
    import tempfile

    return os.environ.get("SPARK_GRAFT_SCRATCH", tempfile.gettempdir())


def _materialize(spark: SparkSession, sf_dir: str, name: str, build) -> DataFrame:
    key = (spark.sparkContext.applicationId, sf_dir, name)
    path = _MATERIALIZED.get(key)
    if path is None:
        import atexit
        import os
        import shutil
        import uuid

        path = os.path.join(
            _scratch_root(), f"spark_graft_{name}_{uuid.uuid4().hex}"
        )
        build().write.mode("overwrite").parquet(path)
        _MATERIALIZED[key] = path
        # session-lifetime cache, process-lifetime cleanup: without this
        # every session leaked its materialized parquet into the tempdir
        atexit.register(shutil.rmtree, path, ignore_errors=True)
    return spark.read.parquet(path)


def _docs_with_urls(spark: SparkSession, sf_dir: str) -> DataFrame:
    def build() -> DataFrame:
        docs = load_table(spark, sf_dir, "documents")
        return url_parts_cols(
            docs.withColumn("url", F.expr(synth_url_sql("spark")))
        )

    return _materialize(spark, sf_dir, "canonical_urls", build)


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


_ROBOTS_ORACLE = f"""
    WITH u AS (
      SELECT doc_id, registrable_domain AS host,
             regexp_extract(canonical_url, '^[a-z]+://[^/]*(/[^?]*)', 1) AS path
      FROM ({_ORACLE_PARTS}) WHERE canonical_url IS NOT NULL
    ),
    doms AS (SELECT DISTINCT host FROM u),
    rules AS (
      SELECT host, '/P' || CAST(length(host) % 13 AS VARCHAR) AS rule_path,
             false AS allow,
             '^/P' || CAST(length(host) % 13 AS VARCHAR) AS rule_regex,
             length('/P' || CAST(length(host) % 13 AS VARCHAR)) AS rule_len
      FROM doms
      UNION ALL
      SELECT host,
             '/P' || CAST(length(host) % 13 AS VARCHAR) || '/~' || substr(md5(host), 1, 1),
             true,
             '^/P' || CAST(length(host) % 13 AS VARCHAR) || '/~' || substr(md5(host), 1, 1),
             length('/P' || CAST(length(host) % 13 AS VARCHAR) || '/~' || substr(md5(host), 1, 1))
      FROM doms
      UNION ALL
      SELECT host, '*' || substr(md5(host), 2, 1) || '$',
             false,
             '^.*' || substr(md5(host), 2, 1) || '$',
             length('*' || substr(md5(host), 2, 1) || '$')
      FROM doms
    ),
    hits AS (
      SELECT u.doc_id, u.host, u.path, r.rule_path, r.allow, r.rule_len,
             row_number() OVER (
               PARTITION BY u.doc_id
               ORDER BY r.rule_len DESC, r.allow DESC, r.rule_path ASC
             ) AS rk
      FROM u JOIN rules r
        ON u.host = r.host AND regexp_matches(u.path, r.rule_regex)
    )
    SELECT u.doc_id, u.host AS registrable_domain, u.path,
           coalesce(h.allow, true) AS allowed,
           h.rule_path AS matched_rule
    FROM u LEFT JOIN (SELECT * FROM hits WHERE rk = 1) h USING (doc_id)
    """


@register("web_robots_filter", oracle=_ROBOTS_ORACLE)
def web_robots_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """robots.txt crawl-allow verdict (r8, operators/robots.py): three
    deterministic per-domain rules — a '/Pk' Disallow, a longer
    '/Pk/~c' Allow override, and a wildcard+anchor '*x$' Disallow —
    applied to every canonical URL with RFC-9309 longest-match
    semantics (ties toward Allow, no match ⇒ allowed).  The rules
    relation is broadcast; per-URL work is one regex test per rule of
    the matching HOST plus a top-1 window on the URL key.  The oracle
    re-derives the identical rules and verdict in SQL.  (The robots.txt
    TEXT parser — UA groups, comments, agent matching — is
    pytest-covered; rules here are generated as a relation so the
    verdict join itself is what the oracle checks.)"""
    from hive_udf_spark.operators.robots import robots_allowed

    d = _docs_with_urls(spark, sf_dir).filter(F.col("canonical_url").isNotNull())
    urls = d.select(
        "doc_id",
        F.col("registrable_domain").alias("host"),
        F.regexp_extract("canonical_url", r"^[a-z]+://[^/]*(/[^?]*)", 1).alias("path"),
    )
    # Materialize the tiny domain list: the collapsed canonicalization
    # projection is a multi-MB expression tree, and deriving the rules
    # relation from it lazily would re-embed that tree once per rule
    # branch (a ~47 MiB task binary measured at sf0.01).  The distinct
    # host relation is domain-count-sized — bounded state by the same
    # argument as the quota queries.
    doms = urls.select("host").distinct().localCheckpoint()
    j = F.concat(F.lit("/P"), (F.length("host") % 13).cast("string"))
    c1 = F.substring(F.md5(F.col("host").cast("binary")), 1, 1)
    c2 = F.substring(F.md5(F.col("host").cast("binary")), 2, 1)
    rules = (
        doms.select(
            "host", j.alias("rule_path"), F.lit(False).alias("allow")
        )
        .unionByName(
            doms.select(
                "host",
                F.concat(j, F.lit("/~"), c1).alias("rule_path"),
                F.lit(True).alias("allow"),
            )
        )
        .unionByName(
            doms.select(
                "host",
                F.concat(F.lit("*"), c2, F.lit("$")).alias("rule_path"),
                F.lit(False).alias("allow"),
            )
        )
        .withColumn("rule_len", F.length("rule_path"))
    )
    out = robots_allowed(urls, rules, id_col="doc_id")
    return out.select(
        "doc_id",
        F.col("host").alias("registrable_domain"),
        "path",
        "allowed",
        "matched_rule",
    )


def _sitemap_xml_sql(d: str) -> str:
    """Deterministic per-doc sitemap XML (engine twin): 1-3 <url>
    entries; even entry indexes carry an XML-escaped query string; some
    docs add lastmod/priority.  ONE generator string for both
    dialects."""
    s = "STRING" if d == "spark" else "VARCHAR"
    n = "(doc_id % 3 + 1)"
    parts = []
    for k in range(3):
        loc = (
            f"'https://s' || CAST(doc_id % 7 AS {s}) || '.com/p' || CAST({k} AS {s})"
            + (" || '?a=1&amp;b=2'" if k % 2 == 0 else "")
        )
        lastmod = (
            "CASE WHEN doc_id % 2 = 0 THEN '<lastmod>2024-01-0' || "
            f"CAST(doc_id % 9 + 1 AS {s}) || '</lastmod>' ELSE '' END"
        )
        prio = (
            "CASE WHEN doc_id % 5 = 0 THEN '<priority>0.' || "
            f"CAST(doc_id % 9 AS {s}) || '</priority>' ELSE '' END"
        )
        parts.append(
            f"CASE WHEN {k} < {n} THEN '<url><loc>' || {loc} || '</loc>' || "
            f"{lastmod} || {prio} || '</url>' ELSE '' END"
        )
    return "'<urlset>' || " + " || ".join(parts) + " || '</urlset>'"


_SM_ENTRY = r"(?s)<(?:url|sitemap)\b[^>]*>(.*?)</(?:url|sitemap)>"


# Oracle twin of operators/sitemap.py extraction over the generated XML:
# (doc_id, entry_idx, loc, lastmod, changefreq, priority) rows.
_SITEMAP_ORACLE_ENTRIES = f"""
    WITH __sm_t AS (
      SELECT doc_id, {_sitemap_xml_sql("duckdb")} AS xml FROM documents
    ),
    __sm_l AS (
      SELECT doc_id, regexp_extract_all(xml, '{_SM_ENTRY}', 1) AS es FROM __sm_t
    ),
    __sm_e AS (
      SELECT doc_id, CAST(i AS INT) AS entry_idx, es[i + 1] AS entry_xml
      FROM __sm_l, LATERAL (SELECT unnest(range(len(es))) AS i)
    )
    SELECT doc_id, entry_idx,
           replace(replace(replace(replace(replace(
             trim(regexp_extract(entry_xml, '(?s)<loc\\b[^>]*>\\s*(.*?)\\s*</loc>', 1)),
             '&lt;', '<'), '&gt;', '>'), '&quot;', '"'), '&apos;', ''''), '&amp;', '&')
             AS loc,
           nullif(regexp_extract(entry_xml, '(?s)<lastmod\\b[^>]*>\\s*(.*?)\\s*</lastmod>', 1), '') AS lastmod,
           nullif(regexp_extract(entry_xml, '(?s)<changefreq\\b[^>]*>\\s*(.*?)\\s*</changefreq>', 1), '') AS changefreq,
           CAST(nullif(regexp_extract(entry_xml, '(?s)<priority\\b[^>]*>\\s*(.*?)\\s*</priority>', 1), '') AS DOUBLE) AS priority
    FROM __sm_e
    WHERE regexp_extract(entry_xml, '(?s)<loc\\b[^>]*>\\s*(.*?)\\s*</loc>', 1) <> ''
    """


@register(
    "web_sitemap_extract",
    oracle=f"""
    SELECT doc_id, entry_idx, loc, lastmod, changefreq, priority,
           false AS is_index
    FROM ({_SITEMAP_ORACLE_ENTRIES})
    """,
)
def web_sitemap_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sitemap URL extraction (r8, operators/sitemap.py): per-doc
    generated <urlset> XML explodes into one row per entry with
    entity-decoded loc + lastmod/changefreq/priority — pure
    regexp_extract_all + posexplode Catalyst expressions, the streaming
    pull a crawler's URL-discovery tier runs.  The oracle re-runs the
    identical extraction in SQL on the identical generated XML."""
    from hive_udf_spark.operators.sitemap import sitemap_entries

    docs = load_table(spark, sf_dir, "documents")
    d = docs.select("doc_id", F.expr(_sitemap_xml_sql("spark")).alias("sitemap_xml"))
    return sitemap_entries(d)


_FRONTIER_ORACLE = f"""
    WITH sm AS (
      SELECT doc_id, entry_idx, loc AS url
      FROM ({_SITEMAP_ORACLE_ENTRIES})
    ),
    p AS (
      SELECT * FROM ({url_parts_sql("SELECT * FROM sm")})
      WHERE canonical_url IS NOT NULL
    ),
    u AS (
      SELECT doc_id * 4 + entry_idx AS uid, doc_id, entry_idx,
             registrable_domain AS host, url_key,
             regexp_extract(canonical_url, '^[a-z]+://[^/]*(/.*)$', 1) AS pathq
      FROM p
    ),
    doms AS (SELECT DISTINCT host FROM u),
    jsel AS (
      SELECT host,
             CASE WHEN substr(md5(host), 1, 1) IN ('0','1','2','3','4','5') THEN 0
                  WHEN substr(md5(host), 1, 1) IN ('6','7','8','9','a') THEN 1
                  ELSE 2 END AS j
      FROM doms
    ),
    rules AS (
      SELECT host, '/p' || CAST(j AS VARCHAR) AS rule_path, false AS allow,
             '^/p' || CAST(j AS VARCHAR) AS rule_regex,
             length('/p' || CAST(j AS VARCHAR)) AS rule_len
      FROM jsel
      UNION ALL
      SELECT host, '/p' || CAST(j AS VARCHAR) || '?a=1', true,
             '^/p' || CAST(j AS VARCHAR) || '\\?a=1',
             length('/p' || CAST(j AS VARCHAR) || '?a=1')
      FROM jsel
      UNION ALL
      SELECT host, '*2$', false, '^.*2$', 4 FROM jsel
    ),
    hits AS (
      SELECT u.uid, r.allow,
             row_number() OVER (
               PARTITION BY u.uid
               ORDER BY r.rule_len DESC, r.allow DESC, r.rule_path ASC
             ) AS rk
      FROM u JOIN rules r
        ON u.host = r.host AND regexp_matches(u.pathq, r.rule_regex)
    ),
    verdict AS (
      SELECT u.*, coalesce(h.allow, true) AS allowed
      FROM u LEFT JOIN (SELECT * FROM hits WHERE rk = 1) h USING (uid)
    )
    SELECT url_key,
           CAST(count(*) AS BIGINT) AS n_seen,
           CAST(min(uid) // 4 AS BIGINT) AS first_doc,
           CAST(min(uid) % 4 AS BIGINT) AS first_entry
    FROM verdict WHERE allowed
    GROUP BY url_key
    """


@register("pipeline_crawl_frontier", oracle=_FRONTIER_ORACLE)
def pipeline_crawl_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The crawl-frontier COMPOSITION (r8): sitemap extraction →
    URL canonicalization → robots verdict → url_key dedup, each stage
    the production operator, end-to-end under one oracle.  Rules match
    against path+query (RFC 9309 allows '?' in rules): a '/pJ' Disallow,
    a longer '/pJ?a=1' Allow override, and a '*2$' anchor Disallow
    interact so longest-match ordering is actually load-bearing.
    Output: one frontier row per allowed canonical identity with its
    first (doc, entry) sighting and the duplicate count."""
    from hive_udf_spark.operators.robots import robots_allowed
    from hive_udf_spark.operators.sitemap import sitemap_entries
    from hive_udf_spark.operators.util import ensure_min_parallelism

    # single-row-group corpus → scatter before the sitemap-XML build +
    # canonicalization chain (3.6 s single-task, 1.8 s scattered)
    docs = ensure_min_parallelism(load_table(spark, sf_dir, "documents"))
    sm = sitemap_entries(
        docs.select("doc_id", F.expr(_sitemap_xml_sql("spark")).alias("sitemap_xml"))
    )
    parts = url_parts_cols(sm.withColumn("url", F.col("loc")))
    u = parts.filter(F.col("canonical_url").isNotNull()).select(
        (F.col("doc_id") * 4 + F.col("entry_idx")).alias("uid"),
        F.col("registrable_domain").alias("host"),
        "url_key",
        F.regexp_extract("canonical_url", r"^[a-z]+://[^/]*(/.*)$", 1).alias("pathq"),
    )
    doms = u.select("host").distinct().localCheckpoint()
    j = (
        F.when(F.substring(F.md5(F.col("host").cast("binary")), 1, 1).isin(
            "0", "1", "2", "3", "4", "5"), 0)
        .when(F.substring(F.md5(F.col("host").cast("binary")), 1, 1).isin(
            "6", "7", "8", "9", "a"), 1)
        .otherwise(2)
        .cast("int")
    )
    jp = F.concat(F.lit("/p"), j.cast("string"))
    rules = (
        doms.select("host", jp.alias("rule_path"), F.lit(False).alias("allow"))
        .unionByName(
            doms.select(
                "host",
                F.concat(jp, F.lit("?a=1")).alias("rule_path"),
                F.lit(True).alias("allow"),
            )
        )
        .unionByName(
            doms.select("host", F.lit("*2$").alias("rule_path"), F.lit(False).alias("allow"))
        )
        .withColumn("rule_len", F.length("rule_path"))
    )
    v = robots_allowed(u, rules, id_col="uid", host_col="host", path_col="pathq")
    return (
        v.filter(F.col("allowed"))
        .groupBy("url_key")
        .agg(
            F.count("*").cast("long").alias("n_seen"),
            F.expr("min(uid) div 4").cast("long").alias("first_doc"),
            (F.min("uid") % 4).cast("long").alias("first_entry"),
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


# --- r8: hyperlink extraction -> host link graph -> PageRank ------------

from hive_udf_spark.functions.links import (  # noqa: E402
    base_url_sql,
    extract_links,
    links_sql,
    page_html_sql,
)

_LINKS_INNER = (
    f"SELECT doc_id, {base_url_sql('duckdb')} AS base_url,"
    f" {page_html_sql('duckdb')} AS html FROM documents"
)
# links -> canonicalized parts, both engines share every step
_LINKS_CANON = url_parts_sql(links_sql(_LINKS_INNER))


def _links_canon_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    def build() -> DataFrame:
        # The corpus fixture is one row group → a 1-task scan; the
        # href-extraction + RFC 3986 + canonicalization chain is the
        # expensive stage, so scatter the cheap text rows first.  Also
        # multi-files the materialized scratch relation, so every
        # re-read below starts parallel.  No-op at corpus scale.
        from hive_udf_spark.operators.util import ensure_min_parallelism

        docs = ensure_min_parallelism(
            load_table(spark, sf_dir, "documents")
        ).select(
            "doc_id",
            F.expr(base_url_sql("spark")).alias("base_url"),
            F.expr(page_html_sql("spark")).alias("html"),
        )
        return url_parts_cols(extract_links(docs))

    return _materialize(spark, sf_dir, "links_canonical", build)


@register(
    "web_link_extract",
    oracle=f"""
    SELECT doc_id, link_idx, href, url, canonical_url,
           u_host AS link_host
    FROM ({_LINKS_CANON})
    """,
)
def web_link_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anchor extraction + RFC 3986 reference resolution
    (functions/links.py): per-doc generated HTML explodes into one row
    per followable <a> tag — nofollow tags vetoed, fragment-only and
    mailto: references dropped, absolute / scheme-relative /
    root-relative / query-only / path-relative hrefs resolved against
    the page's base URL, then canonicalized by the url.py step chain
    (which finishes ../ via its dot-segment machinery).  Pure
    regexp + posexplode + string codegen; the oracle re-runs the
    identical expressions in DuckDB."""
    d = _links_canon_df(spark, sf_dir)
    return d.select(
        "doc_id",
        "link_idx",
        "href",
        "url",
        "canonical_url",
        F.col("u_host").alias("link_host"),
    )


_SRC_HOST = "lower(regexp_extract(base_url, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1))"


@register(
    "web_host_link_graph",
    oracle=f"""
    SELECT {_SRC_HOST} AS src_host, u_host AS dst_host,
           CAST(count(*) AS BIGINT) AS n_links
    FROM ({_LINKS_CANON})
    WHERE canonical_url IS NOT NULL AND {_SRC_HOST} <> u_host
    GROUP BY 1, 2
    """,
)
def web_host_link_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Host->host link graph: followable resolved links with a valid
    canonical form, self-loops dropped, one hash aggregation on short
    host-pair keys — the edge relation domain-authority features hang
    off.  At 100 TB this is the only shuffle in the family (the
    extraction/resolution above it is map-side codegen)."""
    d = _links_canon_df(spark, sf_dir)
    src = F.expr(_SRC_HOST).alias("src_host")
    return (
        d.where(F.col("canonical_url").isNotNull())
        .select(src, F.col("u_host").alias("dst_host"))
        .where(F.col("src_host") != F.col("dst_host"))
        .groupBy("src_host", "dst_host")
        .agg(F.count(F.lit(1)).cast("long").alias("n_links"))
    )


_LG_PR_ITERS = 5
_LG_PR_DAMP = 850


def _host_pagerank_oracle() -> str:
    its = []
    for k in range(1, _LG_PR_ITERS + 1):
        prev = "r0" if k == 1 else f"it{k - 1}"
        its.append(f"""
    it{k} AS (
      SELECT nodes.n,
             150000 + coalesce(m.mass, 0) AS r
      FROM nodes LEFT JOIN (
        SELECT e.dst AS n,
               CAST(sum(({_LG_PR_DAMP} * p.r) // (1000 * deg.c)) AS BIGINT) AS mass
        FROM e JOIN {prev} p ON p.n = e.src JOIN deg ON deg.s = e.src
        GROUP BY 1
      ) m ON m.n = nodes.n
    )""")
    return f"""
    WITH lc AS ({_LINKS_CANON}),
    e AS (
      SELECT DISTINCT {_SRC_HOST} AS src, u_host AS dst
      FROM lc WHERE canonical_url IS NOT NULL AND {_SRC_HOST} <> u_host
    ),
    nodes AS (SELECT DISTINCT src AS n FROM e UNION SELECT DISTINCT dst FROM e),
    deg AS (SELECT src AS s, count(*) AS c FROM e GROUP BY 1),
    r0 AS (SELECT n, CAST(1000000 AS BIGINT) AS r FROM nodes),
    {','.join(its)}
    SELECT n AS node, CAST(r AS BIGINT) AS rank_micro FROM it{_LG_PR_ITERS}
    """


@register("web_host_pagerank", oracle=_host_pagerank_oracle())
def web_host_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain authority over the DIRECTED host link graph
    (operators/graph.py pagerank_fixed — same integer recurrence the
    video-dup centrality query pins, now on its canonical habitat):
    5 damped power iterations over the distinct host->host edges from
    the anchor-extraction family, hub hosts accumulating rank from the
    fixture's skewed linking.  Every step is integer sums plus one
    defined floor division, so the oracle's chained CTEs reproduce all
    five iterations bit-for-bit."""
    from hive_udf_spark.operators.graph import pagerank_fixed

    d = _links_canon_df(spark, sf_dir)
    src = F.expr(_SRC_HOST).alias("src")
    edges = (
        d.where(F.col("canonical_url").isNotNull())
        .select(src, F.col("u_host").alias("dst"))
        .where(F.col("src") != F.col("dst"))
    )
    return pagerank_fixed(
        edges, iters=_LG_PR_ITERS, damping_milli=_LG_PR_DAMP
    )


# ---------------------------------------------------------------------------
# Crawl politeness scheduling (r8)
# ---------------------------------------------------------------------------

_POLITE_DELAY_S = 2  # per-host crawl delay between consecutive fetches


@register(
    "web_crawl_politeness_schedule",
    oracle=f"""
    WITH u AS (
      SELECT doc_id, registrable_domain AS host, url_key
      FROM ({_ORACLE_PARTS})
      WHERE canonical_url IS NOT NULL AND registrable_domain IS NOT NULL
    ),
    d AS (SELECT host, url_key, min(doc_id) AS doc_id
          FROM u GROUP BY host, url_key),
    w AS (SELECT host, url_key, doc_id,
                 row_number() OVER (PARTITION BY host ORDER BY doc_id, url_key)
                   - 1 AS wave
          FROM d)
    SELECT host, url_key, doc_id, CAST(wave AS BIGINT) AS wave,
           CAST(wave * {_POLITE_DELAY_S} AS BIGINT) AS fetch_offset_s
    FROM w
    """,
)
def web_crawl_politeness_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Politeness scheduling for a crawl frontier: after canonical-key
    dedup, fetches for one host must be serialized with a crawl delay
    while different hosts proceed in parallel — so each host's URLs get
    a wave number (row_number per host in stable doc/url order) and a
    fetch offset of wave x delay.  By construction a wave contains at
    most one URL per host: the whole schedule is ONE window partitioned
    by host (per-host state only — no global ordering, no single
    partition anywhere), after the usual bounded url_key hash-agg.  At
    100 TB hosts shard across executors and the schedule stays
    embarrassingly parallel."""
    d = (
        _docs_with_urls(spark, sf_dir)
        .filter(
            F.col("canonical_url").isNotNull()
            & F.col("registrable_domain").isNotNull()
        )
        .groupBy(
            F.col("registrable_domain").alias("host"), F.col("url_key")
        )
        .agg(F.min("doc_id").alias("doc_id"))
    )
    w = Window.partitionBy("host").orderBy("doc_id", "url_key")
    return d.select(
        "host",
        "url_key",
        "doc_id",
        (F.row_number().over(w) - 1).cast("long").alias("wave"),
        ((F.row_number().over(w) - 1) * _POLITE_DELAY_S)
        .cast("long")
        .alias("fetch_offset_s"),
    )


@register(
    "web_politeness_crawl_delay",
    oracle=f"""
    WITH u AS (
      SELECT doc_id, registrable_domain AS host, url_key
      FROM ({_ORACLE_PARTS})
      WHERE canonical_url IS NOT NULL AND registrable_domain IS NOT NULL
    ),
    d AS (SELECT host, url_key, min(doc_id) AS doc_id
          FROM u GROUP BY host, url_key),
    w AS (SELECT host, url_key, doc_id,
                 row_number() OVER (PARTITION BY host ORDER BY doc_id, url_key)
                   - 1 AS wave
          FROM d)
    SELECT host, url_key, doc_id, CAST(wave AS BIGINT) AS wave,
           CAST(length(host) % 7 + 1 AS INT) AS crawl_delay_s,
           CAST(wave * (length(host) % 7 + 1) AS BIGINT) AS fetch_offset_s
    FROM w
    """,
)
def web_politeness_crawl_delay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Politeness scheduling honoring each host's OWN Crawl-delay,
    parsed from synthesized robots.txt TEXT — the first registry query
    to push the RFC-9309 text parser (UA groups, comments, agent match)
    through the oracle gate end-to-end: every host gets a two-group
    robots.txt where the applicable '*' group declares
    Crawl-delay: len(host)%7+1 (plus a comment and a decoy group for a
    different agent declaring 99), and the oracle re-derives the delay
    ANALYTICALLY from the host string — so group detection, comment
    stripping, agent matching, the max-of-applicable rule, and the
    decoy's exclusion must all be exact.  Plan shape: text parse is
    per-host (domain-count-sized relation), the schedule is the same
    host-partitioned window as web_crawl_politeness_schedule, delays
    arrive by broadcast join."""
    from hive_udf_spark.operators.robots import parse_crawl_delays

    d = (
        _docs_with_urls(spark, sf_dir)
        .filter(
            F.col("canonical_url").isNotNull()
            & F.col("registrable_domain").isNotNull()
        )
        .groupBy(F.col("registrable_domain").alias("host"), F.col("url_key"))
        .agg(F.min("doc_id").alias("doc_id"))
    )
    doms = d.select("host").distinct().localCheckpoint()
    txt = F.concat(
        F.lit("# synthetic robots\nUser-agent: *\nCrawl-delay: "),
        (F.length("host") % 7 + 1).cast("string"),
        F.lit("  # per-host delay\nDisallow:\n\nUser-agent: otherbot\nCrawl-delay: 99\n"),
    )
    delays = parse_crawl_delays(
        doms.select("host", txt.alias("robots_txt"))
    )
    w = Window.partitionBy("host").orderBy("doc_id", "url_key")
    sched = d.select(
        "host", "url_key", "doc_id",
        (F.row_number().over(w) - 1).cast("long").alias("wave"),
    )
    return sched.join(F.broadcast(delays), "host").select(
        "host", "url_key", "doc_id", "wave",
        F.col("crawl_delay_s").cast("int").alias("crawl_delay_s"),
        (F.col("wave") * F.col("crawl_delay_s")).cast("long").alias("fetch_offset_s"),
    )


# ---------------------------------------------------------------------------
# IDN host folding (r9)
# ---------------------------------------------------------------------------


def _synth_idn_url_sql(d: str) -> str:
    """Deterministic IDN-mix fixture: five unicode hosts (incl. a www.
    variant) + one ASCII control, scheme-case messiness, a fragment —
    simple paths so the oracle can state the canonical forms
    analytically.  One generator, two engines."""
    s = "STRING" if d == "spark" else "VARCHAR"
    host = (
        "CASE doc_id % 6 WHEN 0 THEN 'bücher.de' WHEN 1 THEN 'münchen.de' "
        "WHEN 2 THEN 'café.fr' WHEN 3 THEN 'пример.ru' "
        "WHEN 4 THEN 'www.bücher.de' ELSE 'example.com' END"
    )
    scheme_l = "CASE WHEN doc_id % 2 = 0 THEN 'http' ELSE 'https' END"
    scheme = f"CASE WHEN doc_id % 4 < 2 THEN upper({scheme_l}) ELSE {scheme_l} END"
    frag = "CASE WHEN doc_id % 5 = 0 THEN '#Frag' ELSE '' END"
    return (
        f"{scheme} || '://' || {host} || '/p' || CAST(doc_id % 7 AS {s}) || {frag}"
    )


# expected folds, pinned as PUBLIC literals (RFC 3492 examples / ICANN
# test strings) — NOT derived from the engine's own encoder, so the
# oracle is independent; the property test additionally pins the
# general encoder to the stdlib codec on random labels.
_IDN_FHOST = (
    "CASE doc_id % 6 WHEN 0 THEN 'xn--bcher-kva.de' "
    "WHEN 1 THEN 'xn--mnchen-3ya.de' WHEN 2 THEN 'xn--caf-dma.fr' "
    "WHEN 3 THEN 'xn--e1afmkfd.ru' WHEN 4 THEN 'www.xn--bcher-kva.de' "
    "ELSE 'example.com' END"
)
_IDN_KHOST = (
    "CASE doc_id % 6 WHEN 0 THEN 'xn--bcher-kva.de' "
    "WHEN 1 THEN 'xn--mnchen-3ya.de' WHEN 2 THEN 'xn--caf-dma.fr' "
    "WHEN 3 THEN 'xn--e1afmkfd.ru' WHEN 4 THEN 'xn--bcher-kva.de' "
    "ELSE 'example.com' END"
)


@register(
    "web_url_idn_fold",
    oracle=f"""
    WITH u AS (
      SELECT doc_id, {_synth_idn_url_sql('duckdb')} AS url,
             CASE WHEN doc_id % 2 = 0 THEN 'http' ELSE 'https' END AS sch,
             {_IDN_FHOST} AS fhost, {_IDN_KHOST} AS khost
      FROM documents
    )
    SELECT doc_id, url,
           sch || '://' || fhost || '/p' || CAST(doc_id % 7 AS VARCHAR)
             AS canonical_url,
           sch || '://' || khost || '/p' || CAST(doc_id % 7 AS VARCHAR)
             AS url_key,
           khost AS registrable_domain,
           fhost AS host
    FROM u
    """,
)
def web_url_idn_fold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IDN host folding end-to-end (r8 verdict item 7,
    functions/idn.py): unicode hostnames are punycode-folded (RFC 3492
    bootstring, implemented from the spec) BEFORE the pure-expression
    canonicalization chain, so ``http://bücher.de/x`` and
    ``http://xn--bcher-kva.de/x`` share one canonical identity instead
    of the unicode spelling being excluded.  The fold touches only the
    non-ASCII stratum (JVM rlike gate; Arrow-batched UDF on the
    remainder); the oracle pins the expected punycode forms as public
    literals, so the engine's general encoder must reproduce them."""
    from hive_udf_spark.functions.idn import fold_idn_urls
    from hive_udf_spark.operators.util import ensure_min_parallelism

    # single-row-group corpus → scatter before the punycode fold chain
    docs = ensure_min_parallelism(load_table(spark, sf_dir, "documents"))
    d = docs.select(
        "doc_id", F.expr(_synth_idn_url_sql("spark")).alias("url")
    ).withColumn("orig_url", F.col("url"))
    folded = fold_idn_urls(d, "url")
    parts = url_parts_cols(folded)
    return parts.select(
        "doc_id",
        F.col("orig_url").alias("url"),
        "canonical_url",
        "url_key",
        "registrable_domain",
        F.col("u_host").alias("host"),
    )
