"""Hyperlink extraction + RFC 3986 relative-reference resolution.

The missing tier between the HTML pipeline (``functions/html.py``), URL
canonicalization (``functions/url.py``) and the crawl frontier
(``plans/web_queries.py``): pull ``<a>`` anchors out of page HTML,
resolve each ``href`` against the page's own base URL (RFC 3986 §5.2 —
absolute, scheme-relative ``//h/p``, root-relative ``/p``, query-only
``?q``, and path-relative forms; fragment-only and non-http(s) schemes
drop), and hand the resolved URLs to the canonicalization chain, whose
dot-segment machinery finishes ``../`` resolution.  From there the
host→host LINK GRAPH falls out as one aggregation, and
``operators/graph.pagerank_fixed`` turns it into the classic
domain-authority quality feature (the corpus-level signal crawl-based
training-data pipelines rank sources by).

Same single-source-of-truth discipline as ``url.py``: every step is ONE
dialect-parameterized SQL expression consumed by Spark via ``F.expr``
and pasted verbatim into the DuckDB oracle — extraction, nofollow
filtering, and resolution are what the hash check pins, not a parallel
reimplementation.

Scale shape: anchor-tag extraction and href resolution are per-row
string codegen (no shuffle, no Python); the explode multiplies rows by
links-per-page (bounded by real page structure); the link graph is one
hash aggregation on short ``(src_host, dst_host)`` keys; PageRank
iterations join a fixed-width edge relation (see ``operators/graph.py``
for the checkpoint discipline).  Nothing here reads the HTML twice.

Reference scope: the reference engine (470-LoC sketch UDAF) has no web
operators; this continues the mandated crawl-pipeline extension surface
(SURVEY.md §2.3), composing with robots.txt (operators/robots.py) and
sitemaps (operators/sitemap.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hive_udf_spark.functions.url import _esc, _rex, _rlike, _rr

__all__ = [
    "ANCHOR_TAG_PATTERN",
    "HREF_PATTERN",
    "NOFOLLOW_PATTERN",
    "extract_links",
    "links_sql",
    "page_html_sql",
    "base_url_sql",
    "resolve_href_sql",
]

# Tag-level extraction so rel="nofollow" (anywhere in the tag, either
# side of href) can veto the link — crawlers exclude nofollow edges from
# the authority graph.  Single- or double-quoted href values; the quote
# characters are spelled as hex escapes (\x22 \x27 — Java regex and RE2
# both take them) so the patterns embed into SQL string literals of
# either dialect without quote-escaping games.
ANCHOR_TAG_PATTERN = r"<[Aa]\s[^>]*>"
HREF_PATTERN = r"href\s*=\s*[\x22\x27]([^\x22\x27]*)[\x22\x27]"
NOFOLLOW_PATTERN = r"rel\s*=\s*[\x22\x27]nofollow[\x22\x27]"


def resolve_href_sql(dialect: str, href: str, base: str) -> str:
    """RFC 3986 §5.2 reference resolution as one SQL expression:
    ``href`` against ``base``, yielding a raw absolute URL (NULL for
    fragment-only / empty / non-http(s) references).  Dot segments are
    NOT resolved here — the canonicalization chain (``url._steps``)
    owns that, so ``../`` handling is written once."""
    d = dialect
    bscheme = f"lower({_rex(d, base, r'^([A-Za-z][A-Za-z0-9+.-]*)://')})"
    bhost = _rex(d, base, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)")
    bpath_raw = _rex(d, base, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)")
    bpath = f"coalesce(nullif({bpath_raw}, ''), '/')"
    bdir = _rr(d, bpath, r"[^/]*$", "")
    return (
        f"CASE"
        f" WHEN {href} IS NULL OR {href} = '' THEN NULL"
        f" WHEN {_rlike(d, href, r'^[A-Za-z][A-Za-z0-9+.-]*:')} THEN"
        f"   (CASE WHEN {_rlike(d, href, '^[Hh][Tt][Tt][Pp][Ss]?://')}"
        f"         THEN {href} ELSE NULL END)"
        f" WHEN {href} LIKE '//%' THEN {bscheme} || ':' || {href}"
        f" WHEN {href} LIKE '/%' THEN {bscheme} || '://' || {bhost} || {href}"
        f" WHEN {href} LIKE '#%' THEN NULL"
        f" WHEN {href} LIKE '?%' THEN"
        f"   {bscheme} || '://' || {bhost} || {bpath} || {href}"
        f" ELSE {bscheme} || '://' || {bhost} || {bdir} || {href}"
        f" END"
    )


def extract_links(
    df: DataFrame, html_col: str = "html", base_col: str = "base_url"
) -> DataFrame:
    """(…, html, base_url) → one row per followable anchor: original
    columns + ``link_idx`` (document order over ALL anchor tags, so
    indexes are stable under nofollow filtering), ``href`` (raw
    attribute value) and ``url`` (resolved absolute; see
    ``resolve_href_sql``).  Pure Catalyst: regexp_extract_all →
    posexplode → per-row resolution."""
    tags = f"regexp_extract_all({html_col}, '{_esc('spark', ANCHOR_TAG_PATTERN)}', 0)"
    d = df.select(
        "*", F.posexplode(F.expr(tags)).alias("link_idx", "__tag")
    ).where(~F.expr(_rlike("spark", "__tag", NOFOLLOW_PATTERN)))
    d = d.withColumn("href", F.expr(_rex("spark", "__tag", HREF_PATTERN)))
    d = d.where(F.col("href") != "").withColumn(
        "url", F.expr(resolve_href_sql("spark", "href", base_col))
    )
    return d.where(F.col("url").isNotNull()).drop("__tag")


def links_sql(inner_sql: str, html_col: str = "html", base_col: str = "base_url") -> str:
    """DuckDB twin of ``extract_links`` over ``inner_sql`` (a relation
    exposing ``html_col`` and ``base_col``): same patterns, same
    resolution expression, same output columns."""
    d = "duckdb"
    tags = f"regexp_extract_all({html_col}, '{ANCHOR_TAG_PATTERN}', 0)"
    return f"""
    SELECT * FROM (
      SELECT *,
             {_rex(d, "__tag", HREF_PATTERN)} AS href,
             {resolve_href_sql(d, _rex(d, "__tag", HREF_PATTERN), base_col)} AS url
      FROM (
        SELECT *, CAST(__i AS INT) AS link_idx, __tags[__i + 1] AS __tag
        FROM (SELECT *, {tags} AS __tags FROM ({inner_sql})),
             LATERAL (SELECT unnest(range(len(__tags))) AS __i)
      )
      WHERE NOT {_rlike(d, "__tag", NOFOLLOW_PATTERN)}
    )
    WHERE href <> '' AND url IS NOT NULL
    """


def base_url_sql(dialect: str, host_mod: int = 23) -> str:
    """The fixture page's own URL: clean lowercase
    ``https://h{k}.com/d{i}/p{j}.html`` so relative resolution exercises
    directory merging (`sub/`), parent traversal (`../`), and rooted
    paths against a two-level base."""
    s = "STRING" if dialect == "spark" else "VARCHAR"
    return (
        f"'https://h' || CAST(doc_id % {host_mod} AS {s}) ||"
        f" '.com/d' || CAST(doc_id % 5 AS {s}) ||"
        f" '/p' || CAST(doc_id % 7 AS {s}) || '.html'"
    )


def page_html_sql(dialect: str, host_mod: int = 23) -> str:
    """Deterministic per-doc page HTML (engine twin): an absolute
    cross-host link (sometimes SHOUTING-case, sometimes rel=nofollow —
    the veto case), a hub link every 4th doc (skews the graph so
    PageRank has something to rank), one relative link cycling through
    the four RFC resolution shapes, and a rotating fifth slot
    (scheme-relative / fragment-only / mailto / query-only / none).
    ONE generator string for both dialects."""
    s = "STRING" if dialect == "spark" else "VARCHAR"
    abs_url = (
        f"'https://h' || CAST((doc_id * 7 + 3) % {host_mod} AS {s})"
        f" || '.com/x' || CAST(doc_id % 4 AS {s})"
    )
    abs_url = f"CASE WHEN doc_id % 9 = 0 THEN upper({abs_url}) ELSE {abs_url} END"
    t1 = (
        f"CASE WHEN doc_id % 5 = 0"
        f" THEN '<a rel=\"nofollow\" href=\"' || {abs_url} || '\">out</a>'"
        f" ELSE '<a href=\"' || {abs_url} || '\">out</a>' END"
    )
    hub = (
        "CASE WHEN doc_id % 4 = 1"
        " THEN '<a href=\"https://h0.com/\">hub</a>' ELSE '' END"
    )
    rel = (
        "CASE doc_id % 4"
        " WHEN 0 THEN 'sub/r1.html'"
        " WHEN 1 THEN '../up.html'"
        " WHEN 2 THEN './same.html'"
        " ELSE '/rooted.html' END"
    )
    t2 = f"'<a class=''m'' href=\"' || {rel} || '\">rel</a>'"
    t3 = (
        f"CASE doc_id % 6"
        f" WHEN 0 THEN '<a href=\"//h' || CAST((doc_id * 3 + 1) % {host_mod} AS {s})"
        f"   || '.com/y\">sr</a>'"
        " WHEN 1 THEN '<a href=\"#frag\">anchor</a>'"
        " WHEN 2 THEN '<a href=\"mailto:a@b.example\">mail</a>'"
        " WHEN 3 THEN '<a href=\"?q=2\">query</a>'"
        " ELSE '' END"
    )
    return (
        f"'<html><body><p>intro</p>' || {t1} || '<p>mid</p>' || {hub}"
        f" || {t2} || {t3} || '</body></html>'"
    )
