"""Sitemap (sitemaps.org XML) URL extraction.

The other half of the crawl frontier next to ``operators/robots.py``:
a crawler's URL discovery reads ``<urlset>`` sitemaps (and
``<sitemapindex>`` pointers) out of fetched XML.  The format is
deliberately tiny — ``<url>`` entries with ``<loc>`` plus optional
``<lastmod>``/``<changefreq>``/``<priority>`` — and real pipelines
extract it with streaming regex pulls rather than a DOM, which is
exactly what a columnar engine wants: per-entry extraction as pure
string expressions.

``sitemap_entries`` explodes one row per ``<url>`` entry with its
fields; entity-decoded ``loc`` (sitemaps XML-escape ``&`` in URLs);
``<sitemapindex>`` files yield their child sitemap locations with
``is_index=true`` so a driver loop can fetch the next level.  All
Catalyst expressions — ``regexp_extract_all`` + ``posexplode`` — no
UDF, no shuffle beyond the explode.

Reference parity note: no analogue in the reference engine
(MLnick/hive-udf, a cardinality-UDAF package) — mandated web-pipeline
extension surface (SURVEY.md §2.3), public sitemaps.org protocol.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["sitemap_entries"]

# an entry is a <url>...</url> (urlset) or <sitemap>...</sitemap> (index)
_ENTRY = r"(?s)<(?:url|sitemap)\b[^>]*>(.*?)</(?:url|sitemap)>"


def _field(name: str):
    return F.regexp_extract(
        F.col("entry_xml"), rf"(?s)<{name}\b[^>]*>\s*(.*?)\s*</{name}>", 1
    )


def _xml_unescape(c):
    # the five XML entities, &amp; LAST so it never double-decodes
    for ent, ch in (("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
                    ("&apos;", "'"), ("&amp;", "&")):
        c = F.replace(c, F.lit(ent), F.lit(ch))
    return c


def sitemap_entries(
    df: DataFrame, id_col: str = "doc_id", xml_col: str = "sitemap_xml"
) -> DataFrame:
    """→ one row per sitemap entry: (id, entry_idx, loc, lastmod,
    changefreq, priority, is_index).  ``is_index`` marks entries from a
    ``<sitemapindex>`` (child-sitemap pointers to fetch next).  Rows
    whose ``<loc>`` is missing are dropped (spec: loc is required)."""
    x = F.col(xml_col)
    is_index = F.lower(x).contains("<sitemapindex")
    entries = df.select(
        F.col(id_col),
        is_index.alias("is_index"),
        F.posexplode(F.regexp_extract_all(x, F.lit(_ENTRY), F.lit(1))).alias(
            "entry_idx", "entry_xml"
        ),
    )
    return entries.select(
        id_col,
        "entry_idx",
        _xml_unescape(_field("loc")).alias("loc"),
        F.nullif(_field("lastmod"), F.lit("")).alias("lastmod"),
        F.nullif(_field("changefreq"), F.lit("")).alias("changefreq"),
        F.nullif(_field("priority"), F.lit("")).cast("double").alias("priority"),
        "is_index",
    ).filter(F.col("loc") != "")
