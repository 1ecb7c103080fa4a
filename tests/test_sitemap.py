"""Sitemap extraction (operators/sitemap.py, r8)."""

from __future__ import annotations


def test_urlset_and_index_extraction(spark):
    from hive_udf_spark.operators.sitemap import sitemap_entries

    urlset = """<?xml version="1.0" encoding="UTF-8"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <url>
    <loc>https://ex.com/a?x=1&amp;y=2</loc>
    <lastmod>2024-01-05</lastmod>
    <changefreq>daily</changefreq>
    <priority>0.8</priority>
  </url>
  <url><loc> https://ex.com/b </loc></url>
  <url><lastmod>2024-01-01</lastmod></url>
</urlset>"""
    index = """<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <sitemap><loc>https://ex.com/sitemap1.xml.gz</loc><lastmod>2024-02-02</lastmod></sitemap>
  <sitemap><loc>https://ex.com/sitemap2.xml.gz</loc></sitemap>
</sitemapindex>"""
    df = spark.createDataFrame(
        [(1, urlset), (2, index), (3, "not xml at all")],
        "doc_id long, sitemap_xml string",
    )
    rows = [tuple(r) for r in sitemap_entries(df).orderBy("doc_id", "entry_idx").collect()]
    assert rows == [
        # XML entities decode; loc whitespace trims; loc-less entries drop
        (1, 0, "https://ex.com/a?x=1&y=2", "2024-01-05", "daily", 0.8, False),
        (1, 1, "https://ex.com/b", None, None, None, False),
        # index entries flagged so a driver loop can fetch the children
        (2, 0, "https://ex.com/sitemap1.xml.gz", "2024-02-02", None, None, True),
        (2, 1, "https://ex.com/sitemap2.xml.gz", None, None, None, True),
    ]


def test_plan_is_pure_jvm(spark):
    import io
    from contextlib import redirect_stdout

    from hive_udf_spark.operators.sitemap import sitemap_entries

    df = spark.createDataFrame([(1, "<urlset/>")], "doc_id long, sitemap_xml string")
    buf = io.StringIO()
    with redirect_stdout(buf):
        sitemap_entries(df).explain("formatted")
    plan = buf.getvalue()
    # a createDataFrame scan mentions applySchemaToPythonRDD — what must
    # be absent is any Python UDF evaluation node
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan and "PythonUDF" not in plan
