"""URL canonicalization (functions/url.py, r7).

Three layers: hand-computed expected values on adversarial URLs, Spark ≡
DuckDB equivalence over the same adversarial set (the two dialects are
generated from one step list — this test is the proof), and plan purity
(no Python in the chain)."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from hive_udf_spark.functions.url import (
    synth_url_sql,
    url_parts_cols,
    url_parts_sql,
)

# (raw, canonical_url, url_key, registrable_domain)
CASES = [
    (
        "HTTP://WWW.Example.COM:80/a/./b/../c?utm_source=rss&b=2&a=1#frag",
        "http://www.example.com/a/c?a=1&b=2",
        "http://example.com/a/c?a=1&b=2",
        "example.com",
    ),
    (
        "https://example.com:443/",
        "https://example.com/",
        "https://example.com/",
        "example.com",
    ),
    (  # non-default port survives; empty path -> '/'
        "https://EXAMPLE.com:8443?x=1",
        "https://example.com:8443/?x=1",
        "https://example.com:8443/?x=1",
        "example.com",
    ),
    (  # userinfo stripped, trailing host dot, duplicate slashes
        "http://alice:pw@host.co.uk.//x//y///z",
        "http://host.co.uk/x/y/z",
        "http://host.co.uk/x/y/z",
        "host.co.uk",
    ),
    (  # multi-part suffix: eTLD+1 keeps three labels
        "http://a.b.shop.co.uk/p",
        "http://a.b.shop.co.uk/p",
        "http://a.b.shop.co.uk/p",
        "shop.co.uk",
    ),
    (  # dot segments: nested ../ resolution + trailing /..
        "http://h.org/a/b/c/../../d/..",
        "http://h.org/a/",
        "http://h.org/a",
        "h.org",
    ),
    (  # parent-of-root clamps to root
        "http://h.org/../../x",
        "http://h.org/x",
        "http://h.org/x",
        "h.org",
    ),
    (  # tracking-only query disappears; bare 'ref' flag too
        "http://h.org/p?utm_medium=email&ref&fbclid=abc",
        "http://h.org/p",
        "http://h.org/p",
        "h.org",
    ),
    (  # %-escape inventory: %7e decodes, %2f only uppercases
        "http://h.org/%7euser/a%2fb?k=%2fv",
        "http://h.org/~user/a%2Fb?k=%2Fv",
        "http://h.org/~user/a%2Fb?k=%2Fv",
        "h.org",
    ),
    (  # param sort is bytewise; empty params ('&&') dropped
        "http://h.org/p?z=1&&a=2&m=3&",
        "http://h.org/p?a=2&m=3&z=1",
        "http://h.org/p?a=2&m=3&z=1",
        "h.org",
    ),
    (  # fragment with '?' inside must go with the fragment
        "http://h.org/p#frag?notaquery=1",
        "http://h.org/p",
        "http://h.org/p",
        "h.org",
    ),
    (  # non-http(s) scheme -> NULL canonical forms
        "ftp://h.org/file",
        None,
        None,
        "h.org",
    ),
    (  # single-label host: registrable domain falls back to host
        "http://localhost:8080/x",
        "http://localhost:8080/x",
        "http://localhost:8080/x",
        "localhost",
    ),
    (  # www-strip is key-level only; trailing slash folds in the key
        "https://www.site.com/dir/",
        "https://www.site.com/dir/",
        "https://site.com/dir",
        "site.com",
    ),
]


def _spark_parts(spark, urls):
    df = spark.createDataFrame([(i, u) for i, u in enumerate(urls)], "i int, url string")
    return (
        url_parts_cols(df)
        .orderBy("i")
        .select("url", "canonical_url", "url_key", "registrable_domain")
        .collect()
    )


def test_canonicalization_expected_values(spark):
    rows = _spark_parts(spark, [c[0] for c in CASES])
    for (raw, canon, key, dom), r in zip(CASES, rows):
        assert r.canonical_url == canon, f"{raw!r}: {r.canonical_url!r} != {canon!r}"
        assert r.url_key == key, f"{raw!r}: {r.url_key!r} != {key!r}"
        assert r.registrable_domain == dom, f"{raw!r}: {r.registrable_domain!r} != {dom!r}"


def test_spark_duckdb_equivalence_on_adversarial_urls(spark):
    """The real contract: both dialect renderings of the ONE step list
    produce identical output on every adversarial case."""
    urls = [c[0] for c in CASES] + [
        "http://h.org",  # no path at all
        "  http://h.org/sp  ",  # surrounding whitespace
        "http://h.org/a/.../b",  # dot-only segment stays opaque
        "http://h.org/p?a",  # bare param, kept
        "http://UPPER.ORG./P?B=2&A=1#x",
        "https://u@www.x.com.au:443//a/./b/..",
    ]
    got = _spark_parts(spark, urls)
    con = duckdb.connect()
    vals = ", ".join(
        f"({i}, '{u}')" for i, u in enumerate(urls)
    )
    inner = f"SELECT i, url FROM (VALUES {vals}) AS t(i, url)"
    want = con.execute(
        f"SELECT url, canonical_url, url_key, registrable_domain "
        f"FROM ({url_parts_sql(inner)}) ORDER BY i"
    ).fetchall()
    for g, w in zip(got, want):
        assert (g.canonical_url, g.url_key, g.registrable_domain) == (
            w[1],
            w[2],
            w[3],
        ), f"engines disagree on {g.url!r}: {tuple(g)} vs {w}"


def test_synth_urls_identical_across_engines(spark):
    ids = list(range(0, 2500, 7))
    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    got = [
        r.url
        for r in df.withColumn("url", F.expr(synth_url_sql("spark")))
        .orderBy("doc_id")
        .collect()
    ]
    con = duckdb.connect()
    vals = ", ".join(f"({i})" for i in ids)
    want = [
        r[0]
        for r in con.execute(
            f"SELECT {synth_url_sql('duckdb')} AS url "
            f"FROM (VALUES {vals}) AS t(doc_id) ORDER BY doc_id"
        ).fetchall()
    ]
    assert got == want


def test_canonicalization_plan_is_pure_jvm(spark):
    df = spark.createDataFrame([("http://a.com/x",)], "url string")
    plan = url_parts_cols(df)._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "BatchEval" not in plan
