"""URL canonicalization / web-identity functions for crawl pipelines.

Every web-scale training corpus starts from (url, payload) pairs, and the
FIRST dedup axis is the URL itself: the same page is crawled as
``HTTP://WWW.Example.COM:80/a/./b/../c?utm_source=rss&b=2&a=1#frag`` and
``http://example.com/a/c?a=1&b=2``.  This module provides:

- ``canonical url`` — RFC-3986-style normalization: scheme/host lowercase,
  userinfo stripped, default ports removed, trailing host dot removed,
  fragment stripped, duplicate-slash collapse, dot-segment resolution
  (bounded unroll, see below), percent-escape normalization over the
  fixture inventory, query params sorted with tracking params
  (``utm_*``/``fbclid``/``gclid``/...) dropped.
- ``url key`` — the dedup identity: canonical url with the ``www.`` host
  prefix and any trailing path slash also removed.
- ``registrable domain`` — eTLD+1 via a vendored multi-part-suffix list
  (``co.uk``-style); the full public-suffix list is a data swap, not a
  code change.

Engine discipline (the ``functions/html.py`` model): the whole chain is
generated from ONE step list into BOTH dialects — Spark (``F.expr`` per
step → pure Catalyst, whole-stage codegen, zero Python in the hot path)
and DuckDB SQL (nested SELECTs) — so the registry oracle executes the
byte-identical logic.  Patterns are restricted to the Java-regex ∩ RE2
dialect: no backreferences, no lookaround, no inline flags, and no
capture references in replacements (the two engines disagree on ``$1``
vs ``\\1``).

Scale: every step is a scalar string expression on the row it came in on
— no shuffle, no UDF, survives any data scale; the dedup/quota queries
built on top shuffle only on the (short, bounded) canonical-key strings.

Bounded unrolls: dot-segment removal is a fixpoint loop in RFC 3986;
here it is unrolled ``_DOT_PASSES`` times identically in both engines,
which resolves nesting up to that depth (property-tested).  Dot-only
segments other than ``.``/``..`` (e.g. ``...``) are treated as opaque —
the guard that stops ``/../..`` from being eaten as ``<seg>/..`` requires
one non-dot char in the consumed segment.

Reference parity note: the reference engine (MLnick/hive-udf) has no URL
surface — this family is part of the mandated training-data-pipeline
extensions (SURVEY.md §2.3), built on public RFC 3986 semantics only.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "url_parts_cols",
    "url_parts_sql",
    "synth_url_sql",
    "URL_STEP_NAMES",
    "TRACKING_PARAM_PATTERN",
]

# Params dropped from the canonical query string (anchored against the
# whole `key=value` token; `(=|$)` also catches bare flags like `ref`).
TRACKING_PARAM_PATTERN = (
    r"^(utm_[^=&]*|fbclid|gclid|msclkid|igshid|ref|ref_src)(=|$)"
)

# Vendored multi-part public suffixes (extend by data, not code).
_MULTI_SUFFIXES = (
    "co.uk|org.uk|ac.uk|gov.uk|co.jp|ne.jp|or.jp|com.au|net.au|org.au|"
    "co.nz|com.br|com.mx|co.in|com.cn|com.sg|com.tr|co.za|co.kr|com.ar"
)

_DOT_PASSES = 4  # resolves /a/b/c/../../../ nesting up to depth 4


def _esc(dialect: str, pat: str) -> str:
    """Embed a regex into a SQL string literal.  Spark's parser consumes
    backslash escapes inside literals; DuckDB's does not."""
    return pat.replace("\\", "\\\\") if dialect == "spark" else pat


def _rr(dialect: str, x: str, pat: str, rep: str) -> str:
    """Global regexp_replace (Spark is global by default; DuckDB needs 'g')."""
    p = _esc(dialect, pat)
    if dialect == "spark":
        return f"regexp_replace({x}, '{p}', '{rep}')"
    return f"regexp_replace({x}, '{p}', '{rep}', 'g')"


def _rex(dialect: str, x: str, pat: str, group: int = 1) -> str:
    return f"regexp_extract({x}, '{_esc(dialect, pat)}', {group})"


def _rlike(dialect: str, x: str, pat: str) -> str:
    fn = "regexp_like" if dialect == "spark" else "regexp_matches"
    return f"{fn}({x}, '{_esc(dialect, pat)}')"


def _split(dialect: str, x: str, sep: str) -> str:
    # Spark split() takes a regex; '&' is regex-literal so both agree.
    fn = "split" if dialect == "spark" else "string_split"
    return f"{fn}({x}, '{sep}')"


def _filter_params(dialect: str, arr: str) -> str:
    pred = (
        f"kv <> '' AND NOT {_rlike(dialect, 'kv', TRACKING_PARAM_PATTERN)}"
    )
    fn = "filter" if dialect == "spark" else "list_filter"
    return f"{fn}({arr}, kv -> {pred})"


def _sortjoin(dialect: str, arr: str, sep: str) -> str:
    if dialect == "spark":
        return f"array_join(array_sort({arr}), '{sep}')"
    # DuckDB's array_to_string([]) is NULL where Spark's array_join([]) is ''
    return f"coalesce(array_to_string(list_sort({arr}), '{sep}'), '')"


def _steps(dialect: str, u: str) -> list[tuple[str, str]]:
    """The canonicalization pipeline as (column_name, expr) steps; each
    expr may reference earlier names.  ONE list drives both engines."""
    d = dialect
    steps: list[tuple[str, str]] = []

    steps.append(("u_scheme", f"lower({_rex(d, f'trim({u})', r'^([A-Za-z][A-Za-z0-9+.-]*)://')})"))
    steps.append(("u_rest", _rr(d, f"trim({u})", r"^[A-Za-z][A-Za-z0-9+.-]*://", "")))
    # fragment strip ([\s\S] so a stray newline can't hide a fragment)
    steps.append(("u_nofrag", _rr(d, "u_rest", r"#[\s\S]*$", "")))
    steps.append(("u_auth", _rex(d, "u_nofrag", r"^([^/?#]*)")))
    steps.append(("u_hostport", _rr(d, "u_auth", r"^[^@]*@", "")))
    steps.append((
        "u_host",
        _rr(d, f"lower({_rex(d, 'u_hostport', r'^([^:]*)')})", r"\.+$", ""),
    ))
    steps.append(("u_port", _rex(d, "u_hostport", r":([0-9]+)$")))
    steps.append((
        "u_portpart",
        "CASE WHEN u_port = '' THEN '' "
        "WHEN u_scheme = 'http' AND u_port = '80' THEN '' "
        "WHEN u_scheme = 'https' AND u_port = '443' THEN '' "
        "ELSE ':' || u_port END",
    ))
    steps.append(("u_pathq", _rr(d, "u_nofrag", r"^[^/?#]*", "")))
    steps.append(("u_rawpath", _rex(d, "u_pathq", r"^([^?]*)")))
    steps.append(("u_rawq", _rex(d, "u_pathq", r"\?([\s\S]*)$")))

    # --- path canonicalization ---
    # %-escape normalization over the fixture inventory: unreserved '~'
    # decodes; reserved '/' only gets its hex uppercased (decoding %2F
    # would CHANGE the path structure — never do that).
    p = "CASE WHEN u_rawpath = '' THEN '/' ELSE u_rawpath END"
    p = f"replace(replace({p}, '%7e', '~'), '%7E', '~')"
    p = f"replace({p}, '%2f', '%2F')"
    p = _rr(d, p, r"/{2,}", "/")
    for _ in range(_DOT_PASSES):
        p = _rr(d, p, r"/\./", "/")
    p = _rr(d, p, r"/\.$", "/")
    for _ in range(_DOT_PASSES):
        # consume "<seg>/../" where <seg> has at least one non-dot char
        # (so '..' and '.' are never consumed as a parent segment)
        p = _rr(d, p, r"/[.]*[^/.][^/]*/\.\./", "/")
    p = _rr(d, p, r"/[.]*[^/.][^/]*/\.\.$", "/")
    for _ in range(2):
        # parent-of-root clamps to root (RFC 3986 §5.2.4)
        p = _rr(d, p, r"^/\.\.(/|$)", "/")
    steps.append(("u_cpath", p))

    # --- query canonicalization: split, drop tracking/empties, sort ---
    q = f"replace(u_rawq, '%2f', '%2F')"
    q = _sortjoin(d, _filter_params(d, _split(d, q, "&")), "&")
    steps.append(("u_cquery", q))
    steps.append((
        "u_qpart",
        "CASE WHEN u_cquery = '' THEN '' ELSE '?' || u_cquery END",
    ))

    steps.append((
        "canonical_url",
        "CASE WHEN u_scheme IN ('http', 'https') AND u_host <> '' THEN "
        "u_scheme || '://' || u_host || u_portpart || u_cpath || u_qpart "
        "ELSE NULL END",
    ))

    # --- dedup key: also fold www. and trailing path slash ---
    steps.append(("u_keyhost", _rr(d, "u_host", r"^www\.", "")))
    kp = _rr(d, "u_cpath", r"/+$", "")
    steps.append(("u_keypath", f"CASE WHEN {kp} = '' THEN '/' ELSE {kp} END"))
    steps.append((
        "url_key",
        "CASE WHEN u_scheme IN ('http', 'https') AND u_host <> '' THEN "
        "u_scheme || '://' || u_keyhost || u_portpart || u_keypath || u_qpart "
        "ELSE NULL END",
    ))

    # --- registrable domain (eTLD+1) ---
    rd3 = _rex(d, "u_host", r"([^.]+\.(?:" + _MULTI_SUFFIXES.replace(".", r"\.") + r"))$")
    rd2 = _rex(d, "u_host", r"([^.]+\.[^.]+)$")
    steps.append((
        "registrable_domain",
        f"CASE WHEN {rd3} <> '' THEN {rd3} "
        f"WHEN {rd2} <> '' THEN {rd2} ELSE u_host END",
    ))
    return steps


URL_STEP_NAMES = [name for name, _ in _steps("duckdb", "url")]

_INTERNAL = [n for n in URL_STEP_NAMES if n.startswith("u_")]


def url_parts_cols(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Spark side: append ``canonical_url``, ``url_key``,
    ``registrable_domain`` (and ``u_host``) to ``df``.  Pure Catalyst
    expressions — the whole chain stays inside whole-stage codegen."""
    for name, expr in _steps("spark", url_col):
        df = df.withColumn(name, F.expr(expr))
    keep = [n for n in _INTERNAL if n != "u_host"]
    return df.drop(*keep)


def url_parts_sql(inner_sql: str, url_col: str = "url") -> str:
    """DuckDB side: wrap ``inner_sql`` (a relation exposing ``url_col``)
    so the same step chain materializes the same columns."""
    rel = f"({inner_sql})"
    for name, expr in _steps("duckdb", url_col):
        rel = f"(SELECT *, {expr} AS {name} FROM {rel})"
    drop = ", ".join(n for n in _INTERNAL if n != "u_host")
    return f"SELECT * EXCLUDE ({drop}) FROM {rel}"


def host_col(url: str | Column) -> Column:
    """Standalone host extraction for ad-hoc use (lowercased, no port)."""
    u = F.col(url) if isinstance(url, str) else url
    hostport = F.regexp_replace(
        F.regexp_extract(
            F.regexp_replace(F.trim(u), r"^[A-Za-z][A-Za-z0-9+.-]*://", ""),
            r"^([^/?#]*)",
            1,
        ),
        r"^[^@]*@",
        "",
    )
    return F.regexp_replace(
        F.lower(F.regexp_extract(hostport, r"^([^:]*)", 1)), r"\.+$", ""
    )


# ---------------------------------------------------------------------------
# Deterministic messy-URL fixture (engine twin)
# ---------------------------------------------------------------------------


def synth_url_sql(dialect: str, base_mod: int = 211) -> str:
    """One SQL expression (per dialect) deriving a deliberately messy URL
    from ``doc_id``.  Identity fields (scheme, domain, path, params, the
    non-default port) derive from ``doc_id % base_mod`` so ~N/base_mod
    docs share each canonical target; messiness (case, www, default
    ports, fragments, tracking params, dot-segments, %-escapes, '&&',
    trailing slash) derives from raw ``doc_id``.  Spark consumes it via
    ``F.expr``; the oracle pastes the duckdb variant — one generator,
    two engines, byte-identical output."""
    s = "STRING" if dialect == "spark" else "VARCHAR"
    b = f"(doc_id % {base_mod})"
    h = f"md5(CAST({b} AS {s}))"
    scheme_l = f"CASE WHEN {b} % 2 = 0 THEN 'http' ELSE 'https' END"
    scheme = f"CASE WHEN doc_id % 4 < 2 THEN upper({scheme_l}) ELSE {scheme_l} END"
    userinfo = "CASE WHEN doc_id % 8 = 0 THEN 'crawler@' ELSE '' END"
    www = "CASE WHEN doc_id % 3 = 0 THEN 'WWW.' WHEN doc_id % 3 = 1 THEN 'www.' ELSE '' END"
    dom = (
        f"'ex' || CAST({b} % 23 AS {s}) || "
        f"CASE WHEN {b} % 5 = 0 THEN '.co.uk' WHEN {b} % 5 = 1 THEN '.org' ELSE '.com' END"
    )
    dom_cased = f"CASE WHEN doc_id % 10 = 0 THEN upper({dom}) ELSE {dom} END"
    hostdot = "CASE WHEN doc_id % 9 = 0 THEN '.' ELSE '' END"
    port = (
        f"CASE WHEN {b} % 7 = 3 THEN ':8080' "
        f"WHEN doc_id % 6 = 0 THEN (CASE WHEN {scheme_l} = 'http' THEN ':80' ELSE ':443' END) "
        "ELSE '' END"
    )
    lead = "CASE WHEN doc_id % 5 = 0 THEN '/skip/../' WHEN doc_id % 5 = 1 THEN '/./' WHEN doc_id % 5 = 2 THEN '//' ELSE '/' END"
    mid = "CASE WHEN doc_id % 7 = 0 THEN '/./' WHEN doc_id % 7 = 1 THEN '//' ELSE '/' END"
    tilde = "CASE WHEN doc_id % 2 = 0 THEN '%7e' ELSE '~' END"
    trail = "CASE WHEN doc_id % 11 = 0 THEN '/' ELSE '' END"
    path = (
        f"{lead} || 'P' || CAST({b} % 13 AS {s}) || {mid} || "
        f"{tilde} || substr({h}, 1, 4) || {trail}"
    )
    v1 = f"CAST({b} % 11 AS {s})"
    v2 = f"substr({h}, 5, 3)"
    qcore = (
        f"CASE WHEN doc_id % 2 = 0 THEN 'a=' || {v1} || '&b=' || {v2} "
        f"ELSE 'b=' || {v2} || '&a=' || {v1} END"
    )
    tracking = (
        f"CASE WHEN doc_id % 3 = 0 THEN '&utm_source=rss&fbclid=' || substr({h}, 9, 6) "
        "WHEN doc_id % 13 = 1 THEN '&ref=home' ELSE '' END"
    )
    amp = "CASE WHEN doc_id % 7 = 0 THEN '&&' ELSE '' END"
    query = (
        f"CASE WHEN {b} % 11 = 5 THEN '' "
        f"ELSE '?' || {qcore} || {tracking} || {amp} END"
    )
    frag = f"CASE WHEN doc_id % 5 = 0 THEN '#Sec' || CAST(doc_id % 3 AS {s}) ELSE '' END"
    return (
        f"{scheme} || '://' || {userinfo} || {www} || {dom_cased} || {hostdot}"
        f" || {port} || {path} || {query} || {frag}"
    )
