"""URL canonicalization / web-identity functions for crawl pipelines.

Every web-scale training corpus starts from (url, payload) pairs, and the
FIRST dedup axis is the URL itself: the same page is crawled as
``HTTP://WWW.Example.COM:80/a/./b/../c?utm_source=rss&b=2&a=1#frag`` and
``http://example.com/a/c?a=1&b=2``.  This module provides:

- ``canonical url`` — RFC-3986-style normalization: scheme/host lowercase,
  userinfo stripped, default ports removed (after leading-zero strip, so
  ``:0080`` is default too), trailing host dot removed, bracketed IPv6
  hosts parsed (``[2001:DB8::1]:8080`` keeps its brackets, lowercased),
  fragment stripped, duplicate-slash collapse, dot-segment resolution
  (bounded unroll; paths whose ``..`` nesting exceeds the unroll are
  EXCLUDED — canonical NULL — never emitted with literal dot segments),
  full percent-escape normalization (ALL unreserved octets decode, every
  other escape's hex uppercases — RFC 3986 §2.3/§6.2.2), query params
  sorted with tracking params (``utm_*``/``fbclid``/``gclid``/...)
  dropped.  Non-ASCII (IDN) hosts are excluded (NULL) rather than
  mismerged; punycode ``xn--`` labels pass through as opaque labels.
- ``url key`` — the dedup identity: canonical url with the ``www.`` host
  prefix folded (only when the remainder keeps ≥ 2 labels, so ``www.ck``
  — a registrable site per the PSL exception — never merges into the
  bare TLD) and any trailing path slash removed.
- ``registrable domain`` — eTLD+1 via the vendored public-suffix rules
  in ``functions/psl.py`` (normal + wildcard ``*.ck`` + exception
  ``!www.ck`` classes; the full publicsuffix.org file is a data swap via
  ``psl.load_psl(path)``).  IP-literal hosts (all-numeric IPv4 labels,
  bracketed IPv6) return the host verbatim instead of a meaningless
  last-two-octets split.

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
which resolves nesting up to that depth (property-tested).  Deeper
nesting leaves a literal ``..`` segment, which the canonical-validity
guard catches: such URLs canonicalize to NULL (excluded from identity)
instead of shipping a path that still contains dot segments.  Dot-only
segments other than ``.``/``..`` (e.g. ``...``) are treated as opaque —
the guard that stops ``/../..`` from being eaten as ``<seg>/..`` requires
one non-dot char in the consumed segment.

Percent-escapes: the path/query string is split on ``%`` and each piece
re-assembled through a branch-free per-piece CASE (decode if the two
leading hex chars are an unreserved octet, else uppercase them) — array
``transform``/``list_transform`` lambdas, still pure engine expressions
in both dialects.  Escapes of reserved octets (``%2F``, ``%3D``, ...)
are NEVER decoded — that would change the URL's structure.

Reference parity note: the reference engine (MLnick/hive-udf) has no URL
surface — this family is part of the mandated training-data-pipeline
extensions (SURVEY.md §2.3), built on public RFC 3986 semantics only.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from hive_udf_spark.functions.psl import (
    EXCEPTION_RULES,
    NORMAL_RULES,
    WILDCARD_RULES,
)

__all__ = [
    "url_parts_cols",
    "url_parts_sql",
    "synth_url_sql",
    "URL_STEP_NAMES",
    "TRACKING_PARAM_PATTERN",
]

# Params dropped from the canonical query string (anchored against the
# whole `key=value` token; `(=|$)` also catches bare flags).  Bare `ref`
# is deliberately NOT here: it is content-bearing on many real sites
# (branch selectors, referenced-resource ids) — only the known tracking
# spellings are dropped.
TRACKING_PARAM_PATTERN = (
    r"^(utm_[^=&]*|fbclid|gclid|msclkid|igshid|ref_src)(=|$)"
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
    # Spark split() takes a regex; '&' / '%' are regex-literal so both agree.
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


# ---------------------------------------------------------------------------
# Percent-escape normalization (RFC 3986 §2.3 unreserved + §6.2.2 case)
# ---------------------------------------------------------------------------


def _pct_lambda(d: str) -> str:
    """Per-piece lambda for the %-split array: decode the two leading
    hex chars when they spell an unreserved octet (ALPHA / DIGIT / - . _
    ~), uppercase them otherwise, pass stray '%' through untouched."""
    hh = "upper(substr(s, 1, 2))"
    unres = (
        f"(({hh} >= '41' AND {hh} <= '5A') OR ({hh} >= '61' AND {hh} <= '7A')"
        f" OR ({hh} >= '30' AND {hh} <= '39')"
        f" OR {hh} IN ('2D', '2E', '5F', '7E'))"
    )
    dec = (
        f"decode(unhex({hh}), 'UTF-8')" if d == "spark" else f"decode(unhex({hh}))"
    )
    hex2 = _rlike(d, hh, "^[0-9A-F]{2}$")
    body = (
        f"CASE WHEN NOT {hex2} THEN '%' || s "
        f"WHEN {unres} THEN {dec} || substr(s, 3) "
        f"ELSE '%' || {hh} || substr(s, 3) END"
    )
    return f"s -> {body}"


def _pct_norm(d: str, arr: str) -> str:
    """Reassemble a %-split array with every escape normalized."""
    lam = _pct_lambda(d)
    if d == "spark":
        return (
            f"element_at({arr}, 1) || array_join("
            f"transform(slice({arr}, 2, greatest(size({arr}) - 1, 0)), {lam}), '')"
        )
    return (
        f"{arr}[1] || coalesce(array_to_string("
        f"list_transform({arr}[2:], {lam}), ''), '')"
    )


# ---------------------------------------------------------------------------
# Registrable domain from the PSL rule classes
# ---------------------------------------------------------------------------


def _psl_alt(rules: tuple[str, ...]) -> str:
    """Regex alternation of literal rules, longest (most labels, then
    longest string) first so leftmost-first engines pick the most
    specific suffix."""
    ordered = sorted(rules, key=lambda r: (-r.count("."), -len(r), r))
    return "|".join(r.replace(".", r"\.") for r in ordered)


def _rd_expr(d: str) -> str:
    rdw = _rex(d, "u_host", r"([^.]+\.[^.]+\.(?:" + _psl_alt(WILDCARD_RULES) + r"))$")
    rd3 = _rex(d, "u_host", r"([^.]+\.(?:" + _psl_alt(NORMAL_RULES) + r"))$")
    rd2 = _rex(d, "u_host", r"([^.]+\.[^.]+)$")
    exc = " ".join(
        f"WHEN u_host = '{e}' OR u_host LIKE '%.{e}' THEN '{e}'"
        for e in EXCEPTION_RULES
    )
    ip4 = _rlike(d, "u_host", r"^[0-9]+([.][0-9]+)*$")
    return (
        # IP literals are their own identity — never split into octets.
        "CASE WHEN substr(u_host, 1, 1) = '[' THEN u_host "
        f"WHEN {ip4} THEN u_host "
        f"{exc} "
        f"WHEN {rdw} <> '' THEN {rdw} "
        f"WHEN {rd3} <> '' THEN {rd3} "
        f"WHEN {rd2} <> '' THEN {rd2} ELSE u_host END"
    )


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
    # Bracketed IPv6 hosts keep their brackets (lowercased); a '[' with
    # no closing ']' extracts '' -> canonical NULL (excluded, not merged).
    bhost = _rex(d, "u_hostport", r"^(\[[^\]]+\])")
    nhost = _rr(d, "lower(" + _rex(d, "u_hostport", r"^([^:]*)") + ")", r"\.+$", "")
    steps.append((
        "u_host",
        "CASE WHEN substr(u_hostport, 1, 1) = '[' THEN "
        f"lower({bhost}) ELSE {nhost} END",
    ))
    # ':([0-9]+)$' works for both host forms: '[::1]:8080' matches, a
    # bare '[::1]' ends in ']' so it can't.
    steps.append(("u_port", _rex(d, "u_hostport", r":([0-9]+)$")))
    # Leading-zero strip so ':0080' compares as the default it is.
    zs = _rr(d, "u_port", r"^0+", "")
    steps.append((
        "u_portn",
        f"CASE WHEN u_port = '' THEN '' WHEN {zs} = '' THEN '0' ELSE {zs} END",
    ))
    steps.append((
        "u_portpart",
        "CASE WHEN u_portn = '' THEN '' "
        "WHEN u_scheme = 'http' AND u_portn = '80' THEN '' "
        "WHEN u_scheme = 'https' AND u_portn = '443' THEN '' "
        "ELSE ':' || u_portn END",
    ))
    steps.append(("u_pathq", _rr(d, "u_nofrag", r"^[^/?#]*", "")))
    steps.append(("u_rawpath", _rex(d, "u_pathq", r"^([^?]*)")))
    steps.append(("u_rawq", _rex(d, "u_pathq", r"\?([\s\S]*)$")))

    # --- path canonicalization ---
    # Full %-escape normalization FIRST (decoded '.' from %2E takes part
    # in dot-segment resolution, per RFC 3986 §6.2.2.3), then slash
    # collapse and the bounded dot-segment unroll.
    steps.append(("u_path0", "CASE WHEN u_rawpath = '' THEN '/' ELSE u_rawpath END"))
    steps.append(("u_parr", _split(d, "u_path0", "%")))
    p = _pct_norm(d, "u_parr")
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

    # --- query canonicalization: %-normalize, split, drop tracking/
    # empties, sort.  Unreserved decode can't produce '&'/'=' (both are
    # reserved octets), so normalizing before the split is safe. ---
    steps.append(("u_qarr", _split(d, "u_rawq", "%")))
    q = _sortjoin(
        d, _filter_params(d, _split(d, _pct_norm(d, "u_qarr"), "&")), "&"
    )
    steps.append(("u_cquery", q))
    steps.append((
        "u_qpart",
        "CASE WHEN u_cquery = '' THEN '' ELSE '?' || u_cquery END",
    ))

    # Canonical validity: http(s), a non-empty printable-ASCII host (IDN
    # hosts are excluded — folding them needs punycode, not a merge
    # guess), and no dot segment the bounded unroll failed to resolve.
    ascii_guard = _rlike(d, "u_host", "[^!-~]")
    dotseg_guard = _rlike(d, "u_cpath", r"(^|/)\.\.(/|$)")
    ok = (
        "u_scheme IN ('http', 'https') AND u_host <> '' "
        f"AND NOT {ascii_guard} AND NOT {dotseg_guard}"
    )
    steps.append((
        "canonical_url",
        f"CASE WHEN {ok} THEN "
        "u_scheme || '://' || u_host || u_portpart || u_cpath || u_qpart "
        "ELSE NULL END",
    ))

    # --- dedup key: fold www. (only when ≥ 2 labels remain — 'www.ck'
    # is a registrable site, not a www of '.ck') and trailing slash ---
    www_guard = _rlike(d, "u_host", r"^www\.[^.]+\.")
    www_strip = _rr(d, "u_host", r"^www\.", "")
    steps.append((
        "u_keyhost",
        f"CASE WHEN {www_guard} THEN {www_strip} ELSE u_host END",
    ))
    kp = _rr(d, "u_cpath", r"/+$", "")
    steps.append(("u_keypath", f"CASE WHEN {kp} = '' THEN '/' ELSE {kp} END"))
    steps.append((
        "url_key",
        f"CASE WHEN {ok} THEN "
        "u_scheme || '://' || u_keyhost || u_portpart || u_keypath || u_qpart "
        "ELSE NULL END",
    ))

    # --- registrable domain (eTLD+1, functions/psl.py rule classes) ---
    steps.append(("registrable_domain", _rd_expr(d)))
    return steps


URL_STEP_NAMES = [name for name, _ in _steps("duckdb", "url")]

_INTERNAL = [n for n in URL_STEP_NAMES if n.startswith("u_")]


# Parsed-Column cache (r8 verdict item 5): generating the step strings
# is cheap but F.expr() parsing of the big trees is not — each call
# used to re-parse ~0.5 s of expressions.  Unresolved Columns are
# session-independent, so one parse per (url_col) serves every query
# and session in the process.
_SPARK_STEPS_CACHE: dict[str, list[tuple[str, Column]]] = {}


def url_parts_cols(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Spark side: append ``canonical_url``, ``url_key``,
    ``registrable_domain`` (and ``u_host``) to ``df``.  Pure Catalyst
    expressions — the whole chain stays inside whole-stage codegen."""
    steps = _SPARK_STEPS_CACHE.get(url_col)
    if steps is None:
        steps = [(name, F.expr(e)) for name, e in _steps("spark", url_col)]
        _SPARK_STEPS_CACHE[url_col] = steps
    for name, col in steps:
        df = df.withColumn(name, col)
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
    """Standalone host extraction for ad-hoc use (lowercased, no port;
    bracketed IPv6 hosts keep their brackets)."""
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
    name = F.regexp_replace(
        F.lower(F.regexp_extract(hostport, r"^([^:]*)", 1)), r"\.+$", ""
    )
    bracketed = F.lower(F.regexp_extract(hostport, r"^(\[[^\]]+\])", 1))
    return F.when(hostport.startswith("["), bracketed).otherwise(name)


# ---------------------------------------------------------------------------
# Deterministic messy-URL fixture (engine twin)
# ---------------------------------------------------------------------------


def synth_url_sql(dialect: str, base_mod: int = 211) -> str:
    """One SQL expression (per dialect) deriving a deliberately messy URL
    from ``doc_id``.  Identity fields (scheme, domain — including IPv4
    and bracketed-IPv6 literal slices — path, params, the non-default
    port) derive from ``doc_id % base_mod`` so ~N/base_mod docs share
    each canonical target; messiness (case, www, default ports incl.
    zero-padded, fragments, tracking params, dot-segments, %-escape
    spellings, '&&', trailing slash, an over-deep ``..`` chain that
    canonicalizes to NULL) derives from raw ``doc_id``.  Spark consumes
    it via ``F.expr``; the oracle pastes the duckdb variant — one
    generator, two engines, byte-identical output."""
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
    # Host classes: name (with www/trailing-dot messiness), IPv4 literal,
    # bracketed IPv6 literal (case messiness folds via lower()).
    namehost = f"{www} || {dom_cased} || {hostdot}"
    ip4 = f"'198.51.' || CAST({b} % 4 AS {s}) || '.' || CAST({b} % 7 AS {s})"
    ip6_l = f"'[2001:db8::' || CAST({b} % 5 AS {s}) || ']'"
    ip6 = f"CASE WHEN doc_id % 10 = 0 THEN upper({ip6_l}) ELSE {ip6_l} END"
    host = (
        f"CASE WHEN {b} % 19 = 7 THEN {ip4} "
        f"WHEN {b} % 19 = 11 THEN {ip6} "
        f"ELSE {namehost} END"
    )
    port = (
        f"CASE WHEN {b} % 7 = 3 THEN ':8080' "
        f"WHEN doc_id % 6 = 0 THEN (CASE WHEN {scheme_l} = 'http' THEN ':80' ELSE ':443' END) "
        f"WHEN doc_id % 21 = 5 THEN (CASE WHEN {scheme_l} = 'http' THEN ':0080' ELSE ':00443' END) "
        "ELSE '' END"
    )
    lead = (
        # over-deep '..' chain: resolves past the unroll depth -> the
        # whole URL is excluded from canonical identity (NULL)
        "CASE WHEN doc_id % 53 = 17 THEN '/u1/u2/../../../../../bad/' "
        "WHEN doc_id % 5 = 0 THEN '/skip/../' WHEN doc_id % 5 = 1 THEN '/./' "
        "WHEN doc_id % 5 = 2 THEN '//' ELSE '/' END"
    )
    mid = "CASE WHEN doc_id % 7 = 0 THEN '/./' WHEN doc_id % 7 = 1 THEN '//' ELSE '/' END"
    tilde = "CASE WHEN doc_id % 2 = 0 THEN '%7e' ELSE '~' END"
    # unreserved %50 <-> 'P' fold; reserved %3a only uppercases
    pseg = f"CASE WHEN doc_id % 8 = 3 THEN '%50' ELSE 'P' END || CAST({b} % 13 AS {s})"
    colon = "CASE WHEN doc_id % 2 = 0 THEN '%3a' ELSE '%3A' END"
    trail = "CASE WHEN doc_id % 11 = 0 THEN '/' ELSE '' END"
    path = (
        f"{lead} || {pseg} || {mid} || "
        f"{tilde} || substr({h}, 1, 4) || {colon} || substr({h}, 5, 2) || {trail}"
    )
    v1 = f"CAST({b} % 11 AS {s})"
    v2 = f"substr({h}, 5, 3)"
    qcore = (
        f"CASE WHEN doc_id % 2 = 0 THEN 'a=' || {v1} || '&b=' || {v2} "
        f"ELSE 'b=' || {v2} || '&a=' || {v1} END"
    )
    # content-bearing ref param (identity: derives from b) — must SURVIVE
    refp = f"CASE WHEN {b} % 6 = 2 THEN '&ref=' || CAST({b} % 3 AS {s}) ELSE '' END"
    # %2a is sub-delim (uppercase only); %4b is unreserved 'K' (decodes)
    star = f"'&c=' || CASE WHEN doc_id % 4 < 2 THEN '%2a' ELSE '%2A' END"
    kay = "CASE WHEN doc_id % 2 = 0 THEN '%4b' ELSE 'K' END"
    tracking = (
        f"CASE WHEN doc_id % 3 = 0 THEN '&utm_source=rss&fbclid=' || substr({h}, 9, 6) "
        "WHEN doc_id % 13 = 1 THEN '&ref_src=tw' "
        f"WHEN doc_id % 13 = 2 THEN '&igshid=' || substr({h}, 11, 4) ELSE '' END"
    )
    amp = "CASE WHEN doc_id % 7 = 0 THEN '&&' ELSE '' END"
    query = (
        f"CASE WHEN {b} % 11 = 5 THEN '' "
        f"ELSE '?' || {qcore} || {refp} || {star} || {kay} || {tracking} || {amp} END"
    )
    frag = f"CASE WHEN doc_id % 5 = 0 THEN '#Sec' || CAST(doc_id % 3 AS {s}) ELSE '' END"
    return (
        f"{scheme} || '://' || {userinfo} || {host}"
        f" || {port} || {path} || {query} || {frag}"
    )
