"""SQL-surface registration: the reference's `CREATE TEMPORARY FUNCTION`
UX, natively on Spark.

The reference is consumed from SQL (`SELECT approx_distinct(values) FROM
src` — UDAFCardinalityEstimator.java:66-68, registered via Hive's CREATE
TEMPORARY FUNCTION). ``register_sql(spark)`` recreates that surface with
Spark 4 SQL UDFs (pure Catalyst expressions — JVM-side, codegen-friendly,
zero Python in the hot path) plus pandas grouped-agg registrations for the
Linear Counting path:

- ``sketch_struct(bin)`` — wrap a raw HLL sketch into the reference's
  result struct {type, cardinality, binary}; compose with the native
  aggregate: ``SELECT sketch_struct(hll_sketch_agg(x)) FROM t``.
- ``sketch_estimate(bin)``, ``sketch_union(a, b)`` — the scalar utilities
  the reference's stub UDF intended (UDFCardinalityEstimator.java:30-48).
- ``sketch_intersect_estimate(a, b)`` — inclusion–exclusion intersection,
  completing the stub's documented TODO ("potential set intersection and
  other utils").
- ``lc_bucket(x, size_bytes)`` / ``lc_estimate(occupied, size_bytes)`` —
  the Linear Counting surface in SQL, composed with the host's exact
  distinct: ``SELECT lc_estimate(count(DISTINCT lc_bucket(x, 1000000)),
  1000000) FROM t GROUP BY k``. Same Tier-B formulation as
  functions.lc.lc_cardinality: at most m bucket ids per group cross the
  shuffle, map-side partial distinct included.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

_SQL_FUNCTIONS = {
    "sketch_struct": """
        CREATE OR REPLACE TEMPORARY FUNCTION sketch_struct(bin BINARY)
        RETURNS STRUCT<type: STRING, cardinality: BIGINT, binary: BINARY>
        RETURN CASE
                    -- empty sketch (estimate 0) <=> no non-null values were
                    -- aggregated; the reference returns NULL for that
                    -- (UDAFCardinalityEstimator.java:329-331)
                    WHEN bin IS NULL OR hll_sketch_estimate(bin) = 0 THEN NULL
                    ELSE named_struct(
                        'type', 'HLL',
                        'cardinality', hll_sketch_estimate(bin),
                        'binary', bin) END
    """,
    "sketch_estimate": """
        CREATE OR REPLACE TEMPORARY FUNCTION sketch_estimate(bin BINARY)
        RETURNS BIGINT
        RETURN hll_sketch_estimate(bin)
    """,
    # allowDifferentLgConfigK=true: same lenient default as the Python
    # sketch_union (mixed-precision unions degrade instead of failing
    # mid-query); sketch_union_strict mirrors the reference's raise-on-
    # incompatible-merge behavior (UDAFCardinalityEstimator.java:399-414).
    "sketch_union": """
        CREATE OR REPLACE TEMPORARY FUNCTION sketch_union(a BINARY, b BINARY)
        RETURNS BINARY
        RETURN CASE WHEN a IS NULL THEN b WHEN b IS NULL THEN a
                    ELSE hll_union(a, b, true) END
    """,
    "sketch_union_strict": """
        CREATE OR REPLACE TEMPORARY FUNCTION sketch_union_strict(a BINARY, b BINARY)
        RETURNS BINARY
        RETURN CASE WHEN a IS NULL THEN b WHEN b IS NULL THEN a
                    ELSE hll_union(a, b, false) END
    """,
    "sketch_jaccard_estimate": """
        CREATE OR REPLACE TEMPORARY FUNCTION sketch_jaccard_estimate(a BINARY, b BINARY)
        RETURNS DOUBLE
        RETURN CASE WHEN a IS NULL OR b IS NULL THEN NULL
                    WHEN hll_sketch_estimate(hll_union(a, b, true)) <= 0 THEN 0.0D
                    ELSE least(1.0D, greatest(0.0D,
                         CAST(hll_sketch_estimate(a) + hll_sketch_estimate(b)
                              - hll_sketch_estimate(hll_union(a, b, true)) AS DOUBLE)
                         / CAST(hll_sketch_estimate(hll_union(a, b, true)) AS DOUBLE))) END
    """,
    "sketch_difference_estimate": """
        CREATE OR REPLACE TEMPORARY FUNCTION sketch_difference_estimate(a BINARY, b BINARY)
        RETURNS BIGINT
        RETURN CASE WHEN a IS NULL OR b IS NULL THEN NULL
                    ELSE greatest(0L,
                         hll_sketch_estimate(hll_union(a, b, true))
                         - hll_sketch_estimate(b)) END
    """,
    "sketch_intersect_estimate": """
        CREATE OR REPLACE TEMPORARY FUNCTION sketch_intersect_estimate(a BINARY, b BINARY)
        RETURNS BIGINT
        RETURN CASE WHEN a IS NULL OR b IS NULL THEN NULL
                    ELSE greatest(0L,
                         hll_sketch_estimate(a) + hll_sketch_estimate(b)
                         - hll_sketch_estimate(hll_union(a, b))) END
    """,
    # Linear Counting in SQL, fully JVM-side (mirrors functions.lc's
    # Tier B): SELECT lc_estimate(count(DISTINCT lc_bucket(x, 1000000)),
    # 1000000) FROM t GROUP BY k
    "lc_bucket": """
        CREATE OR REPLACE TEMPORARY FUNCTION lc_bucket(x BIGINT, size_bytes BIGINT)
        RETURNS BIGINT
        -- NULL-propagating: xxhash64(NULL) is a constant, not NULL
        RETURN CASE WHEN x IS NOT NULL THEN pmod(xxhash64(x), size_bytes * 8) END
    """,
    # estimate-only LC result struct (binary NULL — a scalar macro cannot
    # assemble the dense bitmap; lc_table persists real ones). A SQL UDF
    # rather than inline named_struct: the analyzer hoists foldable args
    # of post-aggregation projections into the Aggregate, turning inline
    # literal field names into attributes it then rejects; UDF bodies
    # inline after that pass.
    "lc_struct": """
        CREATE OR REPLACE TEMPORARY FUNCTION lc_struct(card BIGINT)
        RETURNS STRUCT<type: STRING, cardinality: BIGINT, binary: BINARY>
        RETURN CASE WHEN card IS NULL THEN NULL
                    ELSE named_struct('type', 'LC', 'cardinality', card,
                                      'binary', CAST(NULL AS BINARY)) END
    """,
    "lc_estimate": """
        CREATE OR REPLACE TEMPORARY FUNCTION lc_estimate(occupied BIGINT, size_bytes BIGINT)
        RETURNS BIGINT
        RETURN CASE WHEN occupied IS NULL THEN NULL
                    WHEN occupied >= size_bytes * 8 THEN size_bytes * 8
                    ELSE CAST(round(-(size_bytes * 8)
                         * ln((CAST(size_bytes * 8 AS DOUBLE) - occupied)
                              / CAST(size_bytes * 8 AS DOUBLE))) AS BIGINT) END
    """,
    # ---- text-analysis scalar family (mirrors functions.text exactly;
    # SQL users get the LLM-pipeline primitives without a Python import) --
    "token_count": """
        CREATE OR REPLACE TEMPORARY FUNCTION token_count(text STRING)
        RETURNS INT
        RETURN size(filter(split(text, '\\\\s+'), t -> t != ''))
    """,
    "bpeish_token_count": """
        CREATE OR REPLACE TEMPORARY FUNCTION bpeish_token_count(text STRING)
        RETURNS INT
        RETURN regexp_count(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\\\s]+')
    """,
    "uniq_token_ratio": """
        CREATE OR REPLACE TEMPORARY FUNCTION uniq_token_ratio(text STRING)
        RETURNS DOUBLE
        RETURN CASE WHEN token_count(text) = 0 THEN NULL
                    ELSE round(CAST(size(array_distinct(
                             filter(split(text, '\\\\s+'), t -> t != ''))) AS DOUBLE)
                         / CAST(token_count(text) AS DOUBLE), 6) END
    """,
    "doc_fingerprint": """
        CREATE OR REPLACE TEMPORARY FUNCTION doc_fingerprint(text STRING)
        RETURNS STRING
        RETURN md5(lower(trim(regexp_replace(text, '\\\\s+', ' '))))
    """,
    "jaccard_tokens": """
        CREATE OR REPLACE TEMPORARY FUNCTION jaccard_tokens(a STRING, b STRING)
        RETURNS DOUBLE
        RETURN CASE
            WHEN size(array_union(array_distinct(filter(split(a, '\\\\s+'), t -> t != '')),
                                  array_distinct(filter(split(b, '\\\\s+'), t -> t != '')))) = 0
            THEN NULL
            ELSE CAST(size(array_intersect(
                         array_distinct(filter(split(a, '\\\\s+'), t -> t != '')),
                         array_distinct(filter(split(b, '\\\\s+'), t -> t != '')))) AS DOUBLE)
                 / CAST(size(array_union(
                         array_distinct(filter(split(a, '\\\\s+'), t -> t != '')),
                         array_distinct(filter(split(b, '\\\\s+'), t -> t != '')))) AS DOUBLE) END
    """,
    # deterministic hash-sampling membership (the chunking.stratified_sample
    # / mixture predicate, callable from SQL; seed pinned per call site)
    # seed is INT (not BIGINT): xxhash64 folds the argument TYPE into the
    # hash, and the Python surface (functions.hashing.fast_hash64) seeds
    # with an IntegerType literal — mismatched widths hash differently.
    "sample_bucket_ppm": """
        CREATE OR REPLACE TEMPORARY FUNCTION sample_bucket_ppm(id BIGINT, seed INT)
        RETURNS BIGINT
        RETURN pmod(xxhash64(seed, id), 1000000)
    """,
    # ---- KMV bottom-k sketch scalar family (mirrors functions.kmv; the
    # BUILD is relational (kmv_table) since SQL UDFs can't aggregate, but
    # estimate/merge/set-algebra over stored sketches are plain SQL) ----
    "kmv_hash60": """
        CREATE OR REPLACE TEMPORARY FUNCTION kmv_hash60(x STRING, seed INT)
        RETURNS BIGINT
        RETURN CAST(conv(substr(md5(concat(seed, ':', x)), 1, 15), 16, 10) AS BIGINT)
    """,
    "kmv_estimate": """
        CREATE OR REPLACE TEMPORARY FUNCTION kmv_estimate(sk ARRAY<BIGINT>, k INT)
        RETURNS BIGINT
        RETURN CASE WHEN sk IS NULL THEN NULL
                    WHEN size(sk) < k THEN CAST(size(sk) AS BIGINT)
                    ELSE CAST(floor((k - 1) * 1152921504606846976.0D
                              / CAST(element_at(sk, k) AS DOUBLE)) AS BIGINT) END
    """,
    "kmv_union": """
        CREATE OR REPLACE TEMPORARY FUNCTION kmv_union(a ARRAY<BIGINT>, b ARRAY<BIGINT>, k INT)
        RETURNS ARRAY<BIGINT>
        RETURN CASE WHEN a IS NULL THEN slice(array_sort(b), 1, k)
                    WHEN b IS NULL THEN slice(array_sort(a), 1, k)
                    ELSE slice(array_sort(array_distinct(concat(a, b))), 1, k) END
    """,
    "kmv_jaccard": """
        CREATE OR REPLACE TEMPORARY FUNCTION kmv_jaccard(a ARRAY<BIGINT>, b ARRAY<BIGINT>, k INT)
        RETURNS DOUBLE
        RETURN CASE WHEN a IS NULL OR b IS NULL THEN NULL
                    WHEN size(kmv_union(a, b, k)) = 0 THEN NULL
                    ELSE CAST(size(array_intersect(kmv_union(a, b, k),
                                                   array_intersect(a, b))) AS DOUBLE)
                         / CAST(size(kmv_union(a, b, k)) AS DOUBLE) END
    """,
    # ---- quantile-sample sketch scalars (mirrors functions.qsketch: the
    # BUILD is relational (quantile_sketch_table); quantile reads and
    # lossless unions over stored sketches are plain SQL) ----
    "qsketch_quantile": """
        CREATE OR REPLACE TEMPORARY FUNCTION qsketch_quantile(
            qs ARRAY<STRUCT<h: BIGINT, v: BIGINT>>, q DOUBLE)
        RETURNS BIGINT
        RETURN CASE
            WHEN qs IS NULL OR size(qs) = 0 THEN NULL
            ELSE element_at(
                array_sort(transform(qs, p -> p.v)),
                CAST(floor(q * CAST(size(qs) - 1 AS DOUBLE)) AS INT) + 1) END
    """,
    "qsketch_union": """
        CREATE OR REPLACE TEMPORARY FUNCTION qsketch_union(
            a ARRAY<STRUCT<h: BIGINT, v: BIGINT>>,
            b ARRAY<STRUCT<h: BIGINT, v: BIGINT>>, k INT)
        RETURNS ARRAY<STRUCT<h: BIGINT, v: BIGINT>>
        RETURN CASE WHEN a IS NULL THEN slice(array_sort(b), 1, k)
                    WHEN b IS NULL THEN slice(array_sort(a), 1, k)
                    ELSE slice(array_sort(concat(a, b)), 1, k) END
    """,
}


def register_sql(spark: SparkSession) -> None:
    """Register the engine's SQL functions on this session.

    After this, plain ``spark.sql`` queries have the reference's surface:

        SELECT o_orderpriority,
               sketch_struct(hll_sketch_agg(o_custkey)) AS s
        FROM orders GROUP BY o_orderpriority

        SELECT sketch_intersect_estimate(a.s.binary, b.s.binary) FROM ...
    """
    for ddl in _SQL_FUNCTIONS.values():
        spark.sql(ddl)


# ---------------------------------------------------------------------------
# One-name SQL aggregate: the reference's exact UX,
#   SELECT approx_distinct(values) FROM src
# (UDAFCardinalityEstimator.java:66-68). Spark SQL UDFs cannot declare
# aggregates, so the one-name form is provided as a macro expansion over
# the registered JVM surface: approx_distinct(x[, 'hll'[, b]]) rewrites to
# sketch_struct(hll_sketch_agg(x, b)) BEFORE parsing — the executed plan
# is the native Tier-A aggregate (partial+final ObjectHashAggregate), not
# a Python UDAF. Re-aggregation of stored sketches stays the documented
# composed form sketch_struct(hll_union_agg(s.binary)).
# ---------------------------------------------------------------------------

_HLL_DEFAULT_B = 16
_LC_DEFAULT_SIZE = 1_000_000  # UDAFCardinalityEstimator.java:90


def _split_top_level_args(argstr: str) -> list[str]:
    out, depth, cur, quote = [], 0, [], None
    for ch in argstr:
        if quote:
            cur.append(ch)
            if ch == quote:
                quote = None
            continue
        if ch in "'\"":
            quote = ch
            cur.append(ch)
        elif ch in "([":
            depth += 1
            cur.append(ch)
        elif ch in ")]":
            depth -= 1
            cur.append(ch)
        elif ch == "," and depth == 0:
            out.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
    if cur or out:
        out.append("".join(cur).strip())
    return out


def _masked_spans(query: str) -> list[bool]:
    """Per-character mask: True where the character sits inside a quoted
    string literal (single or double, with doubled-quote escapes) or a SQL
    comment (``-- …`` to end of line, ``/* … */``). The macro expander
    skips ``approx_distinct(`` occurrences at masked positions so literals
    like ``SELECT 'approx_distinct(x)'`` pass through untouched."""
    n = len(query)
    mask = [False] * n
    i = 0
    while i < n:
        ch = query[i]
        if ch in "'\"":
            j = i + 1
            while j < n:
                if query[j] == ch:
                    if j + 1 < n and query[j + 1] == ch:  # doubled-quote escape
                        j += 2
                        continue
                    break
                j += 1
            end = min(j + 1, n)
            for k in range(i, end):
                mask[k] = True
            i = end
        elif ch == "-" and i + 1 < n and query[i + 1] == "-":
            j = query.find("\n", i)
            end = n if j == -1 else j
            for k in range(i, end):
                mask[k] = True
            i = end
        elif ch == "/" and i + 1 < n and query[i + 1] == "*":
            j = query.find("*/", i + 2)
            end = n if j == -1 else j + 2
            for k in range(i, end):
                mask[k] = True
            i = end
        else:
            i += 1
    return mask


def expand_approx_distinct(query: str, merge: bool = False) -> str:
    """Rewrite every top-level ``approx_distinct(...)`` call in ``query``
    into the composed JVM aggregate, mirroring the reference's parameter
    contract ``(x[, type[, precision]])`` with type defaulting to 'hll'
    and b (lgConfigK) to 16 (UDAFCardinalityEstimator.java:89, :100-148).
    Occurrences inside string literals or comments are left untouched.

    ``merge=True`` produces the reference's STRUCT-input re-aggregation
    path instead (UDAFCardinalityEstimator.java:259-265): the argument is
    a previously produced sketch struct and the expansion unions the
    ``binary`` fields. Extra parameters are rejected on this path, as in
    the reference ("we can only merge compatible data structures",
    :190-193).

    'lc' mode (``approx_distinct(x, 'lc'[, size_bytes])``, reference LC
    branch UDAFCardinalityEstimator.java:112-124 with LC_DEFAULT_SIZE at
    :90) expands to the registered lc_estimate/lc_bucket composition —
    the same pure-JVM two-phase distinct plan as
    ``functions.lc.lc_cardinality``. The result struct is ESTIMATE-ONLY:
    its ``binary`` field is NULL, because a scalar macro cannot assemble
    the dense bitmap; for persisted re-aggregable LC sketch tables use
    ``functions.lc.lc_table`` (relational facade) or the DataFrame
    ``approx_distinct(kind='lc')`` aggregate.
    """
    import re

    out, pos = [], 0
    pat = re.compile(r"\bapprox_distinct\s*\(", re.IGNORECASE)
    masked = _masked_spans(query)
    while True:
        m = pat.search(query, pos)
        if not m:
            out.append(query[pos:])
            return "".join(out)
        if masked[m.start()]:
            out.append(query[pos : m.end()])
            pos = m.end()
            continue
        out.append(query[pos : m.start()])
        # find the balanced close paren (quote-aware)
        depth, i, quote = 1, m.end(), None
        while i < len(query) and depth:
            ch = query[i]
            if quote:
                if ch == quote:
                    quote = None
            elif ch in "'\"":
                quote = ch
            elif ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
            i += 1
        if depth:
            raise ValueError("unbalanced parentheses in approx_distinct(...) call")
        args = _split_top_level_args(query[m.end() : i - 1])
        if merge:
            if len(args) != 1:
                raise ValueError(
                    "approx_distinct over stored sketches takes no extra "
                    "parameters — only compatible sketches merge "
                    "(UDAFCardinalityEstimator.java:190-193)"
                )
            out.append(f"sketch_struct(hll_union_agg(({args[0]}).binary, true))")
            pos = i
            continue
        if not 1 <= len(args) <= 3:
            raise ValueError(
                f"approx_distinct takes (x[, type[, precision]]), got {len(args)} args"
            )
        x = args[0]
        kind = "hll"
        if len(args) >= 2:
            k = args[1].strip().strip("'\"").lower()
            if k not in ("hll", "lc"):
                raise ValueError(f"approx_distinct type must be 'hll' or 'lc', got {args[1]!r}")
            kind = k
        if kind == "lc":
            size = int(args[2]) if len(args) == 3 else _LC_DEFAULT_SIZE
            if size <= 0:
                raise ValueError(f"LC size_bytes must be positive, got {size}")
            m_bits = size * 8
            # NULL-for-empty-group (reference :329-331): count(x)=0 makes
            # the CASE yield NULL, which lc_struct maps to a NULL struct.
            out.append(
                "lc_struct(CASE WHEN count({x}) > 0 THEN "
                "lc_estimate(count(DISTINCT CASE WHEN {x} IS NOT NULL "
                "THEN pmod(xxhash64({x}), {m}) END), {s}) "
                "END)".format(x=x, m=m_bits, s=size)
            )
            pos = i
            continue
        b = int(args[2]) if len(args) == 3 else _HLL_DEFAULT_B
        out.append(f"sketch_struct(hll_sketch_agg({x}, {b}))")
        pos = i


def sql(spark: SparkSession, query: str):
    """``spark.sql`` with the reference's one-name aggregate available,
    including its input-type dispatch:

        hive_udf_spark.sql(spark, "SELECT approx_distinct(values) FROM src")
        hive_udf_spark.sql(spark, "SELECT approx_distinct(s) FROM daily_sketches")

    Registers the SQL function surface, expands approx_distinct calls to
    the native composed aggregate, and executes; the plan is pure Tier A
    (no Python). Type dispatch mirrors the reference's resolver
    (raw primitive → build sketch; sketch struct → merge,
    UDAFCardinalityEstimator.java:104-109): the raw-value expansion is
    tried first, and if Catalyst's analyzer rejects it because the
    argument is a sketch struct, the merge expansion runs instead. A
    statement mixing raw and struct arguments in one query is not
    supported (neither form analyzes) — split it into two queries.
    """
    from pyspark.errors import AnalysisException

    register_sql(spark)
    try:
        return spark.sql(expand_approx_distinct(query))
    except AnalysisException as primary_err:
        try:
            return spark.sql(expand_approx_distinct(query, merge=True))
        except (AnalysisException, ValueError):
            raise primary_err from None
