"""Frequency-sketch queries: heavy hitters (approx_top_k) and Count-Min.

The top-k oracle exercises the EXACT regime (max_items_tracked ≥ true
distinct count, so sketch counts equal exact counts and the
deterministic (count desc, item) re-rank hash-matches DuckDB's top-k).
The CMS oracle reproduces the whole sketch in SQL — every counter cell,
collisions included — because the portable hash family is engine-exact;
that pins the sketch construction, not just the estimates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hive_udf_spark.functions.hashing import portable_hash60_sql
from hive_udf_spark.plans.registry import register
from hive_udf_spark.sources import load_table

_TOKS_SQL = r"[t for t in string_split_regex(text, '\s+') if t != '']"

# all token OCCURRENCES (not the distinct word set): frequency needs the
# multiset
_TOK_CTE = f"""
tok AS (
  SELECT t FROM documents, unnest({_TOKS_SQL}) AS u(t)
)
"""


@register(
    "freq_top_tokens",
    oracle=f"""
    WITH {_TOK_CTE},
    counts AS (SELECT t AS item, count(*) AS cnt FROM tok GROUP BY t),
    ranked AS (
      SELECT item, cnt,
             row_number() OVER (ORDER BY cnt DESC, item) AS "rank"
      FROM counts
    )
    SELECT item, cnt, "rank" FROM ranked WHERE "rank" <= 20
    """,
)
def freq_top_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 corpus tokens by occurrence via the native approx_top_k
    aggregate in its exact regime (max_items_tracked=10000 ≥ the corpus
    vocabulary), re-ranked with the deterministic (count desc, item)
    tie-break. Bounded sketch state; partial→final planned by Catalyst
    like every TypedImperativeAggregate."""
    from hive_udf_spark.functions.freq import top_k_exploded
    from hive_udf_spark.functions.text import tokenize

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(F.explode(tokenize("text")).alias("token"))
    return top_k_exploded(toks, "token", k=20, max_items_tracked=10000)


@register(
    "freq_top_tokens_per_lang",
    oracle=f"""
    WITH tok AS (
      SELECT lang, t FROM documents, unnest({_TOKS_SQL}) AS u(t)
    ),
    counts AS (SELECT lang, t AS item, count(*) AS cnt FROM tok GROUP BY lang, t),
    ranked AS (
      SELECT lang, item, cnt,
             row_number() OVER (PARTITION BY lang ORDER BY cnt DESC, item) AS "rank"
      FROM counts
    )
    SELECT lang, item, cnt, "rank" FROM ranked WHERE "rank" <= 5
    """,
)
def freq_top_tokens_per_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPED heavy hitters: top-5 tokens per language via one
    approx_top_k aggregate per group (bounded state per group — the
    shape that holds when `lang` is a million-valued key), exploded and
    re-ranked with the deterministic (count desc, item) tie-break."""
    from pyspark.sql import Window

    from hive_udf_spark.functions.freq import approx_top_k_agg
    from hive_udf_spark.functions.text import tokenize

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("lang", F.explode(tokenize("text")).alias("token"))
    fetched = (
        toks.groupBy("lang")
        .agg(approx_top_k_agg("token", k=10000, max_items_tracked=10000).alias("__tk"))
        .select("lang", F.explode("__tk").alias("__e"))
        .select("lang", F.col("__e.item").alias("item"), F.col("__e.count").alias("cnt"))
    )
    w = Window.partitionBy("lang").orderBy(F.col("cnt").desc(), F.col("item").asc())
    return fetched.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= 5)


_CMS_DEPTH = 4
_CMS_WIDTH = 64  # deliberately small: collisions happen and must match too


def _cms_oracle() -> str:
    # mirrors functions.freq._cms_idx: hashes reduced mod 2^31 before the
    # (h0 + d*h1) mod width combine
    m = 1 << 31
    h0 = f"({portable_hash60_sql('t', 0)} % {m})"
    h1 = f"({portable_hash60_sql('t', 1)} % {m})"
    hp0 = f"({portable_hash60_sql('item', 0)} % {m})"
    hp1 = f"({portable_hash60_sql('item', 1)} % {m})"
    return f"""
    WITH {_TOK_CTE},
    cells AS (
      SELECT d, ({h0} + d * {h1}) % {_CMS_WIDTH} AS idx
      FROM tok, unnest(generate_series(0, {_CMS_DEPTH - 1})) AS s(d)
    ),
    cms AS (SELECT d, idx, count(*) AS cnt FROM cells GROUP BY d, idx),
    probes AS (SELECT DISTINCT t AS item FROM tok),
    probe_cells AS (
      SELECT item, d, ({hp0} + d * {hp1}) % {_CMS_WIDTH} AS idx
      FROM probes, unnest(generate_series(0, {_CMS_DEPTH - 1})) AS s(d)
    )
    SELECT p.item, CAST(min(coalesce(c.cnt, 0)) AS BIGINT) AS est
    FROM probe_cells p LEFT JOIN cms c ON c.d = p.d AND c.idx = p.idx
    GROUP BY p.item
    """


@register("freq_cms_token_counts", oracle=_cms_oracle())
def freq_cms_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min point queries for every distinct corpus token, from a
    deliberately small (4×64) portable-hash sketch so hash collisions
    occur — and must be reproduced exactly by the SQL oracle, which
    rebuilds the identical counter table cell by cell. Estimates are the
    standard CMS upper bound (≥ true count; tightness is pytest-measured
    in tests/test_freq.py)."""
    from hive_udf_spark.functions.freq import cms_lookup, cms_table
    from hive_udf_spark.functions.text import tokenize

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(F.explode(tokenize("text")).alias("token"))
    cms = cms_table(toks, "token", depth=_CMS_DEPTH, width=_CMS_WIDTH, portable=True)
    return cms_lookup(
        cms, toks, "token", depth=_CMS_DEPTH, width=_CMS_WIDTH, portable=True
    )


_JS_D = 4
_JS_W = 256  # small enough that collisions occur: the upper bound must still hold


def _cms_join_size_oracle() -> str:
    m = 1 << 31

    def cells(src: str, key: str, alias: str) -> str:
        h0 = f"({portable_hash60_sql(key, 0)} % {m})"
        h1 = f"({portable_hash60_sql(key, 1)} % {m})"
        return f"""
    {alias} AS (
      SELECT d, ({h0} + d * {h1}) % {_JS_W} AS idx, count(*) AS cnt
      FROM {src}, unnest(generate_series(0, {_JS_D - 1})) AS s(d)
      WHERE {key} IS NOT NULL
      GROUP BY 1, 2
    )"""

    return f"""
    WITH {cells("orders", "o_orderkey", "ca")},
    {cells("lineitem", "l_orderkey", "cb")},
    ip AS (
      SELECT ca.d, sum(ca.cnt * cb.cnt) AS ip
      FROM ca JOIN cb ON cb.d = ca.d AND cb.idx = ca.idx
      GROUP BY 1
    ),
    axis AS (SELECT DISTINCT d FROM ca),
    est AS (
      SELECT CAST(min(coalesce(ip.ip, 0)) AS BIGINT) AS est_join_rows
      FROM axis LEFT JOIN ip ON ip.d = axis.d
    ),
    exact AS (
      SELECT CAST(count(*) AS BIGINT) AS exact_join_rows
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    )
    SELECT est.est_join_rows, exact.exact_join_rows,
           est.est_join_rows >= exact.exact_join_rows AS is_upper_bound
    FROM est, exact
    """


@register("sketch_cms_join_size", oracle=_cms_join_size_oracle())
def sketch_cms_join_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-size estimation from stored sketches (functions/freq.py
    cms_join_size_estimate): the AMS/CMS inner-product estimate of
    |orders ⋈ lineitem on orderkey| from two 4x256 portable Count-Min
    sketches of the join keys — an always-upper-bound feeding
    broadcast/shuffle and reorder decisions without touching the
    tables (the optimizer-statistics story next to skew_report). The
    oracle rebuilds both sketches cell-for-cell, so the estimate is
    bit-exact, and asserts the upper-bound invariant next to the true
    join size."""
    from hive_udf_spark.functions.freq import cms_join_size_estimate, cms_table

    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey").isNotNull())
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey").isNotNull())
    ca = cms_table(orders, "o_orderkey", depth=_JS_D, width=_JS_W, portable=True)
    cb = cms_table(li, "l_orderkey", depth=_JS_D, width=_JS_W, portable=True)
    est = cms_join_size_estimate(ca, cb)
    exact = orders.join(li, F.col("o_orderkey") == F.col("l_orderkey")).agg(
        F.count(F.lit(1)).cast("long").alias("exact_join_rows")
    )
    return est.crossJoin(exact).select(
        "est_join_rows",
        "exact_join_rows",
        (F.col("est_join_rows") >= F.col("exact_join_rows")).alias("is_upper_bound"),
    )
