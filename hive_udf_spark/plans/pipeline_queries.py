"""Training-data pipeline queries: chunking, packing, sampling.

All three are deterministic by construction (fixed strides, id-ordered
cumulative sums, seeded hash membership), so the oracles are exact SQL
mirrors — including the hash-sample membership, which portable mode
reproduces value-for-value in DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from hive_udf_spark.functions.hashing import portable_hash60_sql
from hive_udf_spark.operators.chunking import (
    SAMPLE_DENOM,
    chunk_documents,
    pack_documents,
    stratified_sample,
)
from hive_udf_spark.plans.registry import register
from hive_udf_spark.sources import load_table

_TOKS_SQL = r"[t for t in string_split_regex(text, '\s+') if t != '']"

_CHUNK = 32
_OVERLAP = 8
_STRIDE = _CHUNK - _OVERLAP


@register(
    "pipeline_chunk_documents",
    oracle=f"""
    WITH t AS (SELECT doc_id, {_TOKS_SQL} AS w FROM documents),
    starts AS (
      -- chunk_idx = start/stride (starts are exact stride multiples)
      SELECT doc_id, w, CAST(u.s // {_STRIDE} AS INT) AS chunk_idx, CAST(u.s AS INT) AS start
      FROM t, unnest(generate_series(0, len(w) - 1, {_STRIDE})) AS u(s)
      WHERE len(w) > 0
    )
    SELECT doc_id, chunk_idx,
           array_to_string(list_slice(w, start + 1, start + {_CHUNK}), ' ') AS chunk_text,
           CAST(len(list_slice(w, start + 1, start + {_CHUNK})) AS INT) AS n_tokens
    FROM starts
    """,
)
def pipeline_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-window chunking (32-token chunks, 8-token overlap) of every
    document — the pre-tokenization context-window split. Pure scan-side
    posexplode, zero shuffle; the oracle re-derives every chunk string."""
    docs = load_table(spark, sf_dir, "documents")
    return chunk_documents(docs, "doc_id", "text", chunk_tokens=_CHUNK, overlap=_OVERLAP)


_BUDGET = 512


@register(
    "pipeline_pack_documents",
    oracle=f"""
    WITH t AS (SELECT doc_id, lang, len({_TOKS_SQL}) AS n FROM documents)
    SELECT doc_id, lang,
           CAST(n AS BIGINT) AS n_tokens,
           CAST(sum(n) OVER w - n AS BIGINT) AS offset,
           CAST(floor((sum(n) OVER w - n) / {_BUDGET}) AS BIGINT) AS bin_id
    FROM t
    WINDOW w AS (PARTITION BY lang ORDER BY doc_id ROWS UNBOUNDED PRECEDING)
    """,
)
def pipeline_pack_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing: per-lang shards, documents concatenated in id
    order and cut every 512 tokens — each doc assigned to the context
    window holding its first token. Sharded cumulative sum (the
    partition-local sort a production packing job uses)."""
    docs = load_table(spark, sf_dir, "documents")
    return pack_documents(docs, "doc_id", "text", budget=_BUDGET, shard_col="lang")


_FRACTIONS = {"en": 0.5, "de": 0.25, "zh": 0.1}


def _sample_oracle() -> str:
    h = portable_hash60_sql("doc_id", 7)
    cases = " ".join(
        f"WHEN '{s}' THEN {int(round(f * SAMPLE_DENOM))}"
        for s, f in sorted(_FRACTIONS.items())
    )
    return f"""
    SELECT doc_id, lang
    FROM documents
    WHERE ({h}) % {SAMPLE_DENOM} < (CASE lang {cases} ELSE 0 END)
    """


@register("pipeline_stratified_sample", oracle=_sample_oracle())
def pipeline_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-language sample (en 50%, de 25%, zh 10%, rest
    dropped) by seeded hash membership — reproducible across runs,
    engines, and partitionings; the oracle reproduces the exact member
    set, not just its size."""
    docs = load_table(spark, sf_dir, "documents")
    return stratified_sample(
        docs, "lang", "doc_id", _FRACTIONS, seed=7, portable=True
    ).select("doc_id", "lang")
