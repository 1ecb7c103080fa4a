"""Sparse-retrieval registry queries: inverted-index TF-IDF and BM25
top-k search over the documents table, with bit-exact integer-scoring
oracles (operators/retrieval.py documents the arithmetic).

Queries = every 97th document searching the whole corpus (self
excluded) — the eval-contamination-lookup / hard-negative-mining shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hive_udf_spark.plans.registry import register
from hive_udf_spark.sources import load_table

_K = 10
_QMOD = 97

# Shared oracle CTE chain: postings, doc freq, corpus stats, weights,
# query-side postings. DuckDB `//` on positive BIGINTs == Spark `div`.
_BASE_CTES = f"""
    t AS (
      SELECT doc_id, [x for x in string_split_regex(text, '\\s+') if x != ''] AS toks
      FROM documents
    ),
    tok AS (
      SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl, unnest(toks) AS term
      FROM t WHERE len(toks) > 0
    ),
    tf AS (
      SELECT doc_id, dl, term, CAST(count(*) AS BIGINT) AS tf
      FROM tok GROUP BY 1, 2, 3
    ),
    dft AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
    stats AS (
      SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(dl) AS BIGINT) AS tt
      FROM (SELECT DISTINCT doc_id, dl FROM tf)
    ),
    w AS (SELECT term, (s.n * 1000) // df AS w, s.n AS n, s.tt AS tt
          FROM dft, stats s),
    qtf AS (
      SELECT doc_id AS query_id, term, tf AS qtf FROM tf
      WHERE doc_id % {_QMOD} = 0
    )
"""

_RANKED = f"""
    ranked AS (
      SELECT query_id, doc_id, score,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY score DESC, doc_id ASC) AS rank
      FROM scored WHERE score > 0
    )
    SELECT query_id, doc_id, score, CAST(rank AS INT) AS rank
    FROM ranked WHERE rank <= {_K}
"""


@register(
    "retrieval_tfidf_topk",
    oracle=f"""
    WITH {_BASE_CTES},
    scored AS (
      SELECT q.query_id, i.doc_id,
             CAST(sum(q.qtf * i.tf * w.w) AS BIGINT) AS score
      FROM qtf q JOIN w ON w.term = q.term JOIN tf i ON i.term = q.term
      WHERE i.doc_id <> q.query_id
      GROUP BY 1, 2
    ),
    {_RANKED}
    """,
)
def retrieval_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-index TF-IDF top-10 (operators/retrieval.py): linear-idf
    integer dot product, term-at-a-time accumulation, native window
    group limit for the per-query top-k. Bit-exact oracle."""
    from hive_udf_spark.operators.retrieval import build_tfidf_index, tfidf_topk

    docs = load_table(spark, sf_dir, "documents")
    index = build_tfidf_index(docs)
    queries = docs.filter(F.col("doc_id") % _QMOD == 0)
    return tfidf_topk(index, queries, k=_K)


_BM25_ORACLE = f"""
    WITH {_BASE_CTES},
    scored AS (
      SELECT q.query_id, i.doc_id,
             CAST(sum(q.qtf * ((w.w * i.tf * 2200) //
                   (1000 * i.tf + (1200 * ((250 * w.tt + 750 * i.dl * w.n) // w.tt)) // 1000)
                 )) AS BIGINT) AS score
      FROM qtf q JOIN w ON w.term = q.term JOIN tf i ON i.term = q.term
      WHERE i.doc_id <> q.query_id
      GROUP BY 1, 2
    ),
    {_RANKED}
    """


@register("retrieval_bm25_topk", oracle=_BM25_ORACLE)
def retrieval_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Integer-rational BM25 top-10 (k1=1.2, b=0.75) over the same
    inverted index — per-term saturation via one integer division,
    reproduced verbatim in the oracle (250·tt = (1000−750)·tt)."""
    from hive_udf_spark.operators.retrieval import bm25_topk, build_tfidf_index

    docs = load_table(spark, sf_dir, "documents")
    index = build_tfidf_index(docs)
    queries = docs.filter(F.col("doc_id") % _QMOD == 0)
    return bm25_topk(index, queries, k=_K)


@register("streaming_incremental_bm25_search", oracle=_BM25_ORACLE)
def streaming_incremental_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING index maintenance (streaming/retrieval_sink.py): the
    corpus arrives in 3 deterministic micro-batches; each batch's
    postings merge into the stored inverted file under the lineage-
    guarded high-water mark, and the final search over the streamed
    table — weights and corpus stats derived at query time by
    index_from_postings — returns EXACTLY the batch-build BM25 result
    (same oracle as retrieval_bm25_topk; postings of disjoint doc
    batches union losslessly)."""
    import tempfile

    from hive_udf_spark.operators.retrieval import bm25_topk, index_from_postings
    from hive_udf_spark.streaming.retrieval_sink import incremental_postings_sink

    docs = load_table(spark, sf_dir, "documents")
    with tempfile.TemporaryDirectory() as tmp:
        src = f"{tmp}/src"
        for b in range(3):  # sequential writes -> deterministic file order
            docs.filter(F.col("doc_id") % 3 == b).coalesce(1).write.parquet(
                f"{src}/b{b}"
            )
        stream = (
            spark.readStream.schema(docs.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{src}/*")
        )
        q = incremental_postings_sink(stream, f"{tmp}/postings", f"{tmp}/ckpt")
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        index = index_from_postings(spark.read.parquet(f"{tmp}/postings"))
        queries = docs.filter(F.col("doc_id") % _QMOD == 0)
        out = bm25_topk(index, queries, k=_K).localCheckpoint(eager=True)
    return out


_FORGET_MOD = 113
_FORGET_ORACLE = _BM25_ORACLE.replace(
    "FROM documents", f"FROM documents WHERE doc_id % {_FORGET_MOD} != 0"
)


@register("retrieval_forget_then_search", oracle=_FORGET_ORACLE)
def retrieval_forget_then_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delete propagation (sources/sinks.py propagate_deletes): the
    corpus and its stored postings index forget doc_id % 113 == 0 via
    one delete list (anti-join + atomic swap per table), WITHOUT
    touching raw text again; BM25 over the post-delete index — corpus
    stats re-derived from surviving postings by index_from_postings —
    must equal a from-scratch build on the filtered corpus (the oracle
    is the retrieval_bm25_topk SQL with the deletion filter applied at
    the source). Proves forgotten documents neither appear as results
    nor haunt df/n_docs/total_tokens."""
    import tempfile

    from hive_udf_spark.operators.retrieval import (
        bm25_topk,
        doc_postings,
        index_from_postings,
    )
    from hive_udf_spark.sources.sinks import propagate_deletes

    docs = load_table(spark, sf_dir, "documents")
    with tempfile.TemporaryDirectory() as tmp:
        corpus_path, postings_path = f"{tmp}/corpus", f"{tmp}/postings"
        docs.write.parquet(corpus_path)
        doc_postings(docs).write.parquet(postings_path)
        deletes = docs.filter(F.col("doc_id") % _FORGET_MOD == 0).select("doc_id")
        propagate_deletes(
            spark, deletes, {corpus_path: "doc_id", postings_path: "doc_id"}
        )
        index = index_from_postings(spark.read.parquet(postings_path))
        queries = spark.read.parquet(corpus_path).filter(F.col("doc_id") % _QMOD == 0)
        out = bm25_topk(index, queries, k=_K).localCheckpoint(eager=True)
    return out


_RRF_K = 60
_HY_K = 10
_HY_LEG_K = 20


@register(
    "retrieval_hybrid_rrf",
    oracle=f"""
    WITH {_BASE_CTES},
    scored AS (
      SELECT q.query_id, i.doc_id,
             CAST(sum(q.qtf * ((w.w * i.tf * 2200) //
                   (1000 * i.tf + (1200 * ((250 * w.tt + 750 * i.dl * w.n) // w.tt)) // 1000)
                 )) AS BIGINT) AS score
      FROM qtf q JOIN w ON w.term = q.term JOIN tf i ON i.term = q.term
      WHERE i.doc_id <> q.query_id
      GROUP BY 1, 2
    ),
    lexr AS (
      SELECT query_id, doc_id,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY score DESC, doc_id ASC) AS r
      FROM scored WHERE score > 0
    ),
    qv AS (
      SELECT vec_id,
             [CAST(round(CAST(e AS DOUBLE) * 1000) AS BIGINT) for e in embedding] AS q
      FROM embeddings
    ),
    vpairs AS (
      SELECT a.vec_id AS query_id, b.vec_id AS doc_id,
             CAST(list_sum(list_transform(generate_series(1, 64),
                  i -> a.q[i] * b.q[i])) AS BIGINT) AS dot_q
      FROM qv a JOIN qv b ON b.vec_id != a.vec_id
      WHERE a.vec_id % {_QMOD} = 0
    ),
    vecr AS (
      SELECT query_id, doc_id,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY dot_q DESC, doc_id ASC) AS r
      FROM vpairs
    ),
    contribs AS (
      SELECT query_id, doc_id,
             CAST(round(1000000.0 / ({_RRF_K} + r)) AS BIGINT) AS c
      FROM lexr WHERE r <= {_HY_LEG_K}
      UNION ALL
      SELECT query_id, doc_id,
             CAST(round(1000000.0 / ({_RRF_K} + r)) AS BIGINT) AS c
      FROM vecr WHERE r <= {_HY_LEG_K}
    ),
    fused AS (
      SELECT query_id, doc_id,
             CAST(sum(c) AS BIGINT) AS rrf_micro,
             CAST(count(*) AS BIGINT) AS n_sources
      FROM contribs GROUP BY 1, 2
    ),
    ranked AS (
      SELECT query_id, doc_id, rrf_micro, n_sources,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY rrf_micro DESC, doc_id ASC) AS rank
      FROM fused
    )
    SELECT query_id, doc_id, rrf_micro, n_sources, CAST(rank AS INT) AS rank
    FROM ranked WHERE rank <= {_HY_K}
    """,
)
def retrieval_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HYBRID search (operators/retrieval.py hybrid_rrf_topk): BM25 over
    the inverted index and quantized-dot vector retrieval over the
    aligned embeddings table, fused by Reciprocal Rank Fusion
    (Cormack et al. 2009) in integer micro-points — keyword precision +
    semantic recall, every leg and the fusion itself engine-exact. The
    oracle recomputes BOTH retrievers and the fusion; rrf_fuse accepts
    any (query_id, doc_id, rank) relation, so ANN legs plug in at
    corpus scale."""
    from hive_udf_spark.operators.retrieval import build_tfidf_index, hybrid_rrf_topk

    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    queries = docs.filter(F.col("doc_id") % _QMOD == 0)
    qvecs = emb.filter(F.col("vec_id") % _QMOD == 0)
    return hybrid_rrf_topk(
        build_tfidf_index(docs), queries, emb, qvecs,
        k=_HY_K, rrf_k=_RRF_K, lex_k=_HY_LEG_K, vec_k=_HY_LEG_K,
    )
