"""Dedup-operator queries with engine-portable oracles.

The MinHash and SimHash oracles are *generated SQL* that reproduces our
signatures exactly in DuckDB: both engines hash tokens with the top 60
bits of a standard md5 (functions/hashing.py), so LSH candidates — not
just verified outputs — match bit-for-bit. This is a stronger check than
comparing against brute force: it pins the whole pipeline, including band
construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hive_udf_spark.functions.hashing import portable_hash60_sql
from hive_udf_spark.functions.text import word_set
from hive_udf_spark.operators.dedup import (
    exact_dedup,
    jaccard_pair_stats,
    near_dup_pairs,
)
from hive_udf_spark.plans.registry import register
from hive_udf_spark.sources import load_table

# Shared CTE: distinct word sets per document (DuckDB mirror of
# functions.text.word_set).
_WS_CTE = r"""
ws AS (
  SELECT doc_id,
         list_distinct([t for t in string_split_regex(text, '\s+') if t != '']) AS w
  FROM documents
)
"""

_MINHASH_K = 16
_MINHASH_BANDS = 8
_MINHASH_R = 2
_JACCARD_T_PPM = 500_000  # threshold 0.5 as parts-per-million (integer math)


def _minhash_oracle() -> str:
    sig_exprs = ",\n      ".join(
        f"list_min([{portable_hash60_sql('t', seed)} for t in w])" for seed in range(_MINHASH_K)
    )
    return f"""
    WITH {_WS_CTE},
    sig AS (
      -- empty word sets are excluded (mirrors near_dup_pairs: undefined
      -- 0/0 Jaccard, and null signatures would bucket together)
      SELECT doc_id, w, [
      {sig_exprs}
      ] AS sig FROM ws WHERE len(w) > 0
    ),
    bands AS (
      SELECT doc_id,
             band,
             sig[{_MINHASH_R}*band + 1]::VARCHAR || '_' || sig[{_MINHASH_R}*band + 2]::VARCHAR AS bkey
      FROM sig, unnest(generate_series(0, {_MINHASH_BANDS - 1})) AS t(band)
    ),
    cands AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id
    )
    SELECT id_a, id_b,
           CAST(len(list_intersect(wa.w, wb.w)) AS BIGINT) AS inter_size,
           CAST(len(list_distinct(list_concat(wa.w, wb.w))) AS BIGINT) AS union_size
    FROM cands
      JOIN ws wa ON wa.doc_id = id_a
      JOIN ws wb ON wb.doc_id = id_b
    WHERE len(list_intersect(wa.w, wb.w)) * 1000000
          >= {_JACCARD_T_PPM} * len(list_distinct(list_concat(wa.w, wb.w)))
    """


@register("dedup_minhash_lsh", oracle=_minhash_oracle())
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(k=16) → LSH(8 bands × 2 rows) → exact-Jaccard verify ≥ 0.5,
    portable-hash mode. The oracle regenerates the identical pipeline in
    SQL, so candidate generation itself is checked, not just the output."""
    docs = load_table(spark, sf_dir, "documents")
    out = near_dup_pairs(
        docs,
        "doc_id",
        "text",
        threshold=0.5,
        num_hashes=_MINHASH_K,
        bands=_MINHASH_BANDS,
        portable=True,
    )
    return out.select(
        "id_a",
        "id_b",
        F.col("inter_size").cast("long").alias("inter_size"),
        F.col("union_size").cast("long").alias("union_size"),
    )


@register(
    "dedup_exact_content_hash",
    oracle="""
    WITH aug AS (
      SELECT * FROM documents
      UNION ALL
      SELECT doc_id + 1000000, text, lang, source, n_chars
      FROM documents WHERE doc_id % 10 = 0
    )
    SELECT CAST(min(doc_id) AS BIGINT) AS doc_id
    FROM aug GROUP BY md5(text)
    """,
)
def dedup_exact_content_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup by content hash over a corpus with injected duplicates
    (the raw corpus has none — FIXTURES.md): survivor = lowest doc_id."""
    docs = load_table(spark, sf_dir, "documents")
    dupes = docs.filter(F.col("doc_id") % 10 == 0).withColumn(
        "doc_id", F.col("doc_id") + F.lit(1_000_000)
    )
    aug = docs.unionByName(dupes)
    return exact_dedup(aug, "text", "doc_id").select("doc_id")


@register(
    "dedup_ngram_jaccard_brute",
    oracle=f"""
    WITH {_WS_CTE}
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(len(list_intersect(a.w, b.w)) AS BIGINT) AS inter_size,
           CAST(len(list_distinct(list_concat(a.w, b.w))) AS BIGINT) AS union_size
    FROM ws a JOIN ws b ON a.doc_id < b.doc_id
    WHERE a.doc_id % 5 = 0 AND b.doc_id % 5 = 0
      AND len(list_intersect(a.w, b.w)) * 1000000
          >= 400000 * len(list_distinct(list_concat(a.w, b.w)))
    """,
)
def dedup_ngram_jaccard_brute(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force exact word-set Jaccard ≥ 0.4 over a doc_id%5 sample —
    the ground-truth oracle the LSH path approximates. Quadratic by
    construction; the sample bound keeps it so only on purpose."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 5 == 0)
    ws = docs.select(F.col("doc_id"), word_set("text").alias("w"))
    a, b = ws.alias("a"), ws.alias("b")
    joined = a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
    inter, union = jaccard_pair_stats(F.col("a.w"), F.col("b.w"))
    return (
        joined.select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            inter.cast("long").alias("inter_size"),
            union.cast("long").alias("union_size"),
        )
        .filter(F.col("inter_size") * 1_000_000 >= 400_000 * F.col("union_size"))
    )


# --- cluster oracles: recursive-CTE connected components -------------------
#
# Min-label propagation CC is deterministic, and DuckDB's WITH RECURSIVE
# computes the same fixpoint as transitive closure over the symmetrized
# verified edge set: reach(node, r) enumerates reachable ids, min(r) per
# node IS the min-label component. The edge pipeline itself is the same
# generated portable-hash MinHash SQL as the pair oracle, so these checks
# pin signatures → bands → candidates → verify → clustering end-to-end.

_CLUST_K = 16
_CLUST_BANDS = 4
_CLUST_R = _CLUST_K // _CLUST_BANDS
_CLUST_T_PPM = 700_000  # threshold 0.7


def _minhash_edges_cte(bands_src: str = "bands") -> str:
    """CTE chain ws→sig→bands shared by both cluster oracles."""
    sig_exprs = ",\n      ".join(
        f"list_min([{portable_hash60_sql('t', seed)} for t in w])" for seed in range(_CLUST_K)
    )
    bkey = " || '_' || ".join(
        f"sig[{_CLUST_R}*band + {i}]::VARCHAR" for i in range(1, _CLUST_R + 1)
    )
    return f"""{_WS_CTE},
    sig AS (
      SELECT doc_id, w, [
      {sig_exprs}
      ] AS sig FROM ws WHERE len(w) > 0
    ),
    {bands_src} AS (
      SELECT doc_id, band, {bkey} AS bkey
      FROM sig, unnest(generate_series(0, {_CLUST_BANDS - 1})) AS t(band)
    )"""


_CLUSTER_CCSQL = """
    sym AS (
      SELECT id_a AS s, id_b AS d FROM edges
      UNION ALL
      SELECT id_b, id_a FROM edges
    ),
    reach(node, r) AS (
      SELECT doc_id, doc_id FROM documents
      UNION
      SELECT e.d, re.r FROM reach re JOIN sym e ON e.s = re.node
    )
    SELECT node AS doc_id, min(r) AS cluster, (node = min(r)) AS is_canonical
    FROM reach GROUP BY node
"""


def _clusters_linear_oracle() -> str:
    return f"""
    WITH RECURSIVE {_minhash_edges_cte()},
    cands AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id
    ),
    edges AS (
      SELECT id_a, id_b
      FROM cands
        JOIN ws wa ON wa.doc_id = id_a
        JOIN ws wb ON wb.doc_id = id_b
      WHERE len(list_intersect(wa.w, wb.w)) * 1000000
            >= {_CLUST_T_PPM} * len(list_distinct(list_concat(wa.w, wb.w)))
    ),
    {_CLUSTER_CCSQL}
    """


@register("dedup_clusters_linear", oracle=_clusters_linear_oracle())
def dedup_clusters_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-based near-dedup: (doc_id, cluster, is_canonical) — linear
    output even on boilerplate-heavy corpora (pair lists are quadratic
    there). Portable-hash mode so the recursive-CTE oracle reproduces the
    whole pipeline including the CC fixpoint; additionally validated
    against union-find ground truth in tests/test_dedup_clusters.py."""
    from hive_udf_spark.operators.dedup import dedup_clusters

    docs = load_table(spark, sf_dir, "documents")
    return dedup_clusters(
        docs,
        "doc_id",
        "text",
        threshold=0.7,
        portable=True,
        sig_prefilter_margin=None,
        mode="exact",  # the oracle mirrors the exact pair graph
    )


_SIMHASH_BITS = 60
_SIMHASH_MAXD = 20


def _simhash_oracle() -> str:
    bit_terms = "\n        + ".join(
        f"(CASE WHEN list_sum([((h >> {j}) & 1) * 2 - 1 for h in hs]) > 0 THEN {2**j} ELSE 0 END)::BIGINT"
        for j in range(_SIMHASH_BITS)
    )
    return f"""
    WITH {_WS_CTE},
    hs AS (
      SELECT doc_id, [{portable_hash60_sql('t', 0)} for t in w] AS hs FROM ws
    ),
    sh AS (
      SELECT doc_id,
        ({bit_terms}) AS sh
      FROM hs
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(bit_count(xor(a.sh, b.sh)) AS BIGINT) AS hamming
    FROM sh a JOIN sh b ON a.doc_id < b.doc_id
    WHERE a.doc_id % 5 = 0 AND b.doc_id % 5 = 0
      AND bit_count(xor(a.sh, b.sh)) <= {_SIMHASH_MAXD}
    """


@register("dedup_simhash_pairs", oracle=_simhash_oracle())
def dedup_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash(60-bit, portable) near-pairs (Hamming ≤ 20) over the same
    doc_id%5 sample — signatures reproduced bit-for-bit by the generated
    SQL oracle. Signatures come from the one-pass ``simhash_table``
    formulation (explode + single wide aggregate) rather than the naive
    per-bit expression fold, which re-hashed the token array once per
    bit — identical output, 60× less hash work. The scalable candidate
    generator (pigeonhole blocking) is
    `operators.dedup.simhash_block_pairs`; it feeds the same verify."""
    from hive_udf_spark.operators.dedup import simhash_table

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 5 == 0)
    sigs = simhash_table(docs, "doc_id", "text", _SIMHASH_BITS, portable=True).select(
        F.col("__id").alias("doc_id"), F.col("__sh").alias("sh")
    )
    a, b = sigs.alias("a"), sigs.alias("b")
    dist = F.bit_count(F.col("a.sh").bitwiseXOR(F.col("b.sh")))
    return (
        a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            dist.cast("long").alias("hamming"),
        )
        .filter(F.col("hamming") <= _SIMHASH_MAXD)
    )


def _clusters_star_oracle() -> str:
    return f"""
    WITH RECURSIVE {_minhash_edges_cte()},
    bucket_min AS (
      SELECT band, bkey, min(doc_id) AS hub FROM bands GROUP BY band, bkey
    ),
    star AS (
      SELECT DISTINCT bm.hub AS id_a, b.doc_id AS id_b
      FROM bands b JOIN bucket_min bm ON b.band = bm.band AND b.bkey = bm.bkey
      WHERE b.doc_id != bm.hub
    ),
    edges AS (
      SELECT id_a, id_b
      FROM star
        JOIN ws wa ON wa.doc_id = id_a
        JOIN ws wb ON wb.doc_id = id_b
      WHERE len(list_intersect(wa.w, wb.w)) * 1000000
            >= {_CLUST_T_PPM} * len(list_distinct(list_concat(wa.w, wb.w)))
    ),
    {_CLUSTER_CCSQL}
    """


@register("dedup_clusters_star", oracle=_clusters_star_oracle())
def dedup_clusters_star_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star-reduction cluster dedup: O(bucket) edges instead of O(bucket²)
    — the corpus-scale path for boilerplate-heavy data. The star
    reduction (member→bucket-min edges) is deterministic, so the
    recursive-CTE oracle reproduces it exactly in portable-hash mode;
    cluster recall vs the exact variant is measured in
    tests/test_dedup_clusters.py."""
    from hive_udf_spark.operators.dedup import dedup_clusters_star

    docs = load_table(spark, sf_dir, "documents")
    return dedup_clusters_star(docs, "doc_id", "text", threshold=0.7, portable=True)


def _incremental_minhash_oracle() -> str:
    sig_exprs = ",\n      ".join(
        f"list_min([{portable_hash60_sql('t', seed)} for t in w])" for seed in range(_MINHASH_K)
    )
    return f"""
    WITH {_WS_CTE},
    sig AS (
      SELECT doc_id, w, [
      {sig_exprs}
      ] AS sig FROM ws WHERE len(w) > 0
    ),
    bands AS (
      SELECT doc_id,
             band,
             sig[{_MINHASH_R}*band + 1]::VARCHAR || '_' || sig[{_MINHASH_R}*band + 2]::VARCHAR AS bkey
      FROM sig, unnest(generate_series(0, {_MINHASH_BANDS - 1})) AS t(band)
    ),
    cands AS (
      SELECT DISTINCT a.doc_id AS batch_id, b.doc_id AS corpus_id
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.bkey = b.bkey
      WHERE a.doc_id % 10 = 0 AND b.doc_id % 10 != 0
    )
    SELECT batch_id, corpus_id,
           CAST(len(list_intersect(wa.w, wb.w)) AS BIGINT) AS inter_size,
           CAST(len(list_distinct(list_concat(wa.w, wb.w))) AS BIGINT) AS union_size
    FROM cands
      JOIN ws wa ON wa.doc_id = batch_id
      JOIN ws wb ON wb.doc_id = corpus_id
    WHERE len(list_intersect(wa.w, wb.w)) * 1000000
          >= {_JACCARD_T_PPM} * len(list_distinct(list_concat(wa.w, wb.w)))
    """


@register("dedup_incremental_minhash", oracle=_incremental_minhash_oracle())
def dedup_incremental_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental dedup: a 10% 'new batch' (doc_id % 10 = 0) probed
    against the MinHash index built over the other 90% — the
    build-the-index-once, probe-per-ingest contract that avoids any
    corpus rescan at 100 TB (operators/dedup.py:build_minhash_index /
    probe_minhash_index). Portable-hash mode: the oracle regenerates
    signatures, band keys, the asymmetric candidate join, and the exact
    verify in SQL."""
    from hive_udf_spark.operators.dedup import build_minhash_index, probe_minhash_index

    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("doc_id") % 10 != 0)
    batch = docs.filter(F.col("doc_id") % 10 == 0)
    index = build_minhash_index(corpus, "doc_id", "text", _MINHASH_K, portable=True)
    out = probe_minhash_index(
        index,
        batch,
        "doc_id",
        "text",
        threshold=0.5,
        num_hashes=_MINHASH_K,
        bands=_MINHASH_BANDS,
        portable=True,
    )
    return out.select(
        "batch_id",
        "corpus_id",
        F.col("inter_size").cast("long").alias("inter_size"),
        F.col("union_size").cast("long").alias("union_size"),
    )


# ---------------------------------------------------------------------------
# Token-level duplicated spans (ExactSubstr dedup, Lee et al. 2021)
# ---------------------------------------------------------------------------

_SPAN_N = 5
_SPAN_MIN_COUNT = 2

# Ordered-token CTE (mirror of functions.text.tokenize — keeps duplicates
# and order, unlike _WS_CTE's distinct word sets) plus the posting list:
# one (key, doc_id, pos) row per token 5-gram, pos 0-based.
def _span_posting_cte(keep_first: bool) -> str:
    gram = f"array_to_string(tk[i + 1 : i + {_SPAN_N}], ' ')"
    first_sel = (
        ",\n      min(struct_pack(i := doc_id, p := pos)) OVER (PARTITION BY key) AS first_occ"
        if keep_first
        else ""
    )
    first_filter = (
        "AND NOT (doc_id = first_occ.i AND pos = first_occ.p)" if keep_first else ""
    )
    return f"""
tok AS (
  SELECT doc_id,
         [t for t in string_split_regex(text, '\\s+') if t != ''] AS tk
  FROM documents
),
posting AS (
  SELECT doc_id,
         i AS pos,
         {portable_hash60_sql(gram, 0)} AS key
  FROM tok, unnest(generate_series(0, len(tk) - {_SPAN_N})) AS g(i)
  WHERE len(tk) >= {_SPAN_N}
),
marked AS (
  SELECT doc_id, pos FROM (
    SELECT doc_id, pos,
      count(*) OVER (PARTITION BY key) AS cnt{first_sel}
    FROM posting
  ) WHERE cnt >= {_SPAN_MIN_COUNT} {first_filter}
),
islands AS (
  SELECT doc_id, pos,
         sum(CASE WHEN pos > coalesce(prev_end, -1) THEN 1 ELSE 0 END)
           OVER (PARTITION BY doc_id ORDER BY pos
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
  FROM (
    SELECT doc_id, pos,
           max(pos + {_SPAN_N}) OVER (PARTITION BY doc_id ORDER BY pos
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_end
    FROM marked
  )
),
spans AS (
  SELECT doc_id,
         min(pos) AS span_start,
         max(pos) + {_SPAN_N} AS span_end
  FROM islands GROUP BY doc_id, grp
)
"""


def _span_oracle() -> str:
    return f"""
    WITH {_span_posting_cte(keep_first=False)}
    SELECT s.doc_id,
           CAST(span_start AS BIGINT) AS span_start,
           CAST(span_end AS BIGINT) AS span_end,
           CAST(span_end - span_start AS BIGINT) AS span_tokens,
           array_to_string(tk[span_start + 1 : span_end], ' ') AS span_text
    FROM spans s JOIN tok USING (doc_id)
    """


@register("dedup_duplicate_spans", oracle=_span_oracle())
def dedup_duplicate_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal duplicated token 5-gram spans across the corpus
    (operators/spandedup.py — ExactSubstr dedup at token granularity).
    Portable-hash mode: the oracle reproduces postings, the corpus-wide
    count mark, the gaps-and-islands merge, and every span's text."""
    from hive_udf_spark.operators.spandedup import duplicate_spans

    docs = load_table(spark, sf_dir, "documents")
    out = duplicate_spans(
        docs, n=_SPAN_N, min_count=_SPAN_MIN_COUNT, portable=True
    )
    return out.select(
        "doc_id",
        F.col("span_start").cast("long").alias("span_start"),
        F.col("span_end").cast("long").alias("span_end"),
        F.col("span_tokens").cast("long").alias("span_tokens"),
        "span_text",
    )


def _strip_oracle() -> str:
    # keep_first=True: the corpus-wide first occurrence of each 5-gram
    # stays, so one canonical copy of every duplicated passage survives.
    return f"""
    WITH {_span_posting_cte(keep_first=True)},
    covered AS (
      SELECT doc_id, unnest(generate_series(span_start + 1, span_end)) AS idx
      FROM spans
    ),
    toks_pos AS (
      SELECT doc_id, unnest(tk) AS tok, generate_subscripts(tk, 1) AS i
      FROM tok
    ),
    kept AS (
      SELECT tp.doc_id,
             string_agg(tp.tok, ' ' ORDER BY tp.i) AS clean_text,
             count(*) AS n_kept
      FROM toks_pos tp
        ANTI JOIN covered c ON c.doc_id = tp.doc_id AND c.idx = tp.i
      GROUP BY tp.doc_id
    )
    SELECT t.doc_id,
           coalesce(k.clean_text, '') AS clean_text,
           CAST(len(t.tk) AS BIGINT) AS total_tokens,
           CAST(len(t.tk) - coalesce(k.n_kept, 0) AS BIGINT) AS dup_tokens
    FROM tok t LEFT JOIN kept k USING (doc_id)
    """


@register("dedup_strip_spans", oracle=_strip_oracle())
def dedup_strip_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Documents with duplicated 5-gram spans removed, keep_first policy
    (one canonical copy of each passage survives corpus-wide). The
    engine rebuilds docs with an O(len) fold over sorted spans; the
    oracle rebuilds them by anti-joining covered token positions —
    independent formulations, identical strings."""
    from hive_udf_spark.operators.spandedup import strip_duplicate_spans

    docs = load_table(spark, sf_dir, "documents")
    out = strip_duplicate_spans(
        docs, n=_SPAN_N, min_count=_SPAN_MIN_COUNT, keep_first=True, portable=True
    )
    return out.select(
        "doc_id",
        "clean_text",
        F.col("total_tokens").cast("long").alias("total_tokens"),
        F.col("dup_tokens").cast("long").alias("dup_tokens"),
    )


def _incremental_span_oracle() -> str:
    gram = f"array_to_string(tk[i + 1 : i + {_SPAN_N}], ' ')"
    key = portable_hash60_sql(gram, 0)
    return f"""
    WITH tok AS (
      SELECT doc_id,
             [t for t in string_split_regex(text, '\\s+') if t != ''] AS tk
      FROM documents
    ),
    posting AS (
      SELECT doc_id, i AS pos, {key} AS key
      FROM tok, unnest(generate_series(0, len(tk) - {_SPAN_N})) AS g(i)
      WHERE len(tk) >= {_SPAN_N}
    ),
    idx AS (
      SELECT key, count(*) AS ic FROM posting WHERE doc_id % 10 != 0 GROUP BY key
    ),
    bp AS (SELECT doc_id, pos, key FROM posting WHERE doc_id % 10 = 0),
    bc AS (SELECT key, count(*) AS bc FROM bp GROUP BY key),
    dup AS (
      SELECT bc.key FROM bc LEFT JOIN idx USING (key)
      WHERE bc.bc + coalesce(idx.ic, 0) >= {_SPAN_MIN_COUNT}
    ),
    marked AS (SELECT doc_id, pos FROM bp JOIN dup USING (key)),
    islands AS (
      SELECT doc_id, pos,
             sum(CASE WHEN pos > coalesce(prev_end, -1) THEN 1 ELSE 0 END)
               OVER (PARTITION BY doc_id ORDER BY pos
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
      FROM (
        SELECT doc_id, pos,
               max(pos + {_SPAN_N}) OVER (PARTITION BY doc_id ORDER BY pos
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_end
        FROM marked
      )
    )
    SELECT doc_id,
           CAST(min(pos) AS BIGINT) AS span_start,
           CAST(max(pos) + {_SPAN_N} AS BIGINT) AS span_end,
           CAST(max(pos) + {_SPAN_N} - min(pos) AS BIGINT) AS span_tokens
    FROM islands GROUP BY doc_id, grp
    """


@register("dedup_incremental_spans", oracle=_incremental_span_oracle())
def dedup_incremental_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental ExactSubstr: a 10% 'new batch' (doc_id % 10 = 0)
    probed against the n-gram index built over the other 90%
    (operators/spandedup.py build_ngram_index / probe_duplicate_spans)
    — span-level dedup of incoming data with NO corpus rescan per
    ingest, the same contract as dedup_incremental_minhash. Spans mark
    where batch text duplicates the corpus or repeats within the batch;
    the oracle recomputes index counts, the probe join, and the island
    merge."""
    from hive_udf_spark.operators.spandedup import (
        build_ngram_index,
        probe_duplicate_spans,
    )

    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("doc_id") % 10 != 0)
    batch = docs.filter(F.col("doc_id") % 10 == 0)
    index = build_ngram_index(corpus, n=_SPAN_N, portable=True)
    out = probe_duplicate_spans(
        index, batch, n=_SPAN_N, min_count=_SPAN_MIN_COUNT, portable=True
    )
    return out.select(
        "doc_id",
        F.col("span_start").cast("long").alias("span_start"),
        F.col("span_end").cast("long").alias("span_end"),
        F.col("span_tokens").cast("long").alias("span_tokens"),
    )


@register(
    "dedup_prefix_filter_exact_join",
    oracle=f"""
    WITH {_WS_CTE}
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(len(list_intersect(a.w, b.w)) AS BIGINT) AS inter_size,
           CAST(len(list_distinct(list_concat(a.w, b.w))) AS BIGINT) AS union_size
    FROM ws a JOIN ws b ON a.doc_id < b.doc_id
    WHERE len(a.w) > 0 AND len(b.w) > 0
      AND len(list_intersect(a.w, b.w)) * 1000000
          >= 750000 * len(list_distinct(list_concat(a.w, b.w)))
    """,
)
def dedup_prefix_filter_exact_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT set-similarity join, Jaccard ≥ 0.75, via prefix filtering
    (operators/dedup.py prefix_filter_pairs — AllPairs/PPJoin). Unlike
    MinHash-LSH the result is deterministic and complete, so the oracle
    is the BRUTE-FORCE pair enumeration itself: algorithmic equivalence,
    not a pipeline mirror. The engine only ever joins on each doc's
    rarest-token prefix — boilerplate tokens are never join keys."""
    from hive_udf_spark.operators.dedup import prefix_filter_pairs

    docs = load_table(spark, sf_dir, "documents")
    return prefix_filter_pairs(docs, "doc_id", "text", threshold=0.75)


def _leakage_split_oracle() -> str:
    cl_hash = portable_hash60_sql("min(r)::VARCHAR", 13)
    return f"""
    WITH RECURSIVE {_minhash_edges_cte()},
    cands AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id
    ),
    edges AS (
      SELECT id_a, id_b
      FROM cands
        JOIN ws wa ON wa.doc_id = id_a
        JOIN ws wb ON wb.doc_id = id_b
      WHERE len(list_intersect(wa.w, wb.w)) * 1000000
            >= {_CLUST_T_PPM} * len(list_distinct(list_concat(wa.w, wb.w)))
    ),
    sym AS (
      SELECT id_a AS s, id_b AS d FROM edges
      UNION ALL
      SELECT id_b, id_a FROM edges
    ),
    reach(node, r) AS (
      SELECT doc_id, doc_id FROM documents
      UNION
      SELECT e.d, re.r FROM reach re JOIN sym e ON e.s = re.node
    )
    SELECT node AS doc_id,
           min(r) AS cluster,
           CASE WHEN ({cl_hash}) % 1000000 < 100000
                THEN 'test' ELSE 'train' END AS split
    FROM reach GROUP BY node
    """


@register("pipeline_leakage_safe_split", oracle=_leakage_split_oracle())
def pipeline_leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe train/eval split (operators/chunking.py
    leakage_safe_split): the split decision hashes the near-dup CLUSTER
    id, so duplicates can never straddle the boundary — the
    contamination-prevention step after dedup that a doc-level random
    split misses. Deterministic (no rand()); the oracle re-derives the
    cluster graph (recursive-CTE CC) and the hash threshold."""
    from hive_udf_spark.operators.chunking import leakage_safe_split
    from hive_udf_spark.operators.dedup import dedup_clusters

    docs = load_table(spark, sf_dir, "documents")
    clusters = dedup_clusters(
        docs, "doc_id", "text", threshold=0.7, portable=True,
        sig_prefilter_margin=None, mode="exact",
    )
    return leakage_safe_split(
        docs, clusters, test_fraction=0.1, seed=13, portable=True
    )


_SINC_T_PPM = 800_000  # streaming incremental threshold 0.8


def _streaming_incremental_dedup_oracle() -> str:
    sig_exprs = ",\n      ".join(
        f"list_min([{portable_hash60_sql('t', seed)} for t in w])" for seed in range(_MINHASH_K)
    )
    return f"""
    WITH {_WS_CTE},
    sig AS (
      SELECT doc_id, w, [
      {sig_exprs}
      ] AS sig FROM ws WHERE len(w) > 0
    ),
    bands AS (
      SELECT doc_id,
             band,
             sig[{_MINHASH_R}*band + 1]::VARCHAR || '_' || sig[{_MINHASH_R}*band + 2]::VARCHAR AS bkey
      FROM sig, unnest(generate_series(0, {_MINHASH_BANDS - 1})) AS t(band)
    ),
    cands AS (
      SELECT DISTINCT a.doc_id AS batch_id, b.doc_id AS corpus_id
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.bkey = b.bkey
      WHERE a.doc_id % 5 > b.doc_id % 5
    )
    SELECT batch_id, corpus_id,
           CAST(len(list_intersect(wa.w, wb.w)) AS BIGINT) AS inter_size,
           CAST(len(list_distinct(list_concat(wa.w, wb.w))) AS BIGINT) AS union_size
    FROM cands
      JOIN ws wa ON wa.doc_id = batch_id
      JOIN ws wb ON wb.doc_id = corpus_id
    WHERE len(list_intersect(wa.w, wb.w)) * 1000000
          >= {_SINC_T_PPM} * len(list_distinct(list_concat(wa.w, wb.w)))
    """


@register(
    "streaming_incremental_dedup", oracle=_streaming_incremental_dedup_oracle()
)
def streaming_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING near-dup detection (streaming/dedup_sink.py): the
    corpus arrives in 5 deterministic micro-batches (doc_id % 5, one
    file per batch); each batch probes the MinHash index accumulated
    from all earlier batches, appends the flagged cross-batch pairs,
    and extends the index — index AND pairs committed together in one
    atomic state swap per batch. The union over batches equals the
    batch-mode set "all pairs with batch(a) > batch(b), J ≥ 0.8",
    which the oracle computes with the full portable pipeline
    (signatures, band candidacy, exact verify)."""
    import tempfile

    from hive_udf_spark.streaming.dedup_sink import incremental_dedup_sink

    docs = load_table(spark, sf_dir, "documents")
    with tempfile.TemporaryDirectory() as tmp:
        src = f"{tmp}/src"
        for b in range(5):  # sequential writes -> deterministic file order
            docs.filter(F.col("doc_id") % 5 == b).coalesce(1).write.parquet(
                f"{src}/b{b}"
            )
        stream = (
            spark.readStream.schema(docs.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{src}/*")
        )
        q = incremental_dedup_sink(
            stream,
            f"{tmp}/state",
            f"{tmp}/ckpt",
            threshold=0.8,
            num_hashes=_MINHASH_K,
            bands=_MINHASH_BANDS,
            portable=True,
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        out = (
            spark.read.parquet(f"{tmp}/state/pairs")
            .localCheckpoint(eager=True)  # outlives the TemporaryDirectory
        )
    return out


def _dedup_representatives_oracle() -> str:
    return f"""
    WITH RECURSIVE {_minhash_edges_cte()},
    cands AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id
    ),
    edges AS (
      SELECT id_a, id_b
      FROM cands
        JOIN ws wa ON wa.doc_id = id_a
        JOIN ws wb ON wb.doc_id = id_b
      WHERE len(list_intersect(wa.w, wb.w)) * 1000000
            >= {_CLUST_T_PPM} * len(list_distinct(list_concat(wa.w, wb.w)))
    ),
    sym AS (
      SELECT id_a AS s, id_b AS d FROM edges
      UNION ALL
      SELECT id_b, id_a FROM edges
    ),
    reach(node, r) AS (
      SELECT doc_id, doc_id FROM documents
      UNION
      SELECT e.d, re.r FROM reach re JOIN sym e ON e.s = re.node
    ),
    clusters AS (SELECT node, min(r) AS cluster FROM reach GROUP BY node)
    SELECT cluster, CAST(min(node) AS BIGINT) AS rep_id,
           CAST(count(*) AS BIGINT) AS multiplicity
    FROM clusters GROUP BY cluster
    """


@register(
    "pipeline_dedup_representatives", oracle=_dedup_representatives_oracle()
)
def pipeline_dedup_representatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep-one-per-cluster dedup with multiplicity
    (operators/dedup.py dedup_representatives): one canonical doc per
    near-dup cluster plus the cluster size — the "dedup but keep the
    counts" step that lets kept examples be up-weighted instead of
    silently biasing the corpus. Exact-mode clustering so the oracle's
    recursive-CTE transitive closure reproduces every (cluster, rep,
    count) row; Σ multiplicity = |docs|."""
    from hive_udf_spark.operators.dedup import dedup_representatives

    docs = load_table(spark, sf_dir, "documents")
    return dedup_representatives(
        docs, "doc_id", "text", threshold=0.7, portable=True,
        sig_prefilter_margin=None, mode="exact",
    )


_CONT_T_PPM = 800_000


@register(
    "dedup_containment_pairs",
    oracle=rf"""
    WITH t AS (
      SELECT doc_id,
             [x for x in string_split_regex(text, '\s+') if x != ''] AS toks
      FROM documents
    ),
    sh AS (
      SELECT doc_id,
             list_distinct([toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2]
                            for i in generate_series(1, len(toks) - 2)]) AS w
      FROM t WHERE len(toks) >= 3
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(len(list_intersect(a.w, b.w)) AS BIGINT) AS inter_size,
           CAST(len(a.w) AS BIGINT) AS size_a,
           CAST(len(b.w) AS BIGINT) AS size_b,
           CAST((len(list_intersect(a.w, b.w)) * 1000000) // len(a.w) AS BIGINT)
             AS containment_ppm
    FROM sh a JOIN sh b ON a.doc_id != b.doc_id
    WHERE len(list_intersect(a.w, b.w)) * 1000000 >= {_CONT_T_PPM} * len(a.w)
    """,
)
def dedup_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT asymmetric containment join (operators/dedup.py
    containment_pairs): ordered pairs where ≥ 80% of a's word 3-gram
    shingle set lies inside b — the subset/boilerplate-absorption
    signal Jaccard misses (short doc inside long doc: high containment,
    low Jaccard). Shingles, not word sets: on this small-vocabulary
    corpus word sets are near-subsets of each other and the measure
    degenerates (documented in the operator). The probe side joins
    only on its rarest-shingle prefix; the container side indexes all
    shingles, so hot shingles never become join keys. The oracle is
    the brute-force enumeration itself — algorithmic equivalence, like
    the symmetric prefix-filter query."""
    from hive_udf_spark.operators.dedup import containment_pairs

    docs = load_table(spark, sf_dir, "documents")
    return containment_pairs(docs, "doc_id", "text", threshold=0.8, shingle_n=3)


_FUZZY_D = 2


def _fuzzy_oracle() -> str:
    from hive_udf_spark.operators.fuzzy import synth_title_sql

    return f"""
    WITH t AS (
      SELECT doc_id, {synth_title_sql('duckdb')} AS title FROM documents
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           a.title AS s_a, b.title AS s_b,
           CAST(levenshtein(a.title, b.title) AS INT) AS dist
    FROM t a JOIN t b ON a.doc_id < b.doc_id
     AND abs(length(a.title) - length(b.title)) <= {_FUZZY_D}
    WHERE levenshtein(a.title, b.title) <= {_FUZZY_D}
    """


@register("dedup_fuzzy_edit_join", oracle=_fuzzy_oracle())
def dedup_fuzzy_edit_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT edit-distance similarity join (operators/fuzzy.py
    edit_distance_join): every pair of synthesized document titles
    within Levenshtein distance 2, found via PassJoin segment blocking
    (PVLDB 2011) — pigeonhole one edit-free segment, probe the ±d
    position window, verify candidates with Spark's native
    ``levenshtein`` — never the cross product. The entity-resolution
    axis of the dedup family: single-character typos / OCR noise on
    short metadata strings, where shingle- and set-based hashing has
    nothing to grip. Titles derive from ``doc_id`` by the same
    dual-dialect generator discipline as the URL family (four
    corruption modes over shared bases), and the oracle brute-forces
    the length-banded cross join in DuckDB — so blocking exactness,
    not just the verifier, is what the hash check pins."""
    from hive_udf_spark.operators.fuzzy import edit_distance_join, synth_title_sql

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.expr(synth_title_sql("spark")).alias("title")
    )
    return edit_distance_join(docs, "doc_id", "title", max_dist=_FUZZY_D)


def _best_quality_rep_oracle() -> str:
    from hive_udf_spark.plans.text_queries import _TOKS_SQL

    return f"""
    WITH RECURSIVE {_minhash_edges_cte()},
    cands AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id
    ),
    edges AS (
      SELECT id_a, id_b
      FROM cands
        JOIN ws wa ON wa.doc_id = id_a
        JOIN ws wb ON wb.doc_id = id_b
      WHERE len(list_intersect(wa.w, wb.w)) * 1000000
            >= {_CLUST_T_PPM} * len(list_distinct(list_concat(wa.w, wb.w)))
    ),
    sym AS (
      SELECT id_a AS s, id_b AS d FROM edges
      UNION ALL
      SELECT id_b, id_a FROM edges
    ),
    reach(node, r) AS (
      SELECT doc_id, doc_id FROM documents
      UNION
      SELECT e.d, re.r FROM reach re JOIN sym e ON e.s = re.node
    ),
    clusters AS (SELECT node, min(r) AS cluster FROM reach GROUP BY node),
    q AS (
      SELECT doc_id,
        CAST(len(qw) AS INT) AS n_words,
        CAST(CASE WHEN len(qw) >= 3 THEN floor(1000000.0 * (
          (len(qw) - 2) - (SELECT count(DISTINCT x)
            FROM unnest([qw[i] || ' ' || qw[i+1] || ' ' || qw[i+2]
                         for i in range(1, len(qw) - 1)]) AS g(x))
        ) / (len(qw) - 2)) ELSE 0 END AS INT) AS dup_trigram_ppm
      FROM (SELECT doc_id, {_TOKS_SQL} AS qw FROM documents)
    ),
    rk AS (
      SELECT c.cluster, c.node AS doc_id, q.n_words, q.dup_trigram_ppm,
             row_number() OVER (
               PARTITION BY c.cluster
               ORDER BY q.dup_trigram_ppm ASC, q.n_words DESC, c.node ASC
             ) AS rn,
             count(*) OVER (PARTITION BY c.cluster) AS mult
      FROM clusters c JOIN q ON q.doc_id = c.node
    )
    SELECT cluster, doc_id AS rep_id,
           n_words AS rep_n_words, dup_trigram_ppm AS rep_dup_trigram_ppm,
           CAST(mult AS BIGINT) AS multiplicity
    FROM rk WHERE rn = 1
    """


@register("pipeline_dedup_best_quality_rep", oracle=_best_quality_rep_oracle())
def pipeline_dedup_best_quality_rep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-aware keep-one-per-cluster dedup: within each near-dup
    cluster keep the CLEANEST member — lowest Gopher dup-trigram share,
    then most words, then min id — instead of the arbitrary min-id
    canonical.  Min-id keeps whatever happens to sort first (often the
    truncated or boilerplate-padded variant); ranking by the repetition
    metric keeps the version worth training on, with multiplicity still
    carried for up-weighting.  Same exact-mode clustering (and oracle
    transitive closure) as pipeline_dedup_representatives; the quality
    metrics are the same map-side Gopher expressions the filter query
    pins, so the only new cost is one partitioned window over the
    cluster relation — fixed-width rows, never text."""
    from hive_udf_spark.functions.text import gopher_quality
    from hive_udf_spark.operators.dedup import dedup_clusters

    docs = load_table(spark, sf_dir, "documents")
    clusters = dedup_clusters(
        docs, "doc_id", "text", threshold=0.7, portable=True,
        sig_prefilter_margin=None, mode="exact",
    )
    m = gopher_quality("text")
    q = docs.select(
        "doc_id",
        m["n_words"].alias("n_words"),
        m["dup_trigram_ppm"].alias("dup_trigram_ppm"),
    )
    j = clusters.join(q, "doc_id")
    from pyspark.sql import Window

    win = Window.partitionBy("cluster").orderBy(
        F.col("dup_trigram_ppm").asc(), F.col("n_words").desc(), F.col("doc_id").asc()
    )
    ranked = j.select(
        "cluster", "doc_id", "n_words", "dup_trigram_ppm",
        F.row_number().over(win).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("cluster")).cast("long").alias(
            "multiplicity"
        ),
    )
    return ranked.where(F.col("rn") == 1).select(
        "cluster",
        F.col("doc_id").alias("rep_id"),
        F.col("n_words").alias("rep_n_words"),
        F.col("dup_trigram_ppm").alias("rep_dup_trigram_ppm"),
        "multiplicity",
    )
