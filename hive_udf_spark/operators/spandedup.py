"""Token-level duplicated-span detection and removal (ExactSubstr dedup).

The missing granularity between exact doc dedup and MinHash near-dedup:
find every *span of tokens* that occurs more than once across the corpus
(Lee et al. 2021, "Deduplicating Training Data Makes Language Models
Better" — the suffix-array ExactSubstr method, re-expressed relationally
at token granularity), then optionally strip those spans from the
documents while keeping the surrounding text.

Relational formulation (all JVM expressions, no Python):

1. **Postings**: every token n-gram becomes a fixed-width posting
   ``(key, doc_id, pos)`` where ``key`` hashes the n-gram text. The
   posting stream has one row per corpus token (minus n−1 per doc) —
   the same order of magnitude as a tokenize pass.
2. **Mark**: an n-gram position is *duplicated* when its key occurs
   ``min_count``+ times corpus-wide. Two marking plans:
   - ``mark_mode="join"`` (default, the scale path): map-side
     partial-counted ``groupBy(key)`` → keys with count ≥ min_count →
     inner join back to postings. Both shuffles carry fixed-width rows,
     and a pathologically hot key (boilerplate n-gram repeated 10M×)
     is split by AQE's skew-join handling — hot keys are *expected*
     here, they are exactly the duplicates we hunt.
   - ``mark_mode="window"``: one shuffle (``count over partition by
     key``), but a hot key pins one task (WindowExec cannot split a
     partition); only for corpora known free of mega-hot n-grams.
3. **Merge**: duplicated positions coalesce into maximal spans per doc
   with one gaps-and-islands pass (position p covers [p, p+n); a new
   island starts when p > running max of prior span ends). One shuffle
   by doc_id; output is one row per maximal span.
4. **Strip**: ``strip_duplicate_spans`` rebuilds each document minus
   its spans with a single O(len) ``aggregate`` fold over the doc's
   sorted span list — no per-token explode on the engine path.

``keep_first=True`` leaves the corpus-wide first occurrence (min
(doc_id, pos)) of each n-gram unmarked, so one canonical copy of every
duplicated passage survives (the usual training-data policy); the
default marks every occurrence.

Reference anchor: the reference engine has no dedup surface (its repo is
the cardinality UDAF, UDAFCardinalityEstimator.java:58-68); this module
is part of the mandated LLM-pipeline extension set (SURVEY.md §2.3),
sharing the hashing/oracle discipline of operators/dedup.py.

Scale: shuffles carry (60-or-64-bit key, doc_id, int pos) triples and
span rows — never document text; the only join touching text is the
final per-doc span assembly / strip, keyed by doc_id. At 100 TB the
posting build is embarrassingly parallel at scan, the mark join is
AQE-skew-splittable, and the island merge shuffles one int pair per
duplicated position.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from hive_udf_spark.functions.hashing import fast_hash64, portable_hash60
from hive_udf_spark.functions.text import ngrams, tokenize

__all__ = [
    "ngram_postings",
    "duplicate_spans",
    "strip_duplicate_spans",
    "build_ngram_index",
    "probe_duplicate_spans",
    "update_ngram_index",
]


def _gram_key(gram: Column, portable: bool) -> Column:
    return portable_hash60(gram, 0) if portable else fast_hash64(gram, 0)


def _tokens_table(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(__id, __tk): one tokenize pass per document, shared between the
    posting build and the span-text / strip rebuild so the corpus text
    is tokenized ONCE per pipeline (r14: the spans pipeline previously
    re-tokenized per plan branch — 6 scans of the corpus in one plan)."""
    return df.select(F.col(id_col).alias("__id"), tokenize(text_col).alias("__tk"))


def _postings_from_tokens(toks_df: DataFrame, n: int, portable: bool) -> DataFrame:
    """(key, __id, __pos) posting per token n-gram from a prepared
    (__id, __tk) relation; no shuffle."""
    if n < 1:
        raise ValueError("n must be >= 1")
    return toks_df.select(
        "__id",
        F.posexplode(ngrams(F.col("__tk"), n)).alias("__pos", "__gram"),
    ).select(
        _gram_key(F.col("__gram"), portable).alias("__key"),
        "__id",
        "__pos",
    )


def ngram_postings(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
    portable: bool = False,
) -> DataFrame:
    """(key, id, pos) posting per token n-gram; pos is the 0-based start
    token index. Built at scan time (tokenize → ngrams → posexplode);
    no shuffle."""
    return _postings_from_tokens(_tokens_table(df, id_col, text_col), n, portable)


def _marked_positions(
    postings: DataFrame,
    min_count: int,
    keep_first: bool,
    mark_mode: str,
) -> DataFrame:
    """Postings restricted to duplicated keys → distinct (__id, __pos)."""
    if mark_mode == "window":
        wk = Window.partitionBy("__key")
        cols = [F.count(F.lit(1)).over(wk).alias("__cnt")]
        if keep_first:
            first = F.min(F.struct("__id", "__pos")).over(wk)
            cols.append(
                (
                    (F.col("__id") == first["__id"]) & (F.col("__pos") == first["__pos"])
                ).alias("__is_first")
            )
        marked = postings.select("__id", "__pos", *cols).filter(
            F.col("__cnt") >= min_count
        )
        if keep_first:
            marked = marked.filter(~F.col("__is_first"))
        return marked.select("__id", "__pos")
    if mark_mode != "join":
        raise ValueError(f"mark_mode must be 'join' or 'window', got {mark_mode!r}")
    # join mode consumes the posting stream twice (dup-key aggregate +
    # join back); materialize it once — lazy local checkpoint of
    # fixed-width (key, id, pos) rows — instead of re-running the
    # tokenize → ngrams → posexplode pipeline for each branch
    postings = postings.localCheckpoint(eager=False)
    aggs = [F.count(F.lit(1)).alias("__cnt")]
    if keep_first:
        aggs.append(F.min(F.struct("__id", "__pos")).alias("__first"))
    dup_keys = postings.groupBy("__key").agg(*aggs).filter(F.col("__cnt") >= min_count)
    marked = postings.join(dup_keys, "__key")
    if keep_first:
        marked = marked.filter(
            (F.col("__id") != F.col("__first.__id"))
            | (F.col("__pos") != F.col("__first.__pos"))
        )
    return marked.select("__id", "__pos")


def _spans_from_marked(marked, n: int, id_col: str):
    """Distinct duplicated (__id, __pos) rows → maximal spans per doc
    (the gaps-and-islands merge shared by the batch and incremental
    paths). One shuffle by doc id."""
    w = Window.partitionBy("__id").orderBy("__pos")
    prev_max_end = F.max(F.col("__pos") + n).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    islands = marked.select(
        "__id",
        "__pos",
        (F.col("__pos") > F.coalesce(prev_max_end, F.lit(-1)))
        .cast("int")
        .alias("__new"),
    ).select(
        "__id",
        "__pos",
        F.sum("__new").over(w.rowsBetween(Window.unboundedPreceding, 0)).alias("__grp"),
    )
    return (
        islands.groupBy("__id", "__grp")
        .agg(
            F.min("__pos").alias("span_start"),
            (F.max("__pos") + n).alias("span_end"),
        )
        .select(
            F.col("__id").alias(id_col),
            "span_start",
            "span_end",
            (F.col("span_end") - F.col("span_start")).alias("span_tokens"),
        )
    )


def duplicate_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
    min_count: int = 2,
    keep_first: bool = False,
    portable: bool = False,
    mark_mode: str = "join",
    with_text: bool = True,
) -> DataFrame:
    """Maximal duplicated token spans per document.

    Returns one row per span: (id_col, span_start, span_end, span_tokens
    [, span_text]) with token indices 0-based and span_end exclusive.
    Spans within a doc are disjoint and non-adjacent by construction
    (overlapping/touching duplicated n-grams merge into one span).
    """
    toks_df = _tokens_table(df, id_col, text_col)
    if with_text:
        # the tokens feed both the posting build and the span-text
        # slice: one tokenize pass, materialized lazily
        toks_df = toks_df.localCheckpoint(eager=False)
    postings = _postings_from_tokens(toks_df, n, portable)
    marked = _marked_positions(postings, min_count, keep_first, mark_mode)
    spans = _spans_from_marked(marked, n, id_col)
    if not with_text:
        return spans
    toks = toks_df.withColumnRenamed("__id", id_col)
    return spans.join(toks, id_col).select(
        id_col,
        "span_start",
        "span_end",
        "span_tokens",
        F.array_join(
            F.slice(F.col("__tk"), F.col("span_start") + 1, F.col("span_tokens")), " "
        ).alias("span_text"),
    )


def strip_duplicate_spans(
    df: DataFrame,
    spans: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    **span_kwargs,
) -> DataFrame:
    """Documents with every duplicated span removed.

    Returns (id_col, clean_text, total_tokens, dup_tokens). ``spans``
    defaults to ``duplicate_spans(df, ..., with_text=False)`` with the
    same kwargs. The rebuild is a single ``aggregate`` fold over each
    doc's sorted span list emitting the inter-span slices — O(doc
    length), no token explode; docs without spans pass through intact.
    """
    toks_df = _tokens_table(df, id_col, text_col).localCheckpoint(eager=False)
    if spans is None:
        # build the spans from the SAME tokenized relation the rebuild
        # below slices — one tokenize pass for the whole strip pipeline
        n = span_kwargs.pop("n", 5)
        portable = span_kwargs.pop("portable", False)
        postings = _postings_from_tokens(toks_df, n, portable)
        marked = _marked_positions(
            postings,
            span_kwargs.pop("min_count", 2),
            span_kwargs.pop("keep_first", False),
            span_kwargs.pop("mark_mode", "join"),
        )
        if span_kwargs:
            raise TypeError(f"unexpected span kwargs: {sorted(span_kwargs)}")
        spans = _spans_from_marked(marked, n, id_col)
    per_doc = spans.groupBy(id_col).agg(
        F.sort_array(
            F.collect_list(F.struct(F.col("span_start").alias("s"), F.col("span_end").alias("e")))
        ).alias("__spans")
    )
    toks = F.col("__tk")
    # Fold state: (cursor, kept-token array). Spans are disjoint and
    # sorted, so each slice length (sp.s − cursor) is ≥ 0.
    zero = F.struct(
        F.lit(0).cast("int").alias("c"), F.array().cast("array<string>").alias("a")
    )
    folded = F.aggregate(
        F.col("__spans"),
        zero,
        lambda st, sp: F.struct(
            sp["e"].cast("int").alias("c"),
            F.concat(st["a"], F.slice(toks, st["c"] + 1, sp["s"] - st["c"])).alias("a"),
        ),
        lambda st: F.concat(st["a"], F.slice(toks, st["c"] + 1, F.size(toks) - st["c"])),
    )
    kept = F.when(F.col("__spans").isNull(), toks).otherwise(folded)
    return (
        toks_df.withColumnRenamed("__id", id_col)
        .join(per_doc, id_col, "left")
        .select(
            id_col,
            F.array_join(kept, " ").alias("clean_text"),
            F.size(toks).alias("total_tokens"),
            (F.size(toks) - F.size(kept)).alias("dup_tokens"),
        )
    )


def build_ngram_index(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
    portable: bool = False,
) -> DataFrame:
    """Persistable corpus n-gram index: one (key, cnt) row per DISTINCT
    n-gram — the span-dedup analogue of operators/dedup.py's
    build_minhash_index. Counts merge additively (union + sum per key),
    so per-ingest batches extend the index without ever rescanning or
    re-tokenizing the corpus — the no-rescan-at-100 TB contract."""
    return (
        ngram_postings(df, id_col, text_col, n=n, portable=portable)
        .groupBy("__key")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )


def probe_duplicate_spans(
    index: DataFrame,
    batch: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
    min_count: int = 2,
    portable: bool = False,
) -> DataFrame:
    """Incremental ExactSubstr: mark spans of a NEW ingest batch that
    duplicate the indexed corpus OR repeat within the batch itself —
    total occurrences (index count + batch count) ≥ ``min_count``.

    Only the batch is tokenized; the corpus participates as its (key,
    cnt) index. The probe joins batch postings to batch-key counts
    (partial-aggregated) left-joined against the index — fixed-width
    keys, AQE-skew-splittable, no corpus rescan per ingest. Returns
    batch spans (id, span_start, span_end, span_tokens)."""
    # the batch posting stream feeds the count aggregate AND the mark
    # join: materialize it once (lazy local checkpoint) so the batch is
    # tokenized/exploded a single time
    postings = ngram_postings(
        batch, id_col, text_col, n=n, portable=portable
    ).localCheckpoint(eager=False)
    batch_counts = postings.groupBy("__key").agg(
        F.count(F.lit(1)).cast("bigint").alias("__bc")
    )
    totals = batch_counts.join(
        index.select(F.col("__key"), F.col("cnt").alias("__ic")), "__key", "left"
    ).select(
        "__key",
        (F.col("__bc") + F.coalesce(F.col("__ic"), F.lit(0))).alias("__total"),
    )
    dup_keys = totals.filter(F.col("__total") >= min_count).select("__key")
    marked = postings.join(dup_keys, "__key").select("__id", "__pos")
    return _spans_from_marked(marked, n, id_col)


def update_ngram_index(index: DataFrame, batch_index: DataFrame) -> DataFrame:
    """Merged index after an ingest: union + sum per key (additive,
    order-independent — the CMS merge algebra on posting counts)."""
    return (
        index.unionByName(batch_index)
        .groupBy("__key")
        .agg(F.sum("cnt").cast("bigint").alias("cnt"))
    )
