"""Benchmark decontamination: n-gram overlap between a corpus and an
evaluation set (BASELINE north star — training-data pipeline surface).

The standard LLM-training hygiene step (GPT-3 appendix C / PaLM /
Llama data cards describe the same shape): a training document is
*contaminated* if it shares at least ``min_overlap`` exact word
n-grams with any benchmark item. The reference engine has no such
operator; this is part of the mandated extension set, built with the
same hash machinery as the dedup family (functions/hashing.py).

Scale shape (the part that matters at 100 TB):

* The benchmark side is small (thousands of prompts) — its exploded
  n-gram-hash table is **broadcast**, so the corpus-side probe is a
  map-side hash join at scan speed: no shuffle of corpus n-grams ever
  happens. The only shuffle is the per-(doc, bench) hit aggregation,
  whose input is just the matched rows (rare by construction).
* Corpus n-grams are hashed to 8-byte keys before the join —
  ``portable=False`` uses xxhash64; ``portable=True`` uses the 60-bit
  md5 family so a DuckDB oracle reproduces every hash bit-for-bit.
* If the benchmark set ever outgrows broadcast (tens of millions of
  n-grams), drop the ``broadcast()`` hint and the same plan degrades
  gracefully to a shuffled hash join keyed on the n-gram hash.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from hive_udf_spark.functions.hashing import fast_hash64, portable_hash60
from hive_udf_spark.functions.text import ngrams, tokenize


def ngram_hash_set(text: Column | str, n: int, portable: bool = False) -> Column:
    """Distinct hashed word n-grams of a text column (array<long>).

    Hashing the joined n-gram string (token1 SEP token2 ...) keeps the
    join key fixed-width no matter how long the n-gram text is.
    """
    grams = ngrams(tokenize(text), n)
    h = (lambda g: portable_hash60(g, n)) if portable else (lambda g: fast_hash64(g, n))
    return F.array_distinct(F.transform(grams, h))


def contamination_report(
    docs: DataFrame,
    bench: DataFrame,
    doc_id: str,
    doc_text: str,
    bench_id: str,
    bench_text: str,
    n: int = 8,
    min_overlap: int = 1,
    portable: bool = False,
) -> DataFrame:
    """Per (document, benchmark item) n-gram overlap report.

    Returns (doc_id, bench_id, overlap_ngrams, bench_ngrams,
    overlap_ppm) for every pair sharing ≥ ``min_overlap`` distinct word
    n-grams, where ``overlap_ppm`` = overlap/bench_total in parts per
    million (integer — engine-portable, no float division ambiguity).

    Plan: explode both sides to (id, ngram_hash); broadcast the bench
    side; map-side hash join on the 8-byte hash; aggregate hits. The
    corpus side never shuffles its n-grams — only matched (doc, bench)
    rows reach the aggregation exchange.
    """
    if min_overlap < 1:
        raise ValueError("min_overlap must be >= 1")
    bench_ng = bench.select(
        F.col(bench_id).alias("bench_id"),
        F.explode(ngram_hash_set(bench_text, n, portable)).alias("__g"),
    )
    bench_tot = bench_ng.groupBy("bench_id").agg(F.count("*").alias("bench_ngrams"))
    doc_ng = docs.select(
        F.col(doc_id).alias("doc_id"),
        F.explode(ngram_hash_set(doc_text, n, portable)).alias("__g"),
    )
    hits = (
        doc_ng.join(F.broadcast(bench_ng), "__g")
        .groupBy("doc_id", "bench_id")
        .agg(F.count("*").alias("overlap_ngrams"))
        .filter(F.col("overlap_ngrams") >= min_overlap)
    )
    return hits.join(F.broadcast(bench_tot), "bench_id").select(
        "doc_id",
        "bench_id",
        "overlap_ngrams",
        "bench_ngrams",
        # integer division in both engines (Spark `div`, DuckDB `//`):
        # exact, no float rounding ambiguity at ppm boundaries
        F.expr("(overlap_ngrams * CAST(1000000 AS BIGINT)) div bench_ngrams").alias(
            "overlap_ppm"
        ),
    )


def contaminated_doc_ids(
    docs: DataFrame,
    bench: DataFrame,
    doc_id: str,
    doc_text: str,
    bench_id: str,
    bench_text: str,
    n: int = 8,
    min_overlap: int = 1,
    portable: bool = False,
) -> DataFrame:
    """Distinct ids of documents hitting ANY benchmark item — the set a
    training run subtracts. Same plan as ``contamination_report`` with
    the per-bench detail aggregated away (partial-aggregatable)."""
    report = contamination_report(
        docs, bench, doc_id, doc_text, bench_id, bench_text, n, min_overlap, portable
    )
    return report.select("doc_id").distinct()


def semantic_decontam(
    corpus: DataFrame,
    eval_set: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    min_cosine: float = 0.8,
    nbits: int = 32,
    bands: int = 8,
    dim: int = 64,
    scale: int = 1000,
    seed: int = 42,
    broadcast_eval: bool = True,
    caches: list[DataFrame] | None = None,
) -> DataFrame:
    """SEMANTIC decontamination: flag corpus items whose EMBEDDING is
    within cosine ≥ ``min_cosine`` of any eval-set embedding — catches
    the paraphrased/reformatted benchmark leakage that exact n-gram
    overlap (``contamination_report`` above) misses. The embedding-space
    sibling of the n-gram operator, composing the hyperplane-LSH
    machinery of operators/similarity.py across two tables.

    Pipeline (all JVM, zero Python):

    1. both sides quantize + integer sign-bit signatures
       (``int_signature_expr`` — bit-reproducible, so a SQL oracle pins
       the whole pipeline, not just the verified output);
    2. candidates: band keys equi-join. The eval side is the small one
       (a benchmark suite), so its banded keys are **broadcast** —
       corpus rows never shuffle, the probe is map-side at scan speed
       (the same asymmetry as the n-gram decontam broadcast);
       ``broadcast_eval=False`` degrades to a shuffled join keyed on
       (band, bkey) when the eval side outgrows an executor.
    3. verify: exact quantized integer-cosine test; only verified hits
       aggregate.

    Output: one row per CONTAMINATED corpus id —
    (vec_id, n_hits, best_eval_id, best_dot_q) where n_hits counts
    distinct verified eval neighbors and best_* is the strongest hit
    (max dot, ties to the lower eval id). Anti-join the corpus against
    this to drop leaked items. Recall is the LSH band recall at the
    chosen threshold (high at the near-dup cosines that matter for
    leakage); candidates are verified exactly, so precision is 1.

    caches: as in embedding_near_pairs_lsh — pass a list to persist the
    prepped (quantized + signed) side tables across the band-probe and
    verify branches instead of re-scanning and re-quantizing the corpus
    twice; caller unpersists the handed-back frames.
    """
    from hive_udf_spark.operators.similarity import (
        dot_int,
        int_hyperplanes,
        int_signature_expr,
        quantize_vec,
    )

    if nbits % bands:
        raise ValueError("nbits must be divisible by bands")
    if not (1 <= nbits <= 62):
        raise ValueError("nbits must fit a signed BIGINT (1..62)")
    r = nbits // bands
    mask = F.lit((1 << r) - 1).cast("long")
    planes = int_hyperplanes(dim, nbits, seed, scale)

    def prep(df: DataFrame, role: str) -> DataFrame:
        q = df.select(
            F.col(id_col).alias(f"__{role}_id"),
            quantize_vec(vec_col, scale).alias("__qv"),
        )
        nrm = dot_int(F.col("__qv"), F.col("__qv"))
        return q.select(
            f"__{role}_id",
            F.col("__qv").alias(f"__{role}_qv"),
            nrm.alias(f"__{role}_n2"),
            int_signature_expr(planes).alias("__sig"),
        )

    def banded(df: DataFrame, role: str) -> DataFrame:
        return df.select(
            f"__{role}_id",
            F.explode(F.sequence(F.lit(0), F.lit(bands - 1))).alias("__band"),
            F.expr(f"shiftright(__sig, __band * {r})").bitwiseAND(mask).alias("__bkey"),
        )

    c = prep(corpus, "c")
    e = prep(eval_set, "e")
    if caches is not None:
        c = c.persist()
        e = e.persist()
        caches += [c, e]
    else:
        # both prepped sides feed the band probe AND the verify join:
        # materialize each once (lazy local checkpoint, reclaimed by the
        # ContextCleaner) instead of re-quantizing and re-signing the
        # corpus per plan branch
        c = c.localCheckpoint(eager=False)
        e = e.localCheckpoint(eager=False)
    e_bands = banded(e, "e")
    if broadcast_eval:
        e_bands = F.broadcast(e_bands)
    cands = (
        banded(c, "c")
        .join(e_bands, ["__band", "__bkey"])
        .select("__c_id", "__e_id")
        .distinct()
    )
    dq = dot_int(F.col("__c_qv"), F.col("__e_qv"))
    t2 = float(min_cosine) ** 2
    verified = (
        cands.join(c.select("__c_id", "__c_qv", "__c_n2"), "__c_id")
        .join(
            F.broadcast(e.select("__e_id", "__e_qv", "__e_n2"))
            if broadcast_eval
            else e.select("__e_id", "__e_qv", "__e_n2"),
            "__e_id",
        )
        .select("__c_id", "__e_id", dq.alias("__dq"), "__c_n2", "__e_n2")
        .filter(
            (F.col("__dq") > 0)
            & (
                (F.col("__dq") * F.col("__dq")).cast("double")
                >= F.lit(t2)
                * (F.col("__c_n2").cast("double") * F.col("__e_n2").cast("double"))
            )
        )
    )
    best = F.max(F.struct(F.col("__dq"), (-F.col("__e_id")).alias("__neg")))
    return verified.groupBy("__c_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_hits"),
        (-best.getField("__neg")).cast("long").alias("best_eval_id"),
        best.getField("__dq").cast("long").alias("best_dot_q"),
    ).select(
        F.col("__c_id").alias(id_col), "n_hits", "best_eval_id", "best_dot_q"
    )


def novelty_scores(
    docs: DataFrame,
    reference: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
) -> DataFrame:
    """Per-document n-gram NOVELTY against a reference corpus: the
    fraction of a doc's distinct word n-grams that appear nowhere in
    the reference — the memorization/novelty metric (novelty 0 ⇒ every
    n-gram already exists in the reference; low novelty flags
    regurgitation, high novelty flags out-of-distribution text). The
    scoring complement of ``contamination_report``: that one FILTERS on
    overlap with an eval set, this one SCORES every document against a
    (typically much larger) reference.

    Output: (id, n_ngrams, novel_ngrams, novelty_ppm) with novelty_ppm
    = (novel·1e6) div n_ngrams, integer-exact; docs with fewer than n
    tokens score (0, 0, 0) and stay addressable.

    Plan shape: both sides reduce to DISTINCT n-gram relations before
    the membership probe (one left join on the gram string — the only
    corpus-sized shuffle, fixed-width after hashing the gram if the
    caller pre-hashes); per-doc integer sums partial-aggregate. The
    reference side is |distinct reference grams| rows ONCE, reusable
    across scoring batches when persisted.
    """
    from hive_udf_spark.functions.text import ngrams, tokenize

    if n < 1:
        raise ValueError("n must be >= 1")
    doc_grams = docs.select(
        F.col(id_col).alias("__id"),
        F.explode(
            F.array_distinct(ngrams(tokenize(text_col), n))
        ).alias("__g"),
    )
    ref_grams = (
        reference.select(F.explode(ngrams(tokenize(text_col), n)).alias("__g"))
        .distinct()
        .withColumn("__seen", F.lit(1))
    )
    scored = (
        doc_grams.join(ref_grams, "__g", "left")
        .groupBy("__id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_ngrams"),
            F.count(F.when(F.col("__seen").isNull(), F.lit(1)))
            .cast("long")
            .alias("novel_ngrams"),
        )
    )
    base = docs.select(F.col(id_col).alias("__id"))
    return (
        base.join(scored, "__id", "left")
        .select(
            F.col("__id").alias(id_col),
            F.coalesce("n_ngrams", F.lit(0)).alias("n_ngrams"),
            F.coalesce("novel_ngrams", F.lit(0)).alias("novel_ngrams"),
            F.when(
                F.coalesce("n_ngrams", F.lit(0)) > 0,
                F.expr("(novel_ngrams * 1000000) div n_ngrams"),
            )
            .otherwise(F.lit(0))
            .cast("long")
            .alias("novelty_ppm"),
        )
    )
