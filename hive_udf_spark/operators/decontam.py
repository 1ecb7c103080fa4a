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
