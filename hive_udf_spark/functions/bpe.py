"""Byte-pair-encoding tokenizer training and corpus encoding.

Real learned BPE (Sennrich et al. 2016) over the corpus, Spark-first:

* **Vocabulary reduction**: the corpus first collapses to distinct
  (word, count) rows — the classic BPE-trainer trick. All iteration
  work happens on the vocab table (orders of magnitude smaller than
  the corpus; bounded by distinct-word count, not corpus size).
* **Training iteration** (× num_merges): adjacent symbol pairs are
  counted corpus-weighted with one partial-aggregated groupBy; the
  argmax pair (count desc, then lexicographic — deterministic) is a
  single collected row per iteration (bounded driver state: k rows
  total); the merge applies to every vocab word with one greedy
  left-to-right ``aggregate`` fold — pure JVM, no Python.
  ``localCheckpoint`` truncates lineage each iteration so iteration i
  does not recompute merges 1..i−1.
* **Encoding**: corpus words broadcast-join the trained vocab's
  segmentation — per-document sub-token counts without re-running any
  merge at corpus scale. Unseen words (inference time) fall back to
  ``apply_merges_expr``, the same fold chain as training.

Pair counting matches the reference BPE exactly: overlapping adjacent
pairs all count ("aaa" contributes (a,a) twice); merge application is
greedy left-to-right non-overlapping ("aaaa" + (a,a) → "aa","aa").
No end-of-word marker is appended (documented choice; add one by
mapping words to word+suffix before training if needed).

The reference engine has no tokenizer surface (its repo is the
cardinality UDAF); this belongs to the mandated text-analysis extension
set (SURVEY.md §2.3) next to the regex BPE-ish counter in
functions/text.py — that one approximates, this one learns.

Scale: the corpus is touched exactly twice (vocab build, encode join);
everything between runs on the vocab relation. Per-iteration shuffle is
partial-aggregated (pair, count) rows; driver state is one row per
iteration.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from hive_udf_spark.functions.text import tokenize

__all__ = [
    "word_vocab",
    "bpe_train",
    "apply_merge_expr",
    "apply_merges_expr",
    "bpe_doc_token_counts",
]


def word_vocab(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, cnt, syms) per distinct corpus word; syms starts as the
    word's character array."""
    words = df.select(F.explode(tokenize(text_col)).alias("word"))
    return (
        words.groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select("word", "cnt", F.split("word", "").alias("syms"))
    )


def _pair_counts(vocab: DataFrame) -> DataFrame:
    """Corpus-weighted adjacent-pair counts over the vocab's symbol
    arrays — overlapping occurrences all count, mirroring the reference
    BPE's get_stats."""
    pairs = F.when(
        F.size("syms") >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size("syms") - 1),
            lambda i: F.struct(
                F.element_at("syms", i).alias("a"),
                F.element_at("syms", i + 1).alias("b"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<a:string,b:string>>"))
    return (
        vocab.select("cnt", F.explode(pairs).alias("p"))
        .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .agg(F.sum("cnt").alias("c"))
    )


def apply_merge_expr(syms: Column, a: str, b: str) -> Column:
    """Greedy left-to-right non-overlapping application of merge (a, b)
    to a symbol array — one ``aggregate`` fold, O(len), JVM-only."""
    la, lb = F.lit(a), F.lit(b)
    zero = F.struct(
        F.array().cast("array<string>").alias("acc"),
        F.lit(None).cast("string").alias("carry"),
    )
    return F.aggregate(
        syms,
        zero,
        lambda st, s: F.when(
            st["carry"].isNotNull() & (st["carry"] == la) & (s == lb),
            F.struct(
                F.concat(st["acc"], F.array(F.concat(la, lb))).alias("acc"),
                F.lit(None).cast("string").alias("carry"),
            ),
        ).otherwise(
            F.struct(
                F.when(
                    st["carry"].isNotNull(), F.concat(st["acc"], F.array(st["carry"]))
                )
                .otherwise(st["acc"])
                .alias("acc"),
                s.alias("carry"),
            )
        ),
        lambda st: F.when(
            st["carry"].isNotNull(), F.concat(st["acc"], F.array(st["carry"]))
        ).otherwise(st["acc"]),
    )


def apply_merges_expr(syms: Column, merges: list[tuple[str, str]]) -> Column:
    """Chain of merge folds in training order (inference path for words
    outside the trained vocab)."""
    for a, b in merges:
        syms = apply_merge_expr(syms, a, b)
    return syms


def bpe_train(
    df: DataFrame, text_col: str = "text", num_merges: int = 8
) -> tuple[list[tuple[str, str]], DataFrame]:
    """Learn ``num_merges`` BPE merges on the corpus.

    Returns (merges in training order, final vocab (word, cnt, syms)).
    Stops early when no adjacent pair remains. Each iteration collects
    exactly one argmax row; ties break (count desc, a asc, b asc) so
    training is deterministic."""
    if num_merges < 0:
        raise ValueError("num_merges must be >= 0")
    vocab = word_vocab(df, text_col).localCheckpoint(eager=True)
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        best = (
            _pair_counts(vocab)
            .orderBy(F.col("c").desc(), F.col("a").asc(), F.col("b").asc())
            .limit(1)
            .collect()
        )
        if not best:
            break
        a, b = best[0].a, best[0].b
        merges.append((a, b))
        vocab = vocab.select(
            "word", "cnt", apply_merge_expr(F.col("syms"), a, b).alias("syms")
        ).localCheckpoint(eager=True)
    return merges, vocab


def bpe_doc_token_counts(
    df: DataFrame,
    vocab: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document sub-token counts by broadcast-joining corpus words to
    the trained vocab's segmentation (no merge re-application at corpus
    scale). Every corpus word is in the vocab by construction."""
    seg = F.broadcast(vocab.select("word", F.size("syms").alias("__n")))
    words = df.select(F.col(id_col), F.explode(tokenize(text_col)).alias("word"))
    return (
        words.join(seg, "word")
        .groupBy(id_col)
        .agg(F.sum("__n").cast("bigint").alias("n_subtokens"))
    )
