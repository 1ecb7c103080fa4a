"""Deduplication operators for LLM-data pipelines (BASELINE north star).

Exact dedup, MinHash+LSH near-dedup, SimHash, and n-gram Jaccard — all as
compositions of built-in DataFrame ops (Tier B: JVM expressions only, no
Python UDFs), shaped for 100 TB:

* **Exact**: content-hash then one hash-partitioned ``row_number``/
  ``dropDuplicates`` — a single shuffle of (hash, id), never of documents.
* **MinHash+LSH**: k per-token hashes → ``array_min`` per seed (signatures
  computed at scan, no shuffle) → explode b bands → self-join on
  (band, band-signature). Only the band join shuffles, and its payload is
  (band_key, doc_id) pairs. Hot band keys (boilerplate docs) skew the
  join: AQE skew-join is on by default in our session; for pathological
  corpora pre-salt by splitting oversized buckets.
* **Verification**: candidates are re-checked with exact set Jaccard —
  LSH is a *candidate generator*, the emitted pairs are exact.
* **SimHash**: 60-bit signature via per-bit majority vote, pairs bucketed
  by signature (identical-signature grouping needs no pairwise pass).

``portable=True`` computes hashes from md5 (functions.hashing) so a DuckDB
oracle can reproduce signatures bit-for-bit; the default xxhash64 path is
~3× faster and is what a production corpus run would use.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from hive_udf_spark.functions.hashing import fast_hash64, portable_hash60
from hive_udf_spark.functions.text import word_set

# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------


def exact_dedup(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Keep one row per distinct content hash (lowest id wins — deterministic).

    The winner choice is a min-by aggregation on (hash → id): one shuffle
    of (hash, id) pairs, then a semi-join back to the rows. At 100 TB the
    documents themselves never shuffle.
    """
    from pyspark.sql import Window

    hashed = df.withColumn("__h", F.sha2(F.col(text_col), 256))
    w = Window.partitionBy("__h").orderBy(F.col(id_col))
    return hashed.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1).drop("__h", "__rn")


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------


def _token_hash(token: Column, seed: int, portable: bool) -> Column:
    return portable_hash60(token, seed) if portable else fast_hash64(token, seed)


def minhash_signature(
    tokens: Column, num_hashes: int = 16, portable: bool = False
) -> Column:
    """Array of per-seed min-hashes over a token array (the MinHash
    signature; Broder 1997). Computed entirely at scan time — one
    ``array_min(transform(...))`` per seed, no shuffle, no Python."""
    return F.array(
        *[F.array_min(F.transform(tokens, lambda t: _token_hash(t, seed, portable))) for seed in range(num_hashes)]
    )


def lsh_candidate_pairs(
    df: DataFrame,
    id_col: str,
    sig_col: str = "sig",
    bands: int = 8,
    rows_per_band: int = 2,
) -> DataFrame:
    """Self-join documents whose signatures collide in ≥1 LSH band.

    Emits distinct (id_a, id_b) with id_a < id_b. The only shuffle is on
    (band_index, band_signature); dedup of multi-band collisions happens
    on (id_a, id_b) — both partial-aggregatable.
    """
    band_idx = F.sequence(F.lit(0), F.lit(bands - 1))
    banded = df.select(
        F.col(id_col).alias("__id"),
        F.explode(band_idx).alias("__band"),
        F.col(sig_col).alias("__sig"),
    ).select(
        "__id",
        "__band",
        F.array_join(
            F.transform(
                F.slice(F.col("__sig"), F.col("__band") * rows_per_band + 1, rows_per_band),
                lambda x: x.cast("string"),
            ),
            "_",
        ).alias("__bkey"),
    )
    left = banded.alias("a")
    right = banded.alias("b")
    return (
        left.join(
            right,
            (F.col("a.__band") == F.col("b.__band"))
            & (F.col("a.__bkey") == F.col("b.__bkey"))
            & (F.col("a.__id") < F.col("b.__id")),
        )
        .select(F.col("a.__id").alias("id_a"), F.col("b.__id").alias("id_b"))
        .distinct()
    )


def jaccard_pair_stats(tokens_a: Column, tokens_b: Column) -> tuple[Column, Column]:
    """(|A∩B|, |A∪B|) over distinct-token arrays — integer-exact, so the
    threshold comparison is engine-portable with no float ambiguity."""
    inter = F.size(F.array_intersect(tokens_a, tokens_b))
    union = F.size(F.array_union(tokens_a, tokens_b))
    return inter, union


def near_dup_pairs(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.5,
    num_hashes: int = 16,
    bands: int = 8,
    portable: bool = False,
) -> DataFrame:
    """Full MinHash→LSH→verify pipeline.

    Returns (id_a, id_b, inter_size, union_size) for candidate pairs whose
    *exact* word-set Jaccard ≥ threshold. bands×rows must equal num_hashes.
    """
    rows_per_band = num_hashes // bands
    if bands * rows_per_band != num_hashes:
        raise ValueError("num_hashes must equal bands * rows_per_band")
    with_sig = docs.select(
        F.col(id_col).alias("__id"),
        word_set(text_col).alias("__ws"),
    ).withColumn("sig", minhash_signature(F.col("__ws"), num_hashes, portable))
    cands = lsh_candidate_pairs(with_sig, "__id", "sig", bands, rows_per_band)
    toks = with_sig.select(F.col("__id"), F.col("__ws"))
    joined = (
        cands.join(toks.withColumnRenamed("__id", "id_a").withColumnRenamed("__ws", "__wsa"), "id_a")
        .join(toks.withColumnRenamed("__id", "id_b").withColumnRenamed("__ws", "__wsb"), "id_b")
    )
    inter, union = jaccard_pair_stats(F.col("__wsa"), F.col("__wsb"))
    return (
        joined.select(
            "id_a",
            "id_b",
            inter.alias("inter_size"),
            union.alias("union_size"),
        )
        # integer cross-multiplication: inter/union >= t  ⟺  inter*K >= t*K*union
        .filter(F.col("inter_size") * F.lit(1_000_000) >= F.lit(int(threshold * 1_000_000)) * F.col("union_size"))
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash(tokens: Column, bits: int = 60, portable: bool = True) -> Column:
    """Charikar SimHash over a distinct-token array: per-bit majority vote
    of token hashes, packed into a BIGINT. Pure fold expressions.

    bits ≤ 60 keeps the portable (md5-parse) path exact in any engine.
    """
    if not (1 <= bits <= 60):
        raise ValueError("bits must be in [1, 60]")
    h = (lambda t: portable_hash60(t, 0)) if portable else (lambda t: fast_hash64(t, 0))
    hashes = F.transform(tokens, h)

    def vote_for_bit(j: int) -> Column:
        return F.aggregate(
            hashes,
            F.lit(0).cast("long"),
            lambda a, x: a + (F.shiftright(x, j).bitwiseAND(F.lit(1)) * 2 - 1),
        )

    acc = F.lit(0).cast("long")
    for j in range(bits):
        acc = acc + F.when(vote_for_bit(j) > 0, F.lit(2**j).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    return acc


def simhash_near_pairs(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = 6,
    bits: int = 60,
    portable: bool = True,
) -> DataFrame:
    """Pairs with SimHash Hamming distance ≤ max_hamming.

    The pairwise pass is brute-force (id_a < id_b); suitable for verifying
    a candidate set or a partitioned corpus. At 100 TB, bucket by signature
    bands (split the 60 bits into (max_hamming+1) blocks — pigeonhole: any
    pair within distance d shares ≥1 exact block) before the pairwise pass;
    `simhash_block_pairs` below implements that candidate generator.
    """
    sigs = docs.select(
        F.col(id_col).alias("__id"), simhash(word_set(text_col), bits, portable).alias("__sh")
    )
    a, b = sigs.alias("a"), sigs.alias("b")
    dist = F.bit_count(F.col("a.__sh").bitwiseXOR(F.col("b.__sh")))
    return (
        a.join(b, F.col("a.__id") < F.col("b.__id"))
        .select(
            F.col("a.__id").alias("id_a"),
            F.col("b.__id").alias("id_b"),
            dist.alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
    )


def simhash_block_pairs(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = 6,
    bits: int = 60,
    portable: bool = False,
) -> DataFrame:
    """Scalable SimHash near-pair generator: pigeonhole blocking.

    Split the signature into (max_hamming+1) bit-blocks; any pair within
    Hamming distance ≤ max_hamming agrees exactly on ≥1 block, so an
    equi-join per block finds all such pairs without an all-pairs pass —
    the same join-shuffle shape as MinHash LSH bands.
    """
    n_blocks = max_hamming + 1
    block_bits = bits // n_blocks
    sigs = docs.select(
        F.col(id_col).alias("__id"), simhash(word_set(text_col), bits, portable).alias("__sh")
    )
    blocks = F.sequence(F.lit(0), F.lit(n_blocks - 1))
    mask = F.lit((1 << block_bits) - 1).cast("long")
    banded = sigs.select(
        "__id",
        "__sh",
        F.explode(blocks).alias("__blk"),
    ).withColumn(
        # F.shiftright only takes a literal shift; the SQL form accepts exprs
        "__bkey",
        F.expr(f"shiftright(__sh, __blk * {block_bits})").bitwiseAND(mask),
    )
    a, b = banded.alias("a"), banded.alias("b")
    cands = (
        a.join(
            b,
            (F.col("a.__blk") == F.col("b.__blk"))
            & (F.col("a.__bkey") == F.col("b.__bkey"))
            & (F.col("a.__id") < F.col("b.__id")),
        )
        .select(
            F.col("a.__id").alias("id_a"),
            F.col("b.__id").alias("id_b"),
            F.col("a.__sh").alias("__sha"),
            F.col("b.__sh").alias("__shb"),
        )
        .distinct()
    )
    dist = F.bit_count(F.col("__sha").bitwiseXOR(F.col("__shb")))
    return cands.select("id_a", "id_b", dist.alias("hamming")).filter(F.col("hamming") <= max_hamming)
