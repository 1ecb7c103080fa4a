"""Bloom membership sketch — pure Catalyst expressions (Tier B).

Completes the sketch family around the reference's cardinality theme
(HLL/LC, reference UDAFCardinalityEstimator.java; CMS/top-k in
functions/freq.py): Bloom answers *membership* with no false negatives
and a tunable false-positive rate (Bloom 1970, the standard m-bit /
k-hash construction).

Spark's own ``BloomFilterAggregate`` exists only as an optimizer-internal
runtime filter (not a SQL/DataFrame function), so this is a native
re-expression with the same partial-aggregation shape the reference's
UDAF protocol mandates:

* **build**: each key sets k bit positions (``pmod(hash(key, seed), m)``);
  positions pack into 64-bit words; one ``bit_or`` hash-aggregate per
  word index (map-side partials — the shuffle carries at most
  ``m/64 × partitions`` words regardless of row count), then the ≤m/64
  set words fold into a single ``map<int, long>`` row.
* **probe**: broadcast the single-row bitmap, test all k positions with
  JVM map lookups + bit masks. No Python anywhere.

The headline use is **join prefiltering at 100 TB**: build a Bloom over
the small side's join keys, drop big-side rows that cannot match BEFORE
the shuffle join. False positives only ADD rows that the join itself
then rejects, so results are exactly the plain join's (the oracle); false
negatives cannot occur, so no matching row is ever lost.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from hive_udf_spark.functions.hashing import fast_hash64, portable_hash60

BLOOM_MAP_COL = "__bloom"


def _positions(key: Column, m_bits: int, k: int, portable: bool) -> list[Column]:
    h = portable_hash60 if portable else fast_hash64
    return [F.pmod(h(key, seed), F.lit(m_bits)) for seed in range(k)]


def bloom_build(
    df: DataFrame,
    key_col: str,
    m_bits: int = 1 << 20,
    k: int = 5,
    portable: bool = False,
) -> DataFrame:
    """Single-row DataFrame ``{__bloom: map<int, long>}`` — the Bloom
    bitmap as sparse packed words (absent word ⇒ all zero bits).

    Choose ``m_bits ≈ 10·n`` and ``k = 5..7`` for ~1% FPR
    (FPR ≈ (1 − e^{−kn/m})^k). The sparse map representation means an
    over-provisioned m costs nothing: only set words are stored.
    """
    if m_bits < 64 or m_bits % 64 != 0:
        raise ValueError("m_bits must be a multiple of 64, >= 64")
    if k < 1:
        raise ValueError("k must be >= 1")
    key = F.col(key_col)
    pos = F.explode(F.array(*_positions(key, m_bits, k, portable))).alias("__p")
    words = (
        df.select(pos)
        .select(
            (F.col("__p") / 64).cast("int").alias("__w"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(__p % 64 AS INT))").alias("__m"),
        )
        .groupBy("__w")
        .agg(F.bit_or("__m").alias("__word"))
    )
    return words.agg(
        F.map_from_entries(
            F.sort_array(F.collect_list(F.struct("__w", "__word")))
        ).alias(BLOOM_MAP_COL)
    )


def bloom_might_contain(
    key: Column, m_bits: int, k: int, portable: bool = False
) -> Column:
    """Boolean: all k bit positions of ``key`` are set in the bloom map
    (the ``__bloom`` column must be in scope — crossJoin the broadcast
    ``bloom_build`` row first). ``getbit`` takes the bit index as an
    expression, so no dynamic shifts are needed; an absent word reads
    as all-zero."""
    bf = F.col(BLOOM_MAP_COL)
    cond: Column | None = None
    for p in _positions(key, m_bits, k, portable):
        word = F.coalesce(F.element_at(bf, (p / 64).cast("int")), F.lit(0).cast("long"))
        bit_set = F.getbit(word, p % 64) == F.lit(1)
        cond = bit_set if cond is None else (cond & bit_set)
    assert cond is not None
    return cond


def bloom_prefilter_join(
    big: DataFrame,
    small: DataFrame,
    big_key: str,
    small_key: str,
    m_bits: int = 1 << 20,
    k: int = 5,
    portable: bool = False,
    how: str = "inner",
) -> DataFrame:
    """``big ⋈ small`` with a Bloom prefilter on the big side.

    Builds the bloom over ``small``'s keys, drops big-side rows whose
    key cannot be present (no false negatives ⇒ no lost matches), then
    runs the real join — which removes any Bloom false positives, so the
    result is EXACTLY the plain join's. At 100 TB this cuts the big
    side's shuffle volume by the key selectivity while the bloom itself
    is a broadcast of ≤ m/64 packed words.

    Only ``inner`` and (left-)``semi`` joins are accepted: the exactness
    guarantee relies on every dropped big-side row being absent from the
    plain join's result, which holds iff unmatched big rows don't appear
    in the output. A left/full outer join would silently LOSE the
    prefiltered unmatched rows — rejected rather than wrong.
    """
    if how not in ("inner", "semi", "leftsemi", "left_semi"):
        raise ValueError(
            "bloom_prefilter_join supports how='inner'/'semi' only: outer "
            f"joins would drop prefiltered unmatched rows (got {how!r})"
        )
    bf = bloom_build(small, small_key, m_bits, k, portable)
    pref = big.crossJoin(F.broadcast(bf)).filter(
        bloom_might_contain(F.col(big_key), m_bits, k, portable)
    ).drop(BLOOM_MAP_COL)
    return pref.join(small, pref[big_key] == small[small_key], how)
