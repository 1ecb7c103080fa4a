"""Skew-handling join utilities.

AQE's skew-join splitting (on in our session) handles most skew at
runtime by splitting oversized shuffle partitions. Salting is the static
complement for the pathological case AQE can't fix: a SINGLE join key so
hot that one task would still process it alone (LSH band keys over
boilerplate corpora, null-heavy foreign keys, celebrity users).

``salted_join``: the large (skewed) side gets a deterministic salt in
[0, salt_factor) derived from a unique column; the small side is
replicated salt_factor times with every salt value. The join key becomes
(key, salt), spreading each hot key over salt_factor tasks. Replication
multiplies the small side's shuffle volume by salt_factor — use for
many-to-one joins where the right side is modest (dimensions, lookup
tables) but too big or too hot to broadcast outright.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["salted_join"]


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    salt_factor: int = 8,
    big_unique_col: str | None = None,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``big ⋈ small`` on column ``on`` with salt-spread keys.

    ``big_unique_col``: a column of ``big`` whose values distribute
    uniformly (an id); the salt is pmod(xxhash64(id), salt_factor) —
    deterministic, so retries/speculative tasks stay consistent (never
    use rand() for salt). Defaults to the join key itself ONLY when no id
    exists; that spreads *distinct* keys but not a single hot key, so pass
    a real unique column for hot-key skew.

    Result equals ``big.join(small, on, how)`` exactly (verified in
    tests/test_skew.py); only the physical key distribution changes.
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left joins")
    salt_src = F.col(big_unique_col) if big_unique_col else F.col(on)
    b = big.withColumn("__salt", F.pmod(F.xxhash64(salt_src), F.lit(salt_factor)).cast("int"))
    s = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt_factor - 1)))
    )
    out = b.join(s, [on, "__salt"], how)
    return out.drop("__salt")
