"""Similarity search over embedding columns (BASELINE north star).

Three tiers:

* ``topk_dot_quantized`` — brute-force top-k by **integer-quantized dot
  product**. Quantizing to ints makes the score exact (no float summation
  order), so results are deterministic and engine-portable — this is the
  oracle-checkable baseline. Top-k uses two-phase pruning: partition-local
  row_number ≤ k first, so the final shuffle carries k·P rows per query,
  not the corpus.
* ``topk_cosine`` — float cosine via zip_with/aggregate fold (JVM);
  accuracy-tested against numpy in tests, not oracle-hashed (float ranks
  are not portable across engines).
* ``ann_hyperplane_lsh`` — random-hyperplane LSH: sign-bit signatures
  (one Arrow-batched numpy matmul per batch — the justified pandas-UDF
  case), banded bucket join for candidates, exact cosine re-rank.
  Approximate; recall is measured in tests against brute force.

At 100 TB: the corpus side stays partitioned; the query side is small and
broadcast. LSH bucket joins shuffle (band, bucket) keys only. For IVF-style
sharding, partition the corpus by bucket prefix so probes prune partitions.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

DEFAULT_QUANT_SCALE = 1000


def quantize_vec(vec: Column | str, scale: int = DEFAULT_QUANT_SCALE) -> Column:
    """array<float> → array<long> of round(x·scale): exact integer space."""
    c = F.col(vec) if isinstance(vec, str) else vec
    return F.transform(c, lambda x: F.round(x.cast("double") * scale).cast("long"))


def dot_int(a: Column, b: Column) -> Column:
    """Exact integer dot product (fold over zip_with) — order-independent."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0).cast("long"), lambda acc, x: acc + x
    )


def dot_double(a: Column, b: Column) -> Column:
    """Float dot product as a sequential left fold (deterministic per pair)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm_double(a: Column) -> Column:
    return F.sqrt(dot_double(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot_double(a, b) / (norm_double(a) * norm_double(b))


def _two_phase_topk(scored: DataFrame, query_key: str, order_cols: list[Column], k: int) -> DataFrame:
    """Partition-local top-k then global top-k: the shuffle after phase 1
    carries ≤ k rows per (query, input-partition) instead of the corpus."""
    local_w = Window.partitionBy(query_key, F.spark_partition_id()).orderBy(*order_cols)
    pruned = scored.withColumn("__lrn", F.row_number().over(local_w)).filter(F.col("__lrn") <= k)
    final_w = Window.partitionBy(query_key).orderBy(*order_cols)
    return pruned.withColumn("rank", F.row_number().over(final_w)).filter(F.col("rank") <= k).drop("__lrn")


def topk_dot_quantized(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    scale: int = DEFAULT_QUANT_SCALE,
) -> DataFrame:
    """Brute-force top-k neighbors by exact quantized dot product.

    Returns (query_id, neighbor_id, dot_q, rank); ties broken by
    neighbor_id, so output is fully deterministic. Self-matches excluded.
    The query side is broadcast (it is the small side by construction).
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), quantize_vec(vec_col, scale).alias("__qv")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), quantize_vec(vec_col, scale).alias("__cv")
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", dot_int(F.col("__qv"), F.col("__cv")).alias("dot_q"))
    )
    return _two_phase_topk(scored, "query_id", [F.desc("dot_q"), F.asc("neighbor_id")], k).select(
        "query_id", "neighbor_id", "dot_q", "rank"
    )


def embedding_near_pairs(
    vecs: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    min_cosine: float = 0.35,
    scale: int = DEFAULT_QUANT_SCALE,
) -> DataFrame:
    """All pairs with cosine ≥ threshold, decided in exact integer space:

        cos(a,b) ≥ t  ⟺  dot_q > 0  ∧  dot_q² ≥ t²·|a|²·|b|²   (quantized)

    Operands stay ≤ ~3e17 (64 dims, |x|≲3, scale 1000): inside int64 in
    both engines; the final comparison is IEEE-identical everywhere.

    This is the O(n²) exact BASELINE (it joins on id inequality alone) —
    use it as the oracle/ground truth at test scale. The scale path is
    ``embedding_near_pairs_lsh`` below: same verify, LSH-bucketed
    candidate generation instead of all pairs.
    """
    q = vecs.select(F.col(id_col).alias("__id"), quantize_vec(vec_col, scale).alias("__qv"))
    a, b = q.alias("a"), q.alias("b")
    dq = dot_int(F.col("a.__qv"), F.col("b.__qv"))
    na = dot_int(F.col("a.__qv"), F.col("a.__qv"))
    nb = dot_int(F.col("b.__qv"), F.col("b.__qv"))
    t2 = float(min_cosine) ** 2
    pairs = (
        a.join(b, F.col("a.__id") < F.col("b.__id"))
        .select(
            F.col("a.__id").alias("id_a"),
            F.col("b.__id").alias("id_b"),
            dq.alias("__dq"),
            na.alias("__na"),
            nb.alias("__nb"),
        )
        .filter(
            (F.col("__dq") > 0)
            & (
                (F.col("__dq") * F.col("__dq")).cast("double")
                >= F.lit(t2) * (F.col("__na").cast("double") * F.col("__nb").cast("double"))
            )
        )
    )
    return pairs.select("id_a", "id_b", F.col("__dq").alias("dot_q"))


# ---------------------------------------------------------------------------
# Approximate NN: random-hyperplane LSH
# ---------------------------------------------------------------------------


def hyperplanes(dim: int, nbits: int, seed: int = 42) -> np.ndarray:
    """Deterministic Gaussian hyperplanes, unit rows."""
    rng = np.random.default_rng(seed)
    H = rng.standard_normal((nbits, dim))
    return H / np.linalg.norm(H, axis=1, keepdims=True)


def int_hyperplanes(
    dim: int, nbits: int, seed: int = 42, scale: int = DEFAULT_QUANT_SCALE
) -> list[list[int]]:
    """Hyperplanes quantized to integers: sign tests become exact integer
    comparisons, reproducible bit-for-bit by any engine (the portable
    analogue of functions.hashing.portable_hash60 for the vector world)."""
    H = hyperplanes(dim, nbits, seed)
    return [[int(v) for v in row] for row in np.round(H * scale).astype(np.int64)]


def embedding_near_pairs_lsh(
    vecs: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    min_cosine: float = 0.35,
    nbits: int = 32,
    bands: int = 8,
    dim: int = 64,
    scale: int = DEFAULT_QUANT_SCALE,
    seed: int = 42,
    caches: list[DataFrame] | None = None,
) -> DataFrame:
    """Near-pairs with cosine ≥ threshold via hyperplane-LSH candidate
    buckets + exact integer-cosine verify — the scale path that replaces
    ``embedding_near_pairs``'s all-pairs self-join.

    Pipeline (everything JVM-side Catalyst expressions, zero Python):

    1. signature: ``nbits`` sign bits of integer dot products against
       quantized hyperplanes, packed into a BIGINT — computed at scan.
    2. candidates: explode ``bands`` bit-bands, equi-join on
       (band, band-key). Only (band_key, id) pairs shuffle — the same
       join shape as MinHash LSH bands (dedup.lsh_candidate_pairs).
    3. verify: candidates are re-checked with the exact quantized
       cosine test of ``embedding_near_pairs``, so every emitted pair
       is exact; LSH only generates candidates.

    Because both signatures and verify are integer-exact, a SQL oracle
    reproduces the ENTIRE pipeline (plans/similarity_queries.py), not
    just the verified output.

    Recall is threshold-dependent (sign-bit collision probability is
    1 − θ/π): at near-duplicate thresholds (cos ≥ 0.8, the dedup use
    case) a (32, 8) config catches ~95%+ of pairs while pruning most of
    the O(n²) candidate space; at loose thresholds like 0.35 the sign
    bits carry little signal (θ ≈ 70° → p ≈ 0.61 vs 0.5 random) and
    pruning weakens — measured in tests/test_similarity.py. Tune
    (nbits, bands): more bands → recall; more bits/band → pruning.

    caches: as in dedup.near_dup_pairs — pass a list to persist the
    signature table across the join branches; caller unpersists.
    """
    if nbits % bands:
        raise ValueError("nbits must be divisible by bands")
    if not (1 <= nbits <= 62):
        raise ValueError("nbits must fit a signed BIGINT (1..62)")
    r = nbits // bands
    mask = F.lit((1 << r) - 1).cast("long")
    planes = int_hyperplanes(dim, nbits, seed, scale)

    q = vecs.select(F.col(id_col).alias("__id"), quantize_vec(vec_col, scale).alias("__qv"))
    # One SQL string for the whole signature instead of nbits×dim Column
    # objects: building the equivalent expression tree through the Python
    # API costs thousands of py4j round trips (~3.5 s of pure plan
    # CONSTRUCTION at nbits=32, dim=64); a single parsed expr is
    # milliseconds and yields the identical Catalyst plan.
    terms = []
    for j, row in enumerate(planes):
        vals = ", ".join(str(v) for v in row)
        dot = (
            f"aggregate(zip_with(__qv, array({vals}), (x, y) -> x * y), "
            f"CAST(0 AS BIGINT), (a, x) -> a + x)"
        )
        terms.append(f"IF({dot} > 0, CAST({2 ** j} AS BIGINT), CAST(0 AS BIGINT))")
    sigs = q.withColumn("__sig", F.expr(" + ".join(terms)))
    if caches is not None:
        sigs = sigs.persist()
        caches.append(sigs)

    banded = sigs.select(
        "__id",
        F.explode(F.sequence(F.lit(0), F.lit(bands - 1))).alias("__band"),
        F.col("__sig"),
    ).withColumn(
        "__bkey", F.expr(f"shiftright(__sig, __band * {r})").bitwiseAND(mask)
    ).select("__id", "__band", "__bkey")
    a, b = banded.alias("a"), banded.alias("b")
    cands = (
        a.join(
            b,
            (F.col("a.__band") == F.col("b.__band"))
            & (F.col("a.__bkey") == F.col("b.__bkey"))
            & (F.col("a.__id") < F.col("b.__id")),
        )
        .select(F.col("a.__id").alias("id_a"), F.col("b.__id").alias("id_b"))
        .distinct()
    )

    qv = sigs.select("__id", "__qv")
    nrm = dot_int(F.col("__qv"), F.col("__qv"))
    side_a = qv.select(
        F.col("__id").alias("id_a"), F.col("__qv").alias("__qa"), nrm.alias("__na")
    )
    side_b = qv.select(
        F.col("__id").alias("id_b"), F.col("__qv").alias("__qb"), nrm.alias("__nb")
    )
    dq = dot_int(F.col("__qa"), F.col("__qb"))
    t2 = float(min_cosine) ** 2
    return (
        cands.join(side_a, "id_a")
        .join(side_b, "id_b")
        .select("id_a", "id_b", dq.alias("__dq"), F.col("__na"), F.col("__nb"))
        .filter(
            (F.col("__dq") > 0)
            & (
                (F.col("__dq") * F.col("__dq")).cast("double")
                >= F.lit(t2) * (F.col("__na").cast("double") * F.col("__nb").cast("double"))
            )
        )
        .select("id_a", "id_b", F.col("__dq").alias("dot_q"))
    )


def _signature_udf(planes: np.ndarray):
    nbits = planes.shape[0]
    weights = (1 << np.arange(nbits, dtype=np.int64))

    @F.pandas_udf(T.LongType())
    def sig(embs: pd.Series) -> pd.Series:
        M = np.asarray(embs.tolist(), dtype=np.float64)  # (batch, dim)
        bits = (M @ planes.T) > 0  # (batch, nbits)
        return pd.Series(bits.astype(np.int64) @ weights)

    return sig


def ann_hyperplane_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    nbits: int = 16,
    bands: int = 4,
    dim: int = 64,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k cosine neighbors via hyperplane-LSH banding.

    Signature = nbits sign bits (one numpy matmul per Arrow batch);
    candidates collide in ≥1 of `bands` bit-bands; exact cosine re-ranks.
    Returns (query_id, neighbor_id, cos_sim, rank). Tune nbits/bands for
    the recall/cost point; recall is measured in tests.

    Shuffle discipline: the band explode and the candidate ``distinct``
    carry (id, band, bkey) rows ONLY — never embeddings. Vectors join
    back onto the deduplicated id-pair stream afterwards (query side
    broadcast, corpus side one equi-join), so the bands× blow-up and the
    distinct's shuffle+compare both run on fixed-width keys. The earlier
    formulation shipped both 64-float arrays through the explode and
    compared them inside distinct — bands×·2·dim floats of dead shuffle
    weight per candidate.
    """
    if nbits % bands:
        raise ValueError("nbits must be divisible by bands")
    band_bits = nbits // bands
    mask = (1 << band_bits) - 1
    planes = hyperplanes(dim, nbits, seed)
    sig = _signature_udf(planes)

    def band_keys(df: DataFrame, role: str) -> DataFrame:
        s = df.select(F.col(id_col).alias(f"{role}_id"), sig(F.col(vec_col)).alias("__sig"))
        return (
            s.select(
                f"{role}_id",
                F.explode(F.sequence(F.lit(0), F.lit(bands - 1))).alias("__band"),
                F.col("__sig").alias("__s"),
            )
            .withColumn(
                "__bkey",
                F.expr(f"shiftright(__s, __band * {band_bits})").bitwiseAND(F.lit(mask)),
            )
            .select(f"{role}_id", "__band", "__bkey")
        )

    qk = band_keys(queries, "query")
    ck = band_keys(corpus, "neighbor")
    cands = (
        ck.join(
            F.broadcast(qk),
            (ck["__band"] == qk["__band"])
            & (ck["__bkey"] == qk["__bkey"])
            & (F.col("neighbor_id") != F.col("query_id")),
        )
        .select("query_id", "neighbor_id")
        .distinct()
    )
    qv = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qv"))
    cv = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cv"))
    scored = (
        cands.join(F.broadcast(qv), "query_id")
        .join(cv, "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            cosine(F.col("__qv"), F.col("__cv")).alias("cos_sim"),
        )
    )
    return _two_phase_topk(scored, "query_id", [F.desc("cos_sim"), F.asc("neighbor_id")], k).select(
        "query_id", "neighbor_id", "cos_sim", "rank"
    )


def embedding_dedup_clusters(
    vecs: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    min_cosine: float = 0.35,
    nbits: int = 32,
    bands: int = 8,
    dim: int = 64,
    scale: int = DEFAULT_QUANT_SCALE,
    seed: int = 42,
) -> DataFrame:
    """Embedding near-duplicate dedup with linear output:
    (id, cluster, is_canonical) — the vector-side twin of
    ``dedup.dedup_clusters``. Edges come from the LSH-bucketed near-pair
    generator (exact integer-cosine verified), components from the
    contracted min-label propagation, so the whole pipeline inherits
    both scale paths. Deterministic end to end (integer signatures,
    fixed seed): an exact SQL oracle reproduces it including the
    clustering fixpoint."""
    from hive_udf_spark.operators.dedup import connected_components

    caches: list[DataFrame] = []
    pairs = embedding_near_pairs_lsh(
        vecs,
        id_col,
        vec_col,
        min_cosine=min_cosine,
        nbits=nbits,
        bands=bands,
        dim=dim,
        scale=scale,
        seed=seed,
        caches=caches,
    ).select("id_a", "id_b")
    pairs = pairs.localCheckpoint(eager=True)
    for cached in caches:
        cached.unpersist()
    nodes = vecs.select(F.col(id_col).alias("id"))
    comps = connected_components(pairs, nodes, edges_materialized=True)
    return comps.select(
        F.col("id").alias(id_col),
        F.col("component").alias("cluster"),
        (F.col("id") == F.col("component")).alias("is_canonical"),
    )


def topk_cosine(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Brute-force float-cosine top-k (JVM fold; numpy-verified in tests)."""
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qv"))
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cv"))
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", cosine(F.col("__qv"), F.col("__cv")).alias("cos_sim"))
    )
    return _two_phase_topk(scored, "query_id", [F.desc("cos_sim"), F.asc("neighbor_id")], k).select(
        "query_id", "neighbor_id", "cos_sim", "rank"
    )


# ---------------------------------------------------------------------------
# Approximate NN: IVF (inverted file over k-means cells)
# ---------------------------------------------------------------------------


def kmeans_centroids(
    vecs: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 32,
    seed: int = 42,
    max_iter: int = 10,
    train_size: int = 100_000,
) -> np.ndarray:
    """Deterministic spherical k-means centroids (unit rows), trained on a
    bounded driver-side sample — the FAISS recipe: IVF coarse quantizers
    are trained on ~100k vectors regardless of corpus size, so training
    cost is O(1) in corpus scale.

    The sample is a seeded hash filter (xxhash64(id) mod K == 0 with K
    sized from a metadata-cheap count), then a sort of the ≈train_size
    SAMPLE for determinism — not a global orderBy of the corpus, which
    at 100 TB would be a full sort just to take the first 100k rows.
    Deterministic across runs and partitionings: membership depends only
    on id hashes, order only on ids."""
    n_total = vecs.count()  # parquet metadata count — no scan
    k_mod = max(1, int(n_total) // int(train_size))
    rows = (
        vecs.select(F.col(id_col).alias("i"), F.col(vec_col).alias("v"))
        .filter(F.pmod(F.xxhash64(F.lit(seed), F.col(id_col)), F.lit(k_mod)) == 0)
        .orderBy("i")
        .limit(int(train_size))
        .collect()
    )
    X = np.asarray([r["v"] for r in rows], dtype=np.float64)
    X = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    rng = np.random.default_rng(seed)
    C = X[rng.choice(len(X), size=min(n_centroids, len(X)), replace=False)]
    for _ in range(max_iter):
        assign = np.argmax(X @ C.T, axis=1)
        for j in range(len(C)):
            members = X[assign == j]
            if len(members):
                c = members.sum(axis=0)
                C[j] = c / np.maximum(np.linalg.norm(c), 1e-12)
    return C


def _ivf_assign_udf(centroids: np.ndarray, nprobe: int):
    """pandas UDF: top-nprobe centroid ids per vector (cosine argmax)."""

    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def probe(embs: pd.Series) -> pd.Series:
        M = np.asarray(embs.tolist(), dtype=np.float64)
        M = M / np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-12)
        sims = M @ centroids.T  # (batch, K)
        top = np.argsort(-sims, axis=1)[:, :nprobe].astype(np.int32)
        return pd.Series(list(top))

    return probe


def ann_ivf(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_centroids: int = 32,
    nprobe: int = 4,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k cosine neighbors via an IVF index.

    Corpus vectors are assigned to their nearest k-means cell (ONE cell
    each — the inverted file); queries probe their ``nprobe`` nearest
    cells; candidates meet in a hash equi-join on cell id and are re-ranked
    by exact cosine. Returns (query_id, neighbor_id, cos_sim, rank).

    Scale path: centroids are a small broadcast closure (K×dim floats);
    the corpus shuffles once on cell id — 1/K of the corpus lands in each
    cell, so per-cell candidate lists stay bounded; recall tunes with
    nprobe (tests measure it against brute-force cosine).
    """
    C = kmeans_centroids(corpus, id_col, vec_col, n_centroids, seed)
    assign1 = _ivf_assign_udf(C, 1)
    probe_n = _ivf_assign_udf(C, nprobe)

    cc = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__nv"),
        F.explode(assign1(F.col(vec_col))).alias("__cell"),
    )
    cq = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("__qv"),
        F.explode(probe_n(F.col(vec_col))).alias("__cell"),
    )
    scored = (
        cc.join(F.broadcast(cq), ["__cell"])
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine(F.col("__qv"), F.col("__nv")).alias("cos_sim"),
        )
    )
    return _two_phase_topk(scored, "query_id", [F.desc("cos_sim"), F.asc("neighbor_id")], k).select(
        "query_id", "neighbor_id", "cos_sim", "rank"
    )


# ---------------------------------------------------------------------------
# Product quantization (PQ) — compressed-domain ANN
# ---------------------------------------------------------------------------


def pq_codebooks(
    vecs: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_subspaces: int = 8,
    n_codes: int = 256,
    seed: int = 42,
    max_iter: int = 10,
    train_size: int = 100_000,
) -> np.ndarray:
    """Per-subspace k-means codebooks, shape (n_subspaces, n_codes,
    sub_dim) — Jégou et al. 2011 product quantization. Trained on the
    same bounded, hash-sampled driver-side set as the IVF coarse
    quantizer (O(1) in corpus scale); deterministic via seeded init.
    """
    n_total = vecs.count()
    k_mod = max(1, int(n_total) // int(train_size))
    rows = (
        vecs.select(F.col(id_col).alias("i"), F.col(vec_col).alias("v"))
        .filter(F.pmod(F.xxhash64(F.lit(seed), F.col(id_col)), F.lit(k_mod)) == 0)
        .orderBy("i")
        .limit(int(train_size))
        .collect()
    )
    X = np.asarray([r["v"] for r in rows], dtype=np.float64)
    dim = X.shape[1]
    if dim % n_subspaces != 0:
        raise ValueError(f"dim {dim} not divisible by n_subspaces {n_subspaces}")
    sub = dim // n_subspaces
    rng = np.random.default_rng(seed)
    books = np.empty((n_subspaces, min(n_codes, len(X)), sub), dtype=np.float64)
    for s in range(n_subspaces):
        Xs = X[:, s * sub : (s + 1) * sub]
        C = Xs[rng.choice(len(Xs), size=books.shape[1], replace=False)]
        for _ in range(max_iter):
            d2 = ((Xs[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
            assign = np.argmin(d2, axis=1)
            for j in range(len(C)):
                members = Xs[assign == j]
                if len(members):
                    C[j] = members.mean(axis=0)
        books[s] = C
    return books


def _pq_encode_udf(books: np.ndarray):
    """pandas UDF: vector → per-subspace nearest-code ids (array<int>)."""
    n_sub, _, sub = books.shape

    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def encode(embs: pd.Series) -> pd.Series:
        M = np.asarray(embs.tolist(), dtype=np.float64)
        codes = np.empty((len(M), n_sub), dtype=np.int32)
        for s in range(n_sub):
            Xs = M[:, s * sub : (s + 1) * sub]
            d2 = ((Xs[:, None, :] - books[s][None, :, :]) ** 2).sum(axis=2)
            codes[:, s] = np.argmin(d2, axis=1)
        return pd.Series(list(codes))

    return encode


def _pq_lut_udf(books: np.ndarray):
    """pandas UDF: query vector → flattened inner-product lookup table
    (array<double>, n_subspaces × n_codes): lut[s·n_codes + j] =
    ⟨q_sub[s], codebook[s][j]⟩. Computed once per QUERY (the tiny side);
    corpus-side scoring is then pure JVM table lookups."""
    n_sub, n_codes, sub = books.shape

    @F.pandas_udf(T.ArrayType(T.DoubleType()))
    def lut(embs: pd.Series) -> pd.Series:
        M = np.asarray(embs.tolist(), dtype=np.float64)
        out = np.empty((len(M), n_sub * n_codes), dtype=np.float64)
        for s in range(n_sub):
            Qs = M[:, s * sub : (s + 1) * sub]
            out[:, s * n_codes : (s + 1) * n_codes] = Qs @ books[s].T
        return pd.Series(list(out))

    return lut


def ann_pq(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_subspaces: int = 8,
    n_codes: int = 256,
    refine: int = 50,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k cosine neighbors via product quantization with
    asymmetric distance computation (ADC) and exact re-rank.

    The corpus is ENCODED once — n_subspaces small ints per vector
    (the 100 TB point: the ADC scan reads ~8-byte codes instead of
    dim×4-byte vectors, a ~32× IO reduction at dim 64). Each query
    precomputes an inner-product lookup table over the codebooks (tiny,
    broadcast with the query); approximate scores are then pure JVM
    ``zip_with`` lookups over the codes — no Python in the corpus scan.
    The ADC top-``refine`` per query is re-ranked by exact cosine for
    the final top-k. Returns (query_id, neighbor_id, cos_sim, rank);
    recall is measured in tests against brute force.
    """
    books = pq_codebooks(
        corpus, id_col, vec_col, n_subspaces, n_codes, seed=seed
    )
    n_codes_eff = books.shape[1]
    encode = _pq_encode_udf(books)
    lut = _pq_lut_udf(books)

    codes = corpus.select(
        F.col(id_col).alias("neighbor_id"), encode(F.col(vec_col)).alias("__codes")
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("__qv"),
        lut(F.col(vec_col)).alias("__lut"),
    )
    # ADC: approx_ip = Σ_s lut[s·n_codes + codes[s]] — JVM-side lookups
    approx = (
        codes.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            "__qv",
            F.aggregate(
                F.zip_with(
                    F.col("__codes"),
                    F.sequence(F.lit(0), F.lit(n_subspaces - 1)),
                    lambda code, s: F.element_at(
                        F.col("__lut"), (s * n_codes_eff + code + 1).cast("int")
                    ),
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ).alias("__adc"),
        )
    )
    cand = _two_phase_topk(
        approx, "query_id", [F.desc("__adc"), F.asc("neighbor_id")], refine
    ).drop("rank")
    # exact re-rank of the refine-sized candidate set
    nv = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__nv"))
    rescored = cand.join(nv, "neighbor_id").select(
        "query_id", "neighbor_id", cosine(F.col("__qv"), F.col("__nv")).alias("cos_sim")
    )
    final_w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        rescored.withColumn("rank", F.row_number().over(final_w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )
