"""Similarity-search queries.

``similarity_topk_dot`` and ``similarity_near_pairs`` are decided in exact
integer space (quantized vectors), so DuckDB reproduces them exactly —
rank comparisons included. The float-cosine and LSH variants are
rows-only here and accuracy/recall-tested against numpy in
tests/test_similarity.py (float ranks are not portable across engines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hive_udf_spark.operators.similarity import (
    ann_hyperplane_lsh,
    embedding_near_pairs,
    embedding_near_pairs_lsh,
    int_hyperplanes,
    quantize_vec,
    topk_dot_quantized,
)
from hive_udf_spark.plans.registry import register
from hive_udf_spark.sources import load_table

_QV_CTE = """
qv AS (
  SELECT vec_id,
         [CAST(round(CAST(e AS DOUBLE) * 1000) AS BIGINT) for e in embedding] AS q
  FROM embeddings
)
"""

_DOT = "list_sum(list_transform(generate_series(1, 64), i -> a.q[i] * b.q[i]))"


@register(
    "similarity_topk_dot",
    oracle=f"""
    WITH {_QV_CTE},
    pairs AS (
      SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
             CAST({_DOT} AS BIGINT) AS dot_q
      FROM qv a JOIN qv b ON b.vec_id != a.vec_id
      WHERE a.vec_id % 10 = 0
    ),
    ranked AS (
      SELECT query_id, neighbor_id, dot_q,
             row_number() OVER (PARTITION BY query_id ORDER BY dot_q DESC, neighbor_id) AS "rank"
      FROM pairs
    )
    SELECT query_id, neighbor_id, dot_q, "rank" FROM ranked WHERE "rank" <= 5
    """,
)
def similarity_topk_dot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force top-5 neighbors by exact quantized dot product for the
    vec_id%10 query subset; deterministic ranks (dot desc, id asc)."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 10 == 0)
    return topk_dot_quantized(emb, queries, k=5)


@register(
    "similarity_near_pairs",
    oracle=f"""
    WITH {_QV_CTE},
    nv AS (
      SELECT vec_id, q, CAST(list_sum(list_transform(q, x -> x * x)) AS BIGINT) AS n2
      FROM qv
    ),
    pairs AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             CAST({_DOT} AS BIGINT) AS dot_q,
             a.n2 AS na, b.n2 AS nb
      FROM nv a JOIN nv b ON a.vec_id < b.vec_id
    )
    SELECT id_a, id_b, dot_q FROM pairs
    WHERE dot_q > 0
      AND CAST(dot_q * dot_q AS DOUBLE) >= 0.1225 * (CAST(na AS DOUBLE) * CAST(nb AS DOUBLE))
    """,
)
def similarity_near_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (cos ≥ 0.35) decided by
    integer cross-multiplication — exact in both engines."""
    emb = load_table(spark, sf_dir, "embeddings")
    return embedding_near_pairs(emb, min_cosine=0.35)


_NP_LSH_NBITS = 32
_NP_LSH_BANDS = 8
_NP_LSH_T = 0.35


def _np_lsh_ctes() -> tuple[str, str]:
    """(CTE chain, verify predicate) for the integer hyperplane-LSH
    near-pair pipeline — shared by the pair oracle and the cluster
    oracle so both pin the identical construction."""
    r = _NP_LSH_NBITS // _NP_LSH_BANDS
    mask = (1 << r) - 1
    planes = int_hyperplanes(64, _NP_LSH_NBITS, seed=42)
    h_lit = "[" + ", ".join("[" + ", ".join(str(v) for v in row) + "]" for row in planes) + "]"
    t2 = float(_NP_LSH_T) ** 2
    ctes = f"""{_QV_CTE},
    h AS (SELECT {h_lit} AS hh),
    sig AS (
      SELECT vec_id, q,
        CAST(list_sum(list_transform(generate_series(1, {_NP_LSH_NBITS}), j ->
          CASE WHEN list_sum(list_transform(generate_series(1, 64), i -> q[i] * hh[j][i])) > 0
               THEN (CAST(1 AS BIGINT) << (j - 1)) ELSE 0 END)) AS BIGINT) AS sig
      FROM qv, h
    ),
    bands AS (
      SELECT vec_id, band, (sig >> (band * {r})) & {mask} AS bkey
      FROM sig, unnest(generate_series(0, {_NP_LSH_BANDS - 1})) AS t(band)
    ),
    cands AS (
      SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.bkey = b.bkey AND a.vec_id < b.vec_id
    ),
    nv AS (
      SELECT vec_id, q, CAST(list_sum(list_transform(q, x -> x * x)) AS BIGINT) AS n2
      FROM qv
    ),
    pairs AS (
      SELECT c.id_a, c.id_b,
             CAST(list_sum(list_transform(generate_series(1, 64), i -> a.q[i] * b.q[i])) AS BIGINT) AS dot_q,
             a.n2 AS na, b.n2 AS nb
      FROM cands c
        JOIN nv a ON a.vec_id = c.id_a
        JOIN nv b ON b.vec_id = c.id_b
    )"""
    verify = (
        f"dot_q > 0 AND CAST(dot_q * dot_q AS DOUBLE) >= {t2!r} "
        f"* (CAST(na AS DOUBLE) * CAST(nb AS DOUBLE))"
    )
    return ctes, verify


def _near_pairs_lsh_oracle() -> str:
    """Generated SQL reproducing the FULL hyperplane-LSH near-pair
    pipeline (signatures → bands → candidates → exact verify) in DuckDB.
    Like the MinHash oracle, this pins candidate generation itself, not
    just the verified output — both engines agree bit-for-bit because
    hyperplanes and vectors are quantized to integers."""
    ctes, verify = _np_lsh_ctes()
    return f"""
    WITH {ctes}
    SELECT id_a, id_b, dot_q FROM pairs
    WHERE {verify}
    """


@register("similarity_near_pairs_lsh", oracle=_near_pairs_lsh_oracle())
def similarity_near_pairs_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-pairs (cos ≥ 0.35) via hyperplane-LSH candidate
    buckets + exact integer-cosine verify — the scale path replacing the
    all-pairs self-join of ``similarity_near_pairs``. The generated
    oracle reproduces the whole pipeline (integer signatures, banding,
    bucket join, verify), so candidate generation is hash-checked too;
    recall vs the exact pair set is measured in tests/test_similarity.py."""
    emb = load_table(spark, sf_dir, "embeddings")
    return embedding_near_pairs_lsh(
        emb, min_cosine=_NP_LSH_T, nbits=_NP_LSH_NBITS, bands=_NP_LSH_BANDS
    )


def _embedding_clusters_oracle() -> str:
    ctes, verify = _np_lsh_ctes()
    return f"""
    WITH RECURSIVE {ctes},
    edges AS (SELECT id_a, id_b FROM pairs WHERE {verify}),
    sym AS (
      SELECT id_a AS s, id_b AS d FROM edges
      UNION ALL
      SELECT id_b, id_a FROM edges
    ),
    reach(node, r) AS (
      SELECT vec_id, vec_id FROM embeddings
      UNION
      SELECT e.d, re.r FROM reach re JOIN sym e ON e.s = re.node
    )
    SELECT node AS vec_id, min(r) AS cluster, (node = min(r)) AS is_canonical
    FROM reach GROUP BY node
    """


@register("similarity_dedup_clusters", oracle=_embedding_clusters_oracle())
def similarity_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-duplicate CLUSTERS (cos ≥ 0.35): LSH-bucketed
    verified near-pairs → contracted connected components → linear
    (id, cluster, is_canonical) output — the vector-side twin of
    dedup_clusters_linear, with the same recursive-CTE oracle pattern
    pinning signatures, banding, verify, and the CC fixpoint."""
    from hive_udf_spark.operators.similarity import embedding_dedup_clusters

    emb = load_table(spark, sf_dir, "embeddings")
    return embedding_dedup_clusters(
        emb, min_cosine=_NP_LSH_T, nbits=_NP_LSH_NBITS, bands=_NP_LSH_BANDS
    )


# Containment-verdict pattern (SURVEY.md §5.2 adapted for ANN): the
# Spark query joins each ANN hit against the exact cosine top-M superset
# (M=100; measured max exact rank of any hit: 36 LSH / 17 IVF at sf0.01,
# deterministic — fixed hyperplane seed / k-means sample) and emits
# (query_id, rank, in_top100). The oracle is the constant-true table, so
# an ANN regression that surfaces a non-top-100 neighbor, drops a query,
# or returns <k rows breaks the hash.
_ANN_VERDICT_ORACLE = """
SELECT vec_id AS query_id, "rank", true AS in_top100
FROM embeddings, unnest(generate_series(1, 5)) AS t("rank")
WHERE vec_id % 10 = 0
"""


def _ann_containment_verdict(spark: SparkSession, sf_dir: str, ann_df) -> DataFrame:
    from hive_udf_spark.operators.similarity import topk_cosine

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 10 == 0)
    superset = topk_cosine(emb, queries, k=100).select(
        "query_id", "neighbor_id", F.lit(True).alias("__hit")
    )
    return ann_df.join(superset, ["query_id", "neighbor_id"], "left").select(
        "query_id",
        F.col("rank").cast("long").alias("rank"),
        F.coalesce(F.col("__hit"), F.lit(False)).alias("in_top100"),
    )


@register("similarity_ann_lsh", oracle=_ANN_VERDICT_ORACLE)
def similarity_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hyperplane-LSH approximate top-5 cosine neighbors (vec_id%10
    queries), hash-checked via the containment verdict: every returned
    neighbor must sit in the exact cosine top-100 for its query, 5 rows
    per query. Recall@5 vs brute force is additionally asserted in
    tests/test_similarity.py."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 10 == 0)
    ann = ann_hyperplane_lsh(emb, queries, k=5, nbits=16, bands=4)
    return _ann_containment_verdict(spark, sf_dir, ann)


@register("similarity_ann_ivf", oracle=_ANN_VERDICT_ORACLE)
def similarity_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF approximate top-5 cosine neighbors (vec_id%10 queries, k-means
    cells + nprobe=4), hash-checked via the same containment verdict as
    the LSH variant; recall is asserted in tests/test_similarity.py."""
    from hive_udf_spark.operators.similarity import ann_ivf

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 10 == 0)
    ann = ann_ivf(emb, queries, k=5, n_centroids=16, nprobe=4)
    return _ann_containment_verdict(spark, sf_dir, ann)


@register("similarity_ann_pq", oracle=_ANN_VERDICT_ORACLE)
def similarity_ann_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN (8 subspaces × 64 codes, ADC scan over
    8-int codes, exact re-rank of the top-50) — hash-checked via the same
    top-100 containment verdict as the LSH/IVF variants; recall@5 vs
    brute force is asserted in tests/test_similarity.py."""
    from hive_udf_spark.operators.similarity import ann_pq

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 10 == 0)
    ann = ann_pq(emb, queries, k=5, n_subspaces=8, n_codes=64, refine=50)
    return _ann_containment_verdict(spark, sf_dir, ann)


@register("similarity_ann_lsh_multiprobe", oracle=_ANN_VERDICT_ORACLE)
def similarity_ann_lsh_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MULTI-PROBE hyperplane-LSH (Lv et al. 2007, deterministic
    variant): each query also probes Hamming-1 band buckets (2 flipped
    bits per band) — recall rises with query-side work only, no extra
    corpus-side hash state (the right trade at 100 TB where bands
    multiply index size). Same top-100 containment verdict as the
    single-probe query; the recall improvement over probes=0 is
    asserted in tests/test_similarity.py."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 10 == 0)
    ann = ann_hyperplane_lsh(emb, queries, k=5, nbits=16, bands=4, probes=2)
    return _ann_containment_verdict(spark, sf_dir, ann)


def _jl_oracle_sql() -> str:
    """Oracle generated from the SAME seeded ±1 matrix the operator
    embeds in its Spark expression (single source of truth)."""
    from hive_udf_spark.operators.similarity import jl_sign_matrix

    S = jl_sign_matrix(64, 16, seed=7)
    cols = []
    for j, row in enumerate(S):
        s = "[" + ", ".join(str(v) for v in row) + "]"
        cols.append(
            f"CAST(list_sum(list_transform(generate_series(1, 64), "
            f"i -> q[i] * ({s})[i])) AS BIGINT) AS p{j:02d}"
        )
    return f"""
    WITH {_QV_CTE}
    SELECT vec_id, {", ".join(cols)}
    FROM qv
    """


@register("similarity_random_projection", oracle=_jl_oracle_sql())
def similarity_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson–Lindenstrauss sign projection 64→16 in exact integer
    space (r6): quantized components flow through a deterministic ±1
    matrix embedded as ONE literal SQL expression — order-independent
    integer sums, so DuckDB reproduces every projected coordinate
    bit-for-bit. This is the scale path for ANN preprocessing: project
    map-side (no shuffle, no Python), then search in 1/4 the
    dimensions."""
    from hive_udf_spark.operators.similarity import random_projection_quantized

    emb = load_table(spark, sf_dir, "embeddings")
    proj = random_projection_quantized(
        emb, in_dim=64, out_dim=16, seed=7
    )
    return proj.select(
        "vec_id",
        *[F.element_at("proj", j + 1).alias(f"p{j:02d}") for j in range(16)],
    )


# ---------------------------------------------------------------------------
# SemDeDup (r8): cluster-first semantic dedup, verdict-checked
# ---------------------------------------------------------------------------

_SEMDEDUP_T = 0.35
_SEMDEDUP_K = 16


@register(
    "similarity_semdedup",
    oracle="""
    SELECT vec_id, true AS min_label_ok, true AS edges_internal_ok,
           true AS degree_ok
    FROM embeddings
    """,
)
def similarity_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): assign every embedding to its
    nearest spherical-k-means cell, find cosine >= 0.35 pairs by a
    WITHIN-CELL self-join only (the paper's approximation — quadratic
    work bounded to cell size), contract connected components, keep
    min-id per group.  Cluster labels depend on trained centroids, so
    the oracle is the verdict pattern (SURVEY.md §5.2): the query
    re-derives the within-cell edge relation with the SAME centroids and
    emits three per-vector invariants the output must satisfy exactly —
    cluster == min member id; every edge is INTERNAL to one cluster (an
    edge crossing clusters would contradict the CC fixpoint); degree
    consistency (singleton <=> zero edges).  Any wrong merge, split, or
    dropped vector breaks the hash.  Exact cluster recovery on crafted
    vectors is pinned in tests/test_similarity.py."""
    from hive_udf_spark.operators.similarity import kmeans_centroids, semdedup

    emb = load_table(spark, sf_dir, "embeddings")
    C = kmeans_centroids(emb, "vec_id", "embedding", _SEMDEDUP_K, seed=42)
    internals: list = []
    sd = semdedup(
        emb,
        min_cosine=_SEMDEDUP_T,
        n_centroids=_SEMDEDUP_K,
        centroids=C,
        internals=internals,
    ).localCheckpoint(eager=True)

    # the invariant checks need the within-cell edge relation — reuse
    # the operator's CHECKPOINTED pairs instead of re-planning the
    # literal centroid expression and re-running the cell self-join
    # (identical contents by construction: same centroids, threshold,
    # and id_a < id_b filter; r14 — halved the query's wall)
    (pairs,) = internals
    sym = pairs.union(pairs.select(F.col("id_b"), F.col("id_a"))).toDF(
        "id", "other"
    )
    lab = sd.select(F.col("vec_id").alias("id"), F.col("cluster"))
    olab = sd.select(
        F.col("vec_id").alias("other"), F.col("cluster").alias("ocluster")
    )
    deg = (
        sym.join(lab, "id")
        .join(olab, "other")
        .groupBy("id")
        .agg(
            F.count("*").alias("n_edges"),
            F.sum(
                F.when(F.col("cluster") == F.col("ocluster"), 1).otherwise(0)
            ).alias("n_internal"),
        )
    )
    csize = sd.groupBy("cluster").agg(F.count("*").alias("csz"))
    out = (
        sd.join(csize, "cluster")
        .join(deg, sd["vec_id"] == deg["id"], "left")
        .select(
            "vec_id",
            (
                F.min("vec_id").over(Window.partitionBy("cluster"))
                == F.col("cluster")
            ).alias("min_label_ok"),
            F.coalesce(
                F.col("n_edges") == F.col("n_internal"), F.lit(True)
            ).alias("edges_internal_ok"),
            (
                (F.col("csz") > 1)
                == (F.coalesce(F.col("n_edges"), F.lit(0)) > 0)
            ).alias("degree_ok"),
        )
    )
    return out


# ---------------------------------------------------------------------------
# Per-label centroid outliers (r8): embedding-space curation audit
# ---------------------------------------------------------------------------

_OUTLIER_K = 5


@register(
    "similarity_centroid_outliers",
    oracle=f"""
    WITH {_QV_CTE},
    lv AS (
      SELECT e.label, q.vec_id, q.q
      FROM embeddings e JOIN qv q USING (vec_id)
    ),
    n AS (SELECT label, count(*) AS n FROM lv GROUP BY label),
    sums AS (
      SELECT label, i, sum(q[i]) AS s
      FROM lv, unnest(generate_series(1, 64)) AS t(i)
      GROUP BY label, i
    ),
    cm AS (
      SELECT s.label, list(s.s // n.n ORDER BY s.i) AS c
      FROM sums s JOIN n USING (label) GROUP BY s.label, n.n
    ),
    scored AS (
      SELECT lv.label, lv.vec_id,
             list_sum(list_transform(generate_series(1, 64),
                                     i -> lv.q[i] * cm.c[i])) AS dot,
             list_sum(list_transform(lv.q, x -> x * x)) AS nq,
             list_sum(list_transform(cm.c, x -> x * x)) AS nc
      FROM lv JOIN cm USING (label)
    ),
    r AS (
      SELECT label, vec_id,
             CASE WHEN nq = 0 OR nc = 0 THEN 0.0
                  ELSE round(dot / sqrt(CAST(nq * nc AS DOUBLE)), 6) END AS cos_c,
             row_number() OVER (
               PARTITION BY label
               ORDER BY CASE WHEN nq = 0 OR nc = 0 THEN 0.0
                             ELSE round(dot / sqrt(CAST(nq * nc AS DOUBLE)), 6)
                        END ASC, vec_id) AS "rank"
      FROM scored
    )
    SELECT label, vec_id, cos_c, CAST("rank" AS BIGINT) AS rank
    FROM r WHERE "rank" <= {_OUTLIER_K}
    """,
)
def similarity_centroid_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space curation audit: per label, the K vectors with the
    LOWEST cosine to the label's centroid — mislabeled / off-topic /
    junk candidates (the embedding analog of CLIP-score filtering).

    Exactness discipline: embeddings quantize to integers (round(x·1e3),
    the corpus-wide convention), the centroid is the FLOOR-DIVIDED
    integer mean per dimension (sum div n — defined, engine-exact), dot
    products and norms are exact int64, and the only float op is one
    identical round(dot/sqrt(nq·nc), 6) in both engines — products stay
    under 2^52 so every double is bit-identical.

    Scale shape: the per-(label, dim) sum aggregate is labels × 64 rows
    (map-side partials), centroids BROADCAST back, scoring is a per-row
    projection, and the per-label bottom-K lowers to WindowGroupLimit —
    the corpus never sorts globally."""
    from pyspark.sql import Window

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.select(
        "label", "vec_id", quantize_vec("embedding").alias("q")
    )
    sums = (
        q.select(
            "label", F.posexplode("q").alias("i", "x")
        )
        .groupBy("label", "i")
        .agg(F.sum("x").alias("s"))
    )
    n = q.groupBy("label").agg(F.count("*").alias("n"))
    cm = (
        sums.join(F.broadcast(n), "label")
        .groupBy("label")
        .agg(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("i", F.expr("s div n").alias("c")))
                ),
                lambda st: st["c"],
            ).alias("c")
        )
    )
    scored = q.join(F.broadcast(cm), "label").select(
        "label",
        "vec_id",
        F.aggregate(
            F.zip_with("q", "c", lambda a, b: a * b), F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias("dot"),
        F.aggregate(
            F.transform("q", lambda x: x * x), F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias("nq"),
        F.aggregate(
            F.transform("c", lambda x: x * x), F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias("nc"),
    )
    cos_c = F.when(
        (F.col("nq") == 0) | (F.col("nc") == 0), F.lit(0.0)
    ).otherwise(
        F.round(
            F.col("dot") / F.sqrt((F.col("nq") * F.col("nc")).cast("double")), 6
        )
    )
    w = Window.partitionBy("label").orderBy(cos_c.asc(), F.col("vec_id").asc())
    return (
        scored.select(
            "label", "vec_id", cos_c.alias("cos_c"),
            F.row_number().over(w).cast("long").alias("rank"),
        )
        .filter(F.col("rank") <= _OUTLIER_K)
    )
