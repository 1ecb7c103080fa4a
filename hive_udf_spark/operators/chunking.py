"""Training-data preparation operators: chunking, packing, sampling.

The operations an LLM training-data pipeline runs after dedup/quality
filtering (BASELINE north star), all pure Catalyst expressions:

* ``chunk_documents`` — split each document into fixed-token windows
  with overlap (the context-window chunking step before tokenization).
  Computed at scan: one ``posexplode`` over per-doc window starts, no
  shuffle at all — output partitioning inherits the scan.
* ``pack_documents`` — assign documents to fixed-budget context windows
  by cumulative token count in a deterministic stream order ("concat
  the corpus, cut every B tokens, a doc belongs to the window where it
  starts"). A window cumulative sum; at corpus scale pack per shard
  (pass ``shard_col``) so the sort is per-shard, not global.
* ``stratified_sample`` — per-stratum deterministic hash sampling:
  membership depends only on (seed, id) so samples are reproducible
  across runs, engines, and partitionings — portable mode is
  reproduced exactly by the DuckDB oracle. No ``rand()`` anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from hive_udf_spark.functions.hashing import (
    PORTABLE_HASH_BITS,
    fast_hash64,
    portable_hash60,
)
from hive_udf_spark.functions.text import tokenize

SAMPLE_DENOM = 1_000_000


def chunk_documents(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    chunk_tokens: int = 128,
    overlap: int = 16,
) -> DataFrame:
    """(doc_id, chunk_idx, chunk_text, n_tokens) — fixed-size token
    windows with ``overlap`` tokens shared between consecutive chunks.

    Chunk starts are multiples of ``stride = chunk_tokens − overlap`` up
    to ``n − overlap − 1`` (not ``n − 1``): a start in ``[n − overlap, n)``
    would yield a chunk wholly contained in its predecessor (every token
    already emitted as the predecessor's overlap tail), i.e. a redundant
    duplicate chunk contributing no new tokens. The last emitted chunk may
    be short; empty documents produce no chunks (guarded — a naive
    ``sequence(0, −1)`` would materialize DESCENDING and crash slice,
    the functions.text.ngrams lesson).
    """
    if chunk_tokens < 1:
        raise ValueError("chunk_tokens must be >= 1")
    if not (0 <= overlap < chunk_tokens):
        raise ValueError("overlap must be in [0, chunk_tokens)")
    stride = chunk_tokens - overlap
    toks = tokenize(text_col)
    n = F.size(toks)
    last_start = F.greatest(n - F.lit(overlap + 1), F.lit(0))
    starts = F.when(
        n > 0, F.sequence(F.lit(0), last_start, F.lit(stride))
    ).otherwise(F.array().cast("array<int>"))
    exploded = docs.select(
        F.col(id_col),
        toks.alias("__toks"),
        F.posexplode(starts).alias("chunk_idx", "__start"),
    )
    chunk = F.slice(F.col("__toks"), F.col("__start") + 1, chunk_tokens)
    return exploded.select(
        F.col(id_col),
        "chunk_idx",
        F.array_join(chunk, " ").alias("chunk_text"),
        F.size(chunk).alias("n_tokens"),
    )


# Sentinel for pack_documents: explicit opt-in to the single-partition
# global-order window (test scale only — never the default).
GLOBAL_PACK = "__global__"


def pack_documents(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    budget: int = 2048,
    shard_col: str | None = None,
    num_shards: int = 64,
    portable: bool = False,
) -> DataFrame:
    """(doc_id, n_tokens, offset, bin_id): concatenate documents in a
    deterministic stream order and cut the stream every ``budget`` tokens —
    each document lands in the window containing its first token.

    Sharding (default is scale-safe — no single-partition window):

    * ``shard_col=None`` (default) — auto-shard by
      ``hash(id) mod num_shards``; the cumulative sum runs per shard
      (partition-local window), then per-shard base offsets (one
      ``num_shards``-row prefix sum, broadcast back) splice the shards
      into one global token stream in (shard, id) order. Offsets are
      globally contiguous; bins may span shard boundaries — exactly as if
      the corpus were concatenated in that order. ``portable=True`` uses
      the md5 hash family so a SQL oracle reproduces the sharding.
    * ``shard_col="col"`` — pack independently per user shard: offsets
      and bins restart per shard (the per-source packing a production
      job runs); output includes the shard column.
    * ``shard_col=GLOBAL_PACK`` — the old global ``ORDER BY id`` window:
      a single-partition sort, test scale only.
    """
    if budget < 1:
        raise ValueError("budget must be >= 1")
    n = F.size(tokenize(text_col))
    if shard_col == GLOBAL_PACK:
        w = Window.orderBy(id_col)
        cum = F.sum(n).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        offset = (cum - n).cast("long")
        return docs.select(
            F.col(id_col),
            n.cast("long").alias("n_tokens"),
            offset.alias("offset"),
            F.floor(offset / F.lit(budget)).cast("long").alias("bin_id"),
        )
    if shard_col is not None:
        w = Window.partitionBy(shard_col).orderBy(id_col)
        cum = F.sum(n).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        offset = (cum - n).cast("long")
        return docs.select(
            F.col(id_col),
            F.col(shard_col),
            n.cast("long").alias("n_tokens"),
            offset.alias("offset"),
            F.floor(offset / F.lit(budget)).cast("long").alias("bin_id"),
        )
    # auto-shard: per-shard local cumsum + tiny cross-shard reconciliation
    if num_shards < 1:
        raise ValueError("num_shards must be >= 1")
    h = portable_hash60 if portable else fast_hash64
    shard = F.pmod(h(F.col(id_col), 0), F.lit(num_shards))
    base_rows = docs.select(shard.alias("__shard"), n.alias("__n"))
    # per-shard totals → prefix-summed base offsets. The prefix sum runs as
    # a triangular self-join over ≤ num_shards² tiny rows instead of a
    # no-partition window, so the plan contains ZERO single-partition
    # window stages (WindowExec would warn even on 64 rows).
    shard_tot = base_rows.groupBy("__shard").agg(F.sum("__n").alias("__tot"))
    earlier = shard_tot.select(
        F.col("__shard").alias("__s2"), F.col("__tot").alias("__tot2")
    )
    shard_base = (
        shard_tot.join(F.broadcast(earlier), F.col("__s2") < F.col("__shard"), "left")
        .groupBy("__shard")
        .agg(F.coalesce(F.sum("__tot2"), F.lit(0)).cast("long").alias("__base"))
    )
    wloc = (
        Window.partitionBy("__shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = docs.select(F.col(id_col), shard.alias("__shard"), n.alias("__n")).withColumn(
        "__cum", F.sum("__n").over(wloc)
    )
    joined = local.join(F.broadcast(shard_base), "__shard")
    offset = (F.col("__base") + F.col("__cum") - F.col("__n")).cast("long")
    return joined.select(
        F.col(id_col),
        F.col("__n").cast("long").alias("n_tokens"),
        offset.alias("offset"),
        F.floor(offset / F.lit(budget)).cast("long").alias("bin_id"),
    )


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    id_col: str,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
    seed: int = 42,
    portable: bool = False,
) -> DataFrame:
    """Deterministic per-stratum sample: keep a row iff
    ``hash(seed, id) mod 1e6 < fraction(stratum)·1e6``.

    Reproducible by construction (no rand()): re-running, repartitioning,
    or re-executing on another engine selects the SAME rows — portable
    mode uses the md5-derived hash family so a SQL oracle reproduces the
    sample exactly. Fractions are exact rationals over 1e6, so engine
    float parsing cannot move the threshold.
    """
    h = portable_hash60 if portable else fast_hash64
    bucket = F.pmod(h(F.col(id_col), seed), F.lit(SAMPLE_DENOM))
    thresh = F.lit(None).cast("long")
    expr = None
    for stratum, frac in sorted(fractions.items()):
        cut = int(round(float(frac) * SAMPLE_DENOM))
        cond = F.col(strata_col) == stratum
        expr = F.when(cond, F.lit(cut)) if expr is None else expr.when(cond, F.lit(cut))
    thresh = (
        expr.otherwise(F.lit(int(round(default_fraction * SAMPLE_DENOM))))
        if expr is not None
        else F.lit(int(round(default_fraction * SAMPLE_DENOM)))
    )
    return df.filter(bucket < thresh)


def mixture_weighted_repeat(
    df: DataFrame,
    strata_col: str,
    id_col: str,
    weights: dict[str, float],
    default_weight: float = 0.0,
    seed: int = 42,
    portable: bool = False,
) -> DataFrame:
    """Epoch-weighted source mixing: repeat each row ``weight(stratum)``
    times in expectation — the "this source is seen 2.5× per epoch,
    that one 0.4×" knob of an LLM data-mixture recipe.

    weight = k + f (k integral, f fractional): every row emits k copies,
    plus one more iff ``hash(seed, id) mod 1e6 < f·1e6`` — so the
    realized copy count is deterministic per id (no rand()), the
    expected multiplicity is exactly the weight, and subsampling
    (weight < 1) and oversampling (weight > 1) are the same mechanism.
    Output adds ``copy_idx`` (0-based) so downstream shuffles/packing
    can distinguish copies.

    Pure scan-side expressions: one CASE for the weight, one hash
    compare, one guarded ``sequence``/``explode`` — no shuffle, no
    Python; output partitioning inherits the scan. Weights are exact
    ppm rationals so engine float parsing cannot move a threshold.
    """
    h = portable_hash60 if portable else fast_hash64
    bucket = F.pmod(h(F.col(id_col), seed), F.lit(SAMPLE_DENOM))
    expr = None
    for stratum, wgt in sorted(weights.items()):
        if wgt < 0:
            raise ValueError(f"negative weight for {stratum!r}")
        ppm = int(round(float(wgt) * SAMPLE_DENOM))
        cond = F.col(strata_col) == stratum
        expr = F.when(cond, F.lit(ppm)) if expr is None else expr.when(cond, F.lit(ppm))
    default_ppm = int(round(float(default_weight) * SAMPLE_DENOM))
    wppm = (
        expr.otherwise(F.lit(default_ppm)) if expr is not None else F.lit(default_ppm)
    )
    n_copies = (wppm / F.lit(SAMPLE_DENOM)).cast("long") + F.when(
        bucket < wppm % F.lit(SAMPLE_DENOM), F.lit(1)
    ).otherwise(F.lit(0))
    # guarded: sequence(0, -1) materializes DESCENDING — short-circuit
    # zero-copy rows to an empty list (the functions.text.ngrams lesson)
    copies = F.when(
        n_copies > 0, F.sequence(F.lit(0).cast("long"), n_copies - 1)
    ).otherwise(F.array().cast("array<long>"))
    return df.select(
        F.col(id_col),
        F.col(strata_col),
        F.explode(copies).alias("copy_idx"),
    )


def priority_sample(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    k: int,
    strata_col: str | None = None,
    seed: int = 7,
    portable: bool = False,
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement: top-k by
    priority q = w / u (Duffield, Lund & Thorup 2007 priority sampling;
    the PPS-without-replacement scheme a quality-weighted corpus sample
    needs — heavier documents proportionally likelier, no row ever
    drawn twice).

    The uniform is hash-derived — u = (hash(seed, id) mod 2^60) + 1,
    an integer in [1, 2^60] — so the sample is reproducible across
    runs, partitionings, and engines; ``q = w / u`` is ONE IEEE-754
    division of exact integers, which every engine rounds identically
    (unlike ln/exp, whose libm variation would make a float-keyed
    sample engine-dependent — why this scheme, not u^(1/w) A-ES).
    Ties (impossible in practice, 2^60 space) break by id.

    Output adds ``priority`` and the Horvitz-Thompson estimation weight
    ``est_weight = max(w, tau)`` where tau is the (k+1)-th priority —
    sums of est_weight over the sample unbiasedly estimate population
    weight totals (the paper's estimator). With ``strata_col``, top-k
    runs per stratum (tau per stratum).

    Scale: global top-k is Spark's TakeOrdered (per-partition partial
    top-k, driver merges k·partitions rows); per-stratum is a
    WindowGroupLimit rank — both spill-free and shuffle-light. Weights
    must be non-negative integers (quantize upstream — e.g. token
    counts or ppm-scaled quality scores); rows with NULL or zero weight
    can only be drawn after every positive-weight row.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    h = portable_hash60 if portable else fast_hash64
    m = 1 << PORTABLE_HASH_BITS
    u = (F.pmod(h(F.col(id_col), seed), F.lit(m)) + 1).cast("double")
    w = F.coalesce(F.col(weight_col).cast("bigint"), F.lit(0)).cast("double")
    # q = w / (u/2^60): normalized u in (0,1] puts tau in weight units.
    # (w * 2^60) is an exact power-of-two scale and the division is one
    # correctly-rounded IEEE op -> bit-identical across engines; keep the
    # oracle's parenthesization identical
    scored = df.withColumn("priority", (w * F.lit(float(m))) / u)
    order = [F.col("priority").desc(), F.col(id_col).asc()]
    if strata_col:
        # per-stratum: rank window -> WindowGroupLimit partial top-k
        win = Window.partitionBy(strata_col).orderBy(*order)
        ranked = scored.withColumn("__rk", F.row_number().over(win))
        tau_df = ranked.filter(F.col("__rk") == k + 1).select(
            F.col(strata_col), F.col("priority").alias("__tau")
        )
        top = ranked.filter(F.col("__rk") <= k).drop("__rk")
        # null-SAFE stratum match: a NULL stratum is a real stratum and
        # must still receive its tau for the HT est_weight
        out = top.join(
            F.broadcast(tau_df),
            top[strata_col].eqNullSafe(tau_df[strata_col]),
            "left",
        ).drop(tau_df[strata_col])
    else:
        # global: TakeOrdered top-(k+1) (per-partition partial top-k,
        # driver merge) — then rank the <= k+1 survivors on one tiny
        # partition to split sample from tau
        limited = scored.orderBy(*order).limit(k + 1)
        ranked = limited.withColumn(
            "__rk", F.row_number().over(Window.orderBy(*order))
        )
        tau_df = ranked.filter(F.col("__rk") == k + 1).select(
            F.lit(1).alias("__j"), F.col("priority").alias("__tau")
        )
        top = ranked.filter(F.col("__rk") <= k).drop("__rk")
        out = top.withColumn("__j", F.lit(1)).join(
            F.broadcast(tau_df), "__j", "left"
        ).drop("__j")
    return out.withColumn(
        "est_weight",
        F.greatest(
            F.coalesce(F.col(weight_col).cast("double"), F.lit(0.0)),
            F.coalesce(F.col("__tau"), F.lit(0.0)),
        ),
    ).drop("__tau")


def leakage_safe_split(
    docs: DataFrame,
    clusters: DataFrame,
    id_col: str = "doc_id",
    cluster_col: str = "cluster",
    test_fraction: float = 0.1,
    seed: int = 13,
    portable: bool = False,
) -> DataFrame:
    """Train/eval split that near-duplicates cannot straddle: the split
    decision hashes the CLUSTER id (from ``dedup_clusters`` /
    ``embedding_dedup_clusters`` / ``multimodal`` clusters), so every
    member of a near-dup cluster lands on the same side — the
    contamination-prevention step a benchmark split needs AFTER dedup
    (a doc-level random split leaks eval content through its train-side
    near-duplicates; decontam then reports what this op prevents).

    Deterministic (no rand()): side = hash(seed, cluster) mod 1e6 <
    test_fraction·1e6 — reproducible across runs, partitionings, and
    engines (portable mode md5). Realized test share converges to
    test_fraction over clusters, weighted by cluster size. Output:
    docs' (id, cluster, split) with split ∈ {'train', 'test'} — EVERY
    doc of ``docs`` appears exactly once: a doc without a row in
    ``clusters`` (e.g. clusters computed from an earlier corpus
    snapshot) is treated as its own singleton cluster (cluster = its
    id, the same convention ``dedup_clusters`` uses for singletons)
    rather than silently dropped from both sides.
    """
    if not (0.0 <= test_fraction <= 1.0):
        raise ValueError("test_fraction must be in [0, 1]")
    cut = int(round(test_fraction * SAMPLE_DENOM))
    h = portable_hash60 if portable else fast_hash64
    cluster = F.coalesce(F.col(cluster_col), F.col(id_col))
    bucket = F.pmod(h(cluster.cast("string"), seed), F.lit(SAMPLE_DENOM))
    side = F.when(bucket < F.lit(cut), F.lit("test")).otherwise(F.lit("train"))
    return (
        docs.select(id_col)
        .join(clusters.select(id_col, cluster_col), id_col, "left")
        .select(id_col, cluster.alias(cluster_col), side.alias("split"))
    )


def percentile_band_filter(
    df: DataFrame,
    value_col: str,
    lo_q: float = 0.05,
    hi_q: float = 0.95,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """ADAPTIVE quality filtering: keep rows whose integral ``value_col``
    lies inside the [lo_q, hi_q] percentile band of their group's own
    distribution — the data-driven alternative to fixed thresholds
    (a "too short / too long" cut that tracks each source's distribution
    instead of hard-coding one corpus's constants; per-source bands are
    the standard guard against one boilerplate-heavy source defining
    "normal" for all).

    Thresholds are the deterministic nearest-lower-rank values
    (value at 0-based rank floor(q·(n−1)) of the ascending order — the
    mad_anomalies / skew_report quantile rule), so the kept set is
    engine-exact. Plan (the skew_report cumulative-count trick): rows
    never sort — a partial-aggregated (group, value) count relation is
    cumsum'd over DISTINCT values per group (a tiny window: distinct
    values << rows), the two thresholds are the smallest values whose
    cumulative count reaches each rank, and the thresholds null-safe
    join back onto the scan for a map-side filter.

    Output: every input column + (lo_value, hi_value); rows with NULL
    ``value_col`` are dropped (no percentile membership).
    """
    if not (0.0 <= lo_q <= hi_q <= 1.0):
        raise ValueError("need 0 <= lo_q <= hi_q <= 1")
    from pyspark.sql import Window

    gcols = list(group_cols or [])
    base = df.filter(F.col(value_col).isNotNull())
    v = F.col(value_col).cast("long")
    vc = base.groupBy(*gcols, v.alias("__v")).agg(
        F.count(F.lit(1)).cast("long").alias("__k")
    )
    w_cc = (
        Window.partitionBy(*gcols)
        .orderBy(F.col("__v").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wn = Window.partitionBy(*gcols)
    cum = vc.withColumn("__cum", F.sum("__k").over(w_cc)).withColumn(
        "__n", F.sum("__k").over(wn)
    )

    def pick_at(q: float):
        rank = F.floor(F.lit(float(q)) * (F.col("__n") - 1)).cast("long") + 1
        return F.min(F.when(F.col("__cum") >= rank, F.col("__v")))

    picks = cum.groupBy(*gcols).agg(
        pick_at(lo_q).alias("lo_value"), pick_at(hi_q).alias("hi_value")
    )
    if gcols:
        from hive_udf_spark.operators.util import null_safe_cond

        joined = base.join(picks, null_safe_cond(base, picks, gcols)).select(
            base["*"], picks["lo_value"], picks["hi_value"]
        )
    else:
        joined = base.crossJoin(picks)
    return joined.filter((v >= F.col("lo_value")) & (v <= F.col("hi_value")))


def source_quota_cap(
    df: DataFrame,
    group_col: str,
    cap: int,
    order_by: list | None = None,
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-source quota capping (the RefinedWeb/C4 per-domain cap): keep
    at most ``cap`` rows per group, ranked by ``order_by`` (Column list,
    best first; default: ``id_col`` ascending — pure determinism), so no
    single boilerplate-heavy source dominates the mixture. Output:
    every kept input column + ``quota_rank`` (1-based).

    The anti-bias complement to mixture_weighted_repeat: that one
    up/down-weights sources multiplicatively, this one hard-bounds them.
    Always pair the ranking with a deterministic final key (the id) so
    the kept set is stable run-to-run.

    Plan shape: one window partitioned by the group — Spark ≥3.5 pushes
    the rank ≤ cap filter into a WindowGroupLimit partial top-(cap)
    BEFORE the exchange, so the shuffle carries at most cap rows per
    (group, map partition), not the group's full volume. NULL groups
    form their own capped group (the null-source bucket is exactly the
    one that tends to explode)."""
    if cap < 1:
        raise ValueError("cap must be >= 1")
    from pyspark.sql import Window

    order = list(order_by) if order_by else []
    order.append(F.col(id_col).asc())
    w = Window.partitionBy(group_col).orderBy(*order)
    return (
        df.withColumn("quota_rank", F.row_number().over(w))
        .filter(F.col("quota_rank") <= cap)
        .withColumn("quota_rank", F.col("quota_rank").cast("int"))
    )


def token_budget_cap(
    df: DataFrame,
    part_col: str,
    id_col: str,
    weight_col: str,
    budget: int,
    seed: int = 42,
) -> DataFrame:
    """Per-partition TOKEN budget (not row quota): within each
    ``part_col`` group, admit rows in deterministic hash-priority order
    until the running ``weight_col`` total would exceed ``budget``.

    The row-count quota (:func:`source_quota_cap`) bounds how many
    documents a source contributes; real mixture recipes bound how many
    TOKENS it contributes — a source of ten enormous documents can blow
    a token budget that a 15-doc cap happily admits.  Admission order is
    the portable md5 hash of the id (no rand(): re-runs, repartitions,
    and the SQL oracle select the SAME rows), so the admitted set is an
    unbiased sample of the source rather than its head.

    A row is kept iff its INCLUSIVE running total ≤ budget — the greedy
    prefix rule: a single over-budget document is skipped AND ends the
    scan for its group (later, smaller rows do not backfill), keeping
    the admitted set a prefix of the priority order — the property that
    makes incremental re-ingest append-only instead of re-shuffling
    prior admissions.

    Scale: one partitioned window (hash-partition on ``part_col``,
    in-partition sort on the hash priority) — the same shape as any
    per-key top-k; no global window, no driver state.  Output adds
    ``priority`` (the hash) and ``cum_weight`` for auditability.
    """
    if budget < 0:
        raise ValueError("budget must be non-negative")
    pr = portable_hash60(F.col(id_col).cast("string"), seed)
    win = (
        Window.partitionBy(part_col)
        .orderBy(F.col("priority").asc(), F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = (
        df.withColumn("priority", pr)
        .withColumn(
            "cum_weight", F.sum(F.col(weight_col).cast("long")).over(win)
        )
        .filter(F.col("cum_weight") <= budget)
    )
    return out
