"""DSIR-style importance weighting for training-data selection.

Implements the hashed n-gram importance-resampling score of Xie et al.
2023 ("Data Selection for Language Models via Importance Resampling"):
documents are featurized as hashed word n-gram counts, a bag-of-buckets
unigram model is fit to a TARGET corpus (the distribution you want more
of) and to the SOURCE corpus (what you have), and each source document
is scored by the log-likelihood ratio of its features under the two
models. High weight ⇒ the document looks like the target.

Spark-first execution shape (100 TB discipline):

* featurization is a pure JVM expression (tokenize → hash → pmod) — no
  Python, no shuffle;
* the two bucket-count models are partial-aggregated counts over the
  exploded feature stream (fixed-width bucket ids cross the shuffle);
* the fitted model is a ``buckets``-row log-ratio table (a few thousand
  rows regardless of corpus size) broadcast onto the feature stream;
* per-document weights are one partial-aggregated integer sum.

Determinism/oracle: with ``portable=True`` the hash is the md5-based
``portable_hash60`` and every arithmetic step is either integer-exact or
a ``round(x·10⁶)``-quantized log — the registry query's DuckDB oracle
reproduces the full pipeline (model fit included) bit-for-bit.

No reference analogue (the reference is a cardinality UDAF); this is
part of the mandated LLM-data-pipeline extension surface (SURVEY §2.3).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from hive_udf_spark.functions.hashing import fast_hash64, portable_hash60
from hive_udf_spark.functions.text import tokenize


def hashed_ngram_buckets(
    text_col: Column | str,
    buckets: int = 8192,
    n_max: int = 2,
    portable: bool = False,
    seed: int = 11,
) -> Column:
    """array<long>: hashed n-gram feature buckets (with repeats — DSIR
    scores use occurrence counts, not sets). n_max=1 → unigrams only;
    n_max=2 adds adjacent-word bigrams (joined with a single space)."""
    if n_max not in (1, 2):
        raise ValueError("n_max must be 1 or 2 (unigrams, +bigrams)")
    if buckets < 2:
        raise ValueError("buckets must be >= 2")
    h = portable_hash60 if portable else fast_hash64
    toks = tokenize(text_col)
    uni = F.transform(toks, lambda t: F.pmod(h(t, seed), F.lit(buckets)))
    if n_max == 1:
        return uni
    n = F.size(toks)
    bi = F.when(
        n >= 2,
        F.zip_with(
            F.slice(toks, 1, n - 1),
            F.slice(toks, 2, n - 1),
            lambda a, b: F.pmod(h(F.concat(a, F.lit(" "), b), seed), F.lit(buckets)),
        ),
    ).otherwise(F.array().cast("array<bigint>"))
    return F.concat(uni, bi)


def _feature_stream(
    df: DataFrame, id_col: str, text_col: str, buckets: int, n_max: int,
    portable: bool, seed: int,
) -> DataFrame:
    return df.select(
        F.col(id_col).alias("__id"),
        F.explode(
            hashed_ngram_buckets(F.col(text_col), buckets, n_max, portable, seed)
        ).alias("__b"),
    )


def dsir_logratio_table(
    source: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    buckets: int = 8192,
    n_max: int = 2,
    portable: bool = False,
    seed: int = 11,
    source_buckets: DataFrame | None = None,
) -> DataFrame:
    """The fitted model: a DENSE ``buckets``-row table (every bucket id,
    occupied or not) with the add-one-smoothed log-likelihood ratio,
    quantized to micro-nats (``round(lr·10⁶)`` as BIGINT — integer
    arithmetic from here on, so document weights hash-match across
    engines). Dense means scoring is a plain inner/left join with no
    absent-bucket special case; B rows are broadcastable at any corpus
    size.

    Output: (``__b``, ``lr_micro``, ``__cs``, ``__ct``).
    """
    def bucket_stream(df: DataFrame) -> DataFrame:
        return df.select(
            F.explode(
                hashed_ngram_buckets(F.col(text_col), buckets, n_max, portable, seed)
            ).alias("__b")
        )

    axis = source.sparkSession.range(buckets).select(F.col("id").alias("__b"))
    # source_buckets: an optional pre-featurized one-column (__b) stream
    # for the source side — dsir_weights passes its (checkpointed)
    # scoring feature stream so the source corpus is tokenized and
    # hashed ONCE for fit + score instead of once per pass
    src_stream = (
        source_buckets.select("__b")
        if source_buckets is not None
        else bucket_stream(source)
    )
    sc = src_stream.groupBy("__b").agg(F.count("*").alias("__cs"))
    tc = bucket_stream(target).groupBy("__b").agg(F.count("*").alias("__ct"))
    dense = (
        axis.join(sc, "__b", "left")
        .join(tc, "__b", "left")
        .select(
            "__b",
            F.coalesce("__cs", F.lit(0)).alias("__cs"),
            F.coalesce("__ct", F.lit(0)).alias("__ct"),
        )
    )
    totals = dense.agg(F.sum("__cs").alias("__ns"), F.sum("__ct").alias("__nt"))
    b = F.lit(float(buckets))
    lr = F.log(
        (F.col("__ct") + F.lit(1.0)) / (F.col("__nt").cast("double") + b)
    ) - F.log((F.col("__cs") + F.lit(1.0)) / (F.col("__ns").cast("double") + b))
    return dense.crossJoin(F.broadcast(totals)).select(
        "__b",
        F.round(lr * F.lit(1_000_000.0)).cast("long").alias("lr_micro"),
        "__cs",
        "__ct",
    )


def dsir_weights(
    docs: DataFrame,
    target: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = 8192,
    n_max: int = 2,
    portable: bool = False,
    seed: int = 11,
) -> DataFrame:
    """Per-document DSIR importance weight: (id_col, n_features,
    weight_micro) where weight_micro = Σ over the document's hashed
    n-gram occurrences of the quantized log-likelihood ratio
    (micro-nats; positive ⇒ target-like). Documents with no features
    (empty text) get weight 0 with n_features 0 — they stay addressable
    for downstream filtering rather than silently vanishing.

    Plan shape: model fit = two partial-aggregated bucket counts; score
    = feature stream ⋈ broadcast(B-row ratio table) → per-id integer
    sum with map-side partial aggregation. The only corpus-sized
    shuffles carry (bucket id) and (id, partial sum).
    """
    # one featurization pass for fit + score: the (id, bucket) feature
    # stream is materialized lazily and its bucket column feeds the
    # source-side model counts
    feats = _feature_stream(
        docs, id_col, text_col, buckets, n_max, portable, seed
    ).localCheckpoint(eager=False)
    ratio = dsir_logratio_table(
        docs.select(F.col(text_col)), target.select(F.col(text_col)),
        text_col, buckets, n_max, portable, seed,
        source_buckets=feats,
    ).select("__b", "lr_micro")
    scored = (
        feats.join(F.broadcast(ratio), "__b")  # dense table: never misses
        .groupBy("__id")
        .agg(F.sum("lr_micro").alias("__w"), F.count("*").alias("__n"))
    )
    base = docs.select(F.col(id_col).alias("__id"))
    return base.join(scored, "__id", "left").select(
        F.col("__id").alias(id_col),
        F.coalesce("__n", F.lit(0)).cast("long").alias("n_features"),
        F.coalesce("__w", F.lit(0)).cast("long").alias("weight_micro"),
    )


def _bigram_pair_stream(
    df: DataFrame, id_col: str | None, text_col: str, buckets: int,
    portable: bool, seed: int,
) -> DataFrame:
    """One row per adjacent-bigram occurrence: (ctx bucket, bigram
    bucket) — ctx is the hashed FIRST word (its count as a context),
    bigram the hashed joined pair."""
    h = portable_hash60 if portable else fast_hash64
    toks = tokenize(text_col)
    n = F.size(toks)
    pairs = F.when(
        n >= 2,
        F.zip_with(
            F.slice(toks, 1, n - 1),
            F.slice(toks, 2, n - 1),
            lambda a, b: F.struct(
                F.pmod(h(a, seed), F.lit(buckets)).alias("c"),
                F.pmod(h(F.concat(a, F.lit(" "), b), seed), F.lit(buckets)).alias("g"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<c:bigint,g:bigint>>"))
    cols = [F.col(id_col).alias("__id")] if id_col else []
    return df.select(*cols, F.explode(pairs).alias("__p")).select(
        *(["__id"] if id_col else []),
        F.col("__p.c").alias("__c"),
        F.col("__p.g").alias("__g"),
    )


def bigram_lm_tables(
    model_docs: DataFrame,
    text_col: str = "text",
    buckets: int = 4096,
    portable: bool = False,
    seed: int = 13,
) -> tuple[DataFrame, DataFrame]:
    """Fit the hashed-bigram language model (CCNet-style perplexity
    filtering, Wenzek et al. 2020): two DENSE ``buckets``-row tables —
    bigram-bucket counts and context-bucket counts — each carrying its
    add-one-smoothed log term pre-quantized to micro-nats:

        lp_g_micro = round(ln(c_g + 1) · 1e6)
        lp_c_micro = round(ln(c_c + buckets) · 1e6)

    so a bigram occurrence's log-probability contribution is the integer
    ``lp_g_micro − lp_c_micro`` (ln((c_g+1)/(c_c+B)) to micro-nat
    rounding — the dsir_logratio_table quantization discipline; both
    engines round the same libm doubles at 1e-6, far coarser than any
    ulp divergence). Dense ⇒ scoring is two plain broadcast joins with
    no absent-bucket branch; 2·B rows broadcast at any corpus size.
    """
    if buckets < 2:
        raise ValueError("buckets must be >= 2")
    pairs = _bigram_pair_stream(model_docs, None, text_col, buckets, portable, seed)
    axis = model_docs.sparkSession.range(buckets).select(F.col("id").alias("__b"))
    gc = pairs.groupBy(F.col("__g").alias("__b")).agg(F.count("*").alias("__n"))
    cc = pairs.groupBy(F.col("__c").alias("__b")).agg(F.count("*").alias("__n"))

    def dense(counts: DataFrame, add: Column, out: str) -> DataFrame:
        return (
            axis.join(counts, "__b", "left")
            .select("__b", F.coalesce("__n", F.lit(0)).alias("__n"))
            .select(
                "__b",
                "__n",
                F.round(F.log(F.col("__n").cast("double") + add) * 1_000_000.0)
                .cast("long")
                .alias(out),
            )
        )

    return (
        dense(gc, F.lit(1.0), "lp_g_micro"),
        dense(cc, F.lit(float(buckets)), "lp_c_micro"),
    )


def lm_perplexity_scores(
    docs: DataFrame,
    model_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = 4096,
    portable: bool = False,
    seed: int = 13,
) -> DataFrame:
    """Score every document under the hashed-bigram LM fitted on
    ``model_docs`` (typically a trusted/clean subset): output
    (id, n_bigrams, logprob_micro) where logprob_micro is the integer
    micro-nat sum of per-bigram log P(w_i | w_{i-1}) contributions.
    Low (very negative per-bigram) scores ⇔ high perplexity — the
    CCNet selection signal; compose with percentile_band_filter on
    e.g. logprob_micro div n_bigrams for an adaptive keep band.
    Documents with fewer than 2 tokens score (0, 0).

    Plan: model fit is two partial-aggregated bucket counts; scoring is
    the doc bigram stream joined against two broadcast B-row tables and
    one groupBy(id) — no Python anywhere, exact integers after the two
    quantized logs.
    """
    g_tab, c_tab = bigram_lm_tables(model_docs, text_col, buckets, portable, seed)
    pairs = _bigram_pair_stream(docs, id_col, text_col, buckets, portable, seed)
    scored = (
        pairs.join(F.broadcast(g_tab.select(F.col("__b").alias("__g"), "lp_g_micro")), "__g")
        .join(F.broadcast(c_tab.select(F.col("__b").alias("__c"), "lp_c_micro")), "__c")
        .groupBy("__id")
        .agg(
            F.count("*").cast("long").alias("n_bigrams"),
            F.sum(F.col("lp_g_micro") - F.col("lp_c_micro"))
            .cast("long")
            .alias("logprob_micro"),
        )
    )
    ids = docs.select(F.col(id_col).alias("__id"))
    return (
        ids.join(scored, "__id", "left")
        .select(
            F.col("__id").alias(id_col),
            F.coalesce("n_bigrams", F.lit(0)).cast("long").alias("n_bigrams"),
            F.coalesce("logprob_micro", F.lit(0)).cast("long").alias("logprob_micro"),
        )
    )


def source_kl_divergence(
    docs: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    buckets: int = 4096,
    portable: bool = False,
    seed: int = 17,
) -> DataFrame:
    """Per-group token-distribution divergence: KL(P_group ‖ P_corpus)
    over the hashed-unigram bucket space with add-one smoothing — "how
    far does each source's language drift from the corpus", the
    diagnostic that informs mixture weights and flags contaminated or
    off-domain sources.

    Exactness: each bucket's term is quantized independently —
    ``round(p_g · ln(p_g / p) · 1e6)`` with p_g = (c_g+1)/(n_g+B),
    p = (c+1)/(n+B) — then summed as integers (order-independent), the
    DSIR micro-nat discipline. Plan: ONE hashed-token aggregate keyed
    (group, bucket) partially combined map-side; everything after runs
    on the |groups|·B relation. Output: (group, n_tokens, kl_micro),
    kl_micro ≥ 0 up to quantization (±B/2 micro-nats worst case).
    """
    if buckets < 2:
        raise ValueError("buckets must be >= 2")
    h = portable_hash60 if portable else fast_hash64
    toks = docs.select(
        F.col(group_col).alias("__g"),
        F.explode(
            F.transform(
                tokenize(text_col), lambda t: F.pmod(h(t, seed), F.lit(buckets))
            )
        ).alias("__b"),
    )
    gc = toks.groupBy("__g", "__b").agg(F.count(F.lit(1)).alias("__c"))
    groups = gc.select("__g").distinct()
    axis = docs.sparkSession.range(buckets).select(F.col("id").alias("__b"))
    dense = (
        groups.crossJoin(axis)
        .join(gc, ["__g", "__b"], "left")
        .select("__g", "__b", F.coalesce("__c", F.lit(0)).alias("__c"))
    )
    ng = dense.groupBy("__g").agg(F.sum("__c").alias("__ng"))
    corpus = dense.groupBy("__b").agg(F.sum("__c").alias("__cc"))
    tot = corpus.agg(F.sum("__cc").alias("__n"))
    b = F.lit(float(buckets))
    joined = (
        dense.join(F.broadcast(ng), "__g")
        .join(F.broadcast(corpus), "__b")
        .crossJoin(F.broadcast(tot))
    )
    pg = (F.col("__c") + F.lit(1.0)) / (F.col("__ng").cast("double") + b)
    p = (F.col("__cc") + F.lit(1.0)) / (F.col("__n").cast("double") + b)
    term = F.round(pg * F.log(pg / p) * F.lit(1_000_000.0)).cast("long")
    return (
        joined.select("__g", F.col("__ng").alias("__ngv"), term.alias("__t"))
        .groupBy("__g", "__ngv")
        .agg(F.sum("__t").cast("long").alias("kl_micro"))
        .select(
            F.col("__g").alias(group_col),
            F.col("__ngv").cast("long").alias("n_tokens"),
            "kl_micro",
        )
    )


def nb_model_tables(
    labeled: DataFrame,
    label_col: str = "lang",
    text_col: str = "text",
    buckets: int = 4096,
    portable: bool = False,
    seed: int = 19,
) -> tuple[DataFrame, DataFrame]:
    """Fit a multinomial Naive Bayes classifier over hashed unigram
    buckets (the fastText/CCNet-style quality- or language-classifier
    shape, trained closed-form from counts — no gradient loop).

    Returns two DENSE broadcastable tables:

    * token table: one row per (class, bucket) — C·B rows regardless of
      corpus size — with ``lp_micro = round(ln((c_cb+1)/(n_c+B))·1e6)``,
      the add-one-smoothed token log-likelihood in integer micro-nats;
    * prior table: one row per class with
      ``prior_micro = round(ln(n_docs_c / N_docs)·1e6)``.

    Dense ⇒ scoring is plain joins with no absent-bucket branch; the
    micro-nat quantization (the dsir_logratio_table discipline) makes
    every downstream score integer-exact across engines. Training rows
    with a NULL label are excluded from the fit (they cannot vote for a
    class); NULL/empty text simply contributes no token counts but still
    counts toward its class prior.

    Plan shape: ONE partial-aggregated (class, bucket) count over the
    exploded token stream + one C-row doc count — the only corpus-sized
    shuffle carries fixed-width (class, bucket id) keys.
    """
    return nb_tables_from_counts(
        nb_count_cells(labeled, label_col, text_col, buckets, portable, seed),
        buckets,
    )


def nb_count_cells(
    labeled: DataFrame,
    label_col: str = "lang",
    text_col: str = "text",
    buckets: int = 4096,
    portable: bool = False,
    seed: int = 19,
) -> DataFrame:
    """The NB sufficient statistics as an ADDITIVE cell relation —
    (label, bucket, cnt) hashed-token counts plus per-label document
    counts stored as ``bucket = -1`` rows. Cells of disjoint corpora
    sum losslessly per (label, bucket), so the model state is mergeable
    exactly like a Count-Min table: a streaming sink
    (streaming/model_sink.py) can maintain it micro-batch by
    micro-batch and :func:`nb_tables_from_counts` derives the identical
    classifier a one-shot fit would build. NULL-label rows are excluded
    (they cannot vote for a class)."""
    if buckets < 2:
        raise ValueError("buckets must be >= 2")
    lab = labeled.filter(F.col(label_col).isNotNull())
    tok_cells = (
        lab.select(
            F.col(label_col).alias("label"),
            F.explode(
                hashed_ngram_buckets(F.col(text_col), buckets, 1, portable, seed)
            ).alias("bucket"),
        )
        .groupBy("label", "bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    doc_cells = lab.groupBy(F.col(label_col).alias("label")).agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    ).select("label", F.lit(-1).cast("long").alias("bucket"), "cnt")
    return tok_cells.unionByName(doc_cells)


def nb_tables_from_counts(
    cells: DataFrame, buckets: int
) -> tuple[DataFrame, DataFrame]:
    """Derive the dense quantized model tables from a (possibly stored
    and incrementally merged) :func:`nb_count_cells` relation — the
    read-time half of the split, mirroring
    retrieval.index_from_postings: the persisted state is raw additive
    counts; smoothing and micro-nat quantization happen on the
    already-reduced C·B relation at derivation time."""
    if buckets < 2:
        raise ValueError("buckets must be >= 2")
    counts = cells.filter(F.col("bucket") >= 0).select(
        F.col("label").alias("__l"), F.col("bucket").alias("__b"), F.col("cnt").alias("__c")
    )
    dc = cells.filter(F.col("bucket") == -1).select(
        F.col("label").alias("__l"), F.col("cnt").alias("__nd")
    )
    classes = dc.select("__l").distinct()
    axis = cells.sparkSession.range(buckets).select(F.col("id").alias("__b"))
    dense = (
        classes.crossJoin(axis)
        .join(counts, ["__l", "__b"], "left")
        .select("__l", "__b", F.coalesce("__c", F.lit(0)).alias("__c"))
    )
    nc = dense.groupBy("__l").agg(F.sum("__c").alias("__nc"))
    b = F.lit(float(buckets))
    token_table = (
        dense.join(F.broadcast(nc), "__l")
        .select(
            "__l",
            "__b",
            F.round(
                F.log(
                    (F.col("__c") + F.lit(1.0))
                    / (F.col("__nc").cast("double") + b)
                )
                * F.lit(1_000_000.0)
            )
            .cast("long")
            .alias("lp_micro"),
        )
    )
    nd = dc.agg(F.sum("__nd").alias("__n"))
    prior_table = dc.crossJoin(F.broadcast(nd)).select(
        "__l",
        F.round(
            F.log(F.col("__nd").cast("double") / F.col("__n").cast("double"))
            * F.lit(1_000_000.0)
        )
        .cast("long")
        .alias("prior_micro"),
    )
    return token_table, prior_table


def nb_classify(
    docs: DataFrame,
    labeled: DataFrame,
    id_col: str = "doc_id",
    label_col: str = "lang",
    text_col: str = "text",
    buckets: int = 4096,
    portable: bool = False,
    seed: int = 19,
) -> DataFrame:
    """Classify every document under the Naive Bayes model fitted on
    ``labeled``: output (id, n_tokens, pred_label, score_micro,
    margin_micro) where score_micro = prior + Σ count_b · lp_micro(c,b)
    in integer micro-nats, pred_label is the argmax class with a
    deterministic tie-break (score desc, label asc), and margin_micro is
    the gap to the runner-up class (0 when the model has one class) —
    the standard selection-confidence signal for threshold filtering.
    Documents with no tokens are scored on priors alone, so every input
    row stays addressable downstream.

    Plan shape: per-doc token counts reduce on (id, bucket) BEFORE
    touching the model (each distinct bucket scores once, not each
    occurrence); the C·B model and C-row priors broadcast; per-(doc,
    class) scores partial-sum on fixed-width keys; the final argmax is a
    C-row window per doc riding the same hash partitioning.
    """
    token_table, prior_table = nb_model_tables(
        labeled, label_col, text_col, buckets, portable, seed
    )
    return nb_classify_with_tables(
        docs, token_table, prior_table, id_col, text_col, buckets, portable, seed
    )


def nb_classify_with_tables(
    docs: DataFrame,
    token_table: DataFrame,
    prior_table: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = 4096,
    portable: bool = False,
    seed: int = 19,
) -> DataFrame:
    """Score documents against pre-built model tables (the output of
    :func:`nb_model_tables` or :func:`nb_tables_from_counts` over a
    stored count-cell state) — the serving half of the split, same
    output contract as :func:`nb_classify`."""
    feats = (
        docs.select(
            F.col(id_col).alias("__id"),
            F.explode(
                hashed_ngram_buckets(F.col(text_col), buckets, 1, portable, seed)
            ).alias("__b"),
        )
        .groupBy("__id", "__b")
        .agg(F.count(F.lit(1)).alias("__k"))
    )
    contrib = (
        feats.join(F.broadcast(token_table), "__b")  # dense: never misses
        .groupBy("__id", "__l")
        .agg(
            F.sum(F.col("__k") * F.col("lp_micro")).alias("__ts"),
            F.sum("__k").alias("__nt"),
        )
    )
    base = docs.select(F.col(id_col).alias("__id")).crossJoin(
        F.broadcast(prior_table)
    )
    scored = base.join(contrib, ["__id", "__l"], "left").select(
        "__id",
        "__l",
        F.coalesce("__nt", F.lit(0)).alias("__nt"),
        (F.col("prior_micro") + F.coalesce("__ts", F.lit(0))).alias("__s"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("__id").orderBy(F.col("__s").desc(), F.col("__l").asc())
    ranked = scored.select(
        "__id",
        "__l",
        "__nt",
        "__s",
        F.row_number().over(w).alias("__r"),
        F.lead("__s", 1).over(w).alias("__s2"),
    )
    return ranked.filter(F.col("__r") == 1).select(
        F.col("__id").alias(id_col),
        F.col("__nt").cast("long").alias("n_tokens"),
        F.col("__l").alias("pred_label"),
        F.col("__s").cast("long").alias("score_micro"),
        (F.col("__s") - F.coalesce("__s2", F.col("__s")))
        .cast("long")
        .alias("margin_micro"),
    )


def top_pmi_bigrams(
    docs: DataFrame,
    text_col: str = "text",
    k: int = 20,
    min_count: int = 5,
) -> DataFrame:
    """Top-k collocations by pointwise mutual information:
    PMI(a,b) = ln( (c_ab/N_bi) / ((c_a/N_uni)·(c_b/N_uni)) ), bigrams
    with fewer than ``min_count`` occurrences dropped (the classic PMI
    low-count-noise guard). Quantized to micro-nats; deterministic
    ranking (pmi desc, bigram asc). Counts are exact corpus aggregates
    (two partial-combined groupBys — unigrams and bigrams); the top-k
    is a TakeOrdered over the min_count-pruned bigram relation.
    Output: (bigram, c_ab, pmi_micro, rank)."""
    if k < 1 or min_count < 1:
        raise ValueError("k and min_count must be >= 1")
    from pyspark.sql import Window

    toks = tokenize(text_col)
    n = F.size(toks)
    uni = docs.select(F.explode(toks).alias("__w"))
    bi = docs.select(
        F.explode(
            F.when(
                n >= 2,
                F.zip_with(
                    F.slice(toks, 1, n - 1),
                    F.slice(toks, 2, n - 1),
                    lambda a, b: F.struct(a.alias("a"), b.alias("b")),
                ),
            ).otherwise(F.array().cast("array<struct<a:string,b:string>>"))
        ).alias("__p")
    ).select(F.col("__p.a").alias("__a"), F.col("__p.b").alias("__b"))
    uc = uni.groupBy("__w").agg(F.count(F.lit(1)).alias("__cu"))
    bc = (
        bi.groupBy("__a", "__b")
        .agg(F.count(F.lit(1)).alias("__cab"))
        .filter(F.col("__cab") >= min_count)
    )
    nu = uni.agg(F.count(F.lit(1)).alias("__nu"))
    nb = bi.agg(F.count(F.lit(1)).alias("__nb"))
    joined = (
        bc.join(uc.select(F.col("__w").alias("__a"), F.col("__cu").alias("__ca")), "__a")
        .join(uc.select(F.col("__w").alias("__b"), F.col("__cu").alias("__cb")), "__b")
        .crossJoin(F.broadcast(nu))
        .crossJoin(F.broadcast(nb))
    )
    pmi = F.round(
        F.log(
            (F.col("__cab").cast("double") / F.col("__nb").cast("double"))
            / (
                (F.col("__ca").cast("double") / F.col("__nu").cast("double"))
                * (F.col("__cb").cast("double") / F.col("__nu").cast("double"))
            )
        )
        * F.lit(1_000_000.0)
    ).cast("long")
    scored = joined.select(
        F.concat(F.col("__a"), F.lit(" "), F.col("__b")).alias("bigram"),
        F.col("__cab").cast("long").alias("c_ab"),
        pmi.alias("pmi_micro"),
    )
    w = Window.orderBy(F.col("pmi_micro").desc(), F.col("bigram").asc())
    return (
        scored.orderBy(F.col("pmi_micro").desc(), F.col("bigram").asc())
        .limit(k)
        .withColumn("rank", F.row_number().over(w).cast("int"))
    )
