"""Decontamination operator: planted-overlap semantics + plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from hive_udf_spark.operators.decontam import (
    contaminated_doc_ids,
    contamination_report,
    ngram_hash_set,
)


def _docs(spark):
    # doc 1 contains bench 10's 3-gram run; doc 2 is clean; doc 3 is
    # a verbatim copy of bench 11; doc 4 is too short for any 3-gram.
    return spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon"),
            (2, "zeta eta theta iota kappa"),
            (3, "one two three four"),
            (4, "mu nu"),
        ],
        "doc_id long, text string",
    )


def _bench(spark):
    return spark.createDataFrame(
        [
            (10, "beta gamma delta"),
            (11, "one two three four"),
            (12, "unseen tokens entirely here"),
        ],
        "bench_id long, prompt string",
    )


def test_planted_overlaps(spark):
    rep = contamination_report(
        _docs(spark), _bench(spark), "doc_id", "text", "bench_id", "prompt", n=3
    )
    rows = {(r.doc_id, r.bench_id): r for r in rep.collect()}
    # doc1 shares exactly the one 3-gram bench10 has
    assert rows[(1, 10)].overlap_ngrams == 1
    assert rows[(1, 10)].bench_ngrams == 1
    assert rows[(1, 10)].overlap_ppm == 1_000_000
    # doc3 == bench11 verbatim: both 3-grams hit
    assert rows[(3, 11)].overlap_ngrams == 2
    assert rows[(3, 11)].overlap_ppm == 1_000_000
    # nothing else: doc2/doc4 clean, bench12 unseen
    assert set(rows) == {(1, 10), (3, 11)}


def test_min_overlap_threshold(spark):
    rep = contamination_report(
        _docs(spark), _bench(spark), "doc_id", "text", "bench_id", "prompt",
        n=3, min_overlap=2,
    )
    assert {(r.doc_id, r.bench_id) for r in rep.collect()} == {(3, 11)}


def test_contaminated_ids_distinct(spark):
    ids = contaminated_doc_ids(
        _docs(spark), _bench(spark), "doc_id", "text", "bench_id", "prompt", n=3
    )
    assert sorted(r.doc_id for r in ids.collect()) == [1, 3]


def test_short_and_empty_docs_no_crash(spark):
    docs = spark.createDataFrame(
        [(1, ""), (2, "only two"), (3, "a b c d e f g h i j")],
        "doc_id long, text string",
    )
    out = contamination_report(
        docs, _bench(spark), "doc_id", "text", "bench_id", "prompt", n=8
    )
    assert out.count() == 0  # no 8-gram can match; must not raise


def test_ngram_hash_set_distinct(spark):
    df = spark.createDataFrame([("x y x y x y",)], "text string")
    # 3-grams: "x y x","y x y","x y x","y x y" -> 2 distinct hashes
    n = df.select(F.size(ngram_hash_set("text", 3)).alias("k")).first().k
    assert n == 2


def test_plan_broadcast_and_jvm_only(spark):
    rep = contamination_report(
        _docs(spark), _bench(spark), "doc_id", "text", "bench_id", "prompt", n=3
    )
    plan = rep._sc._jvm.PythonSQLUtils.explainString(
        rep._jdf.queryExecution(), "formatted"
    )
    # bench side broadcast: the corpus probe is a map-side hash join
    assert "BroadcastHashJoin" in plan
    # pure Catalyst — no Python in the plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_portable_matches_fast_semantics(spark):
    # same pairs/counts regardless of hash family (hashes differ, sets agree)
    kw = dict(doc_id="doc_id", doc_text="text", bench_id="bench_id",
              bench_text="prompt", n=3)
    a = contamination_report(_docs(spark), _bench(spark), portable=False, **kw)
    b = contamination_report(_docs(spark), _bench(spark), portable=True, **kw)
    key = lambda r: (r.doc_id, r.bench_id, r.overlap_ngrams, r.bench_ngrams)
    assert sorted(map(key, a.collect())) == sorted(map(key, b.collect()))


def test_semantic_decontam_finds_exact_copies(spark, sf_dir):
    """Eval items that are exact copies of corpus vectors have identical
    signatures — every band collides, so recall on true copies is 1 and
    each hit carries the maximal dot (self-similarity)."""
    from pyspark.sql import functions as F

    from hive_udf_spark.operators.decontam import semantic_decontam
    from hive_udf_spark.sources import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    ev = (
        emb.filter(F.col("vec_id") % 17 == 0)
        .select((F.col("vec_id") + 100_000).alias("vec_id"), "embedding")
    )
    out = semantic_decontam(emb, ev, min_cosine=0.99)
    got = {r.vec_id: r.best_eval_id for r in out.collect()}
    want_ids = {r.vec_id for r in emb.filter(F.col("vec_id") % 17 == 0).collect()}
    assert want_ids <= set(got)
    for cid in want_ids:
        assert got[cid] == cid + 100_000  # strongest hit is the copy


def test_semantic_decontam_precision_exact(spark, sf_dir):
    """Every flagged (corpus, eval) hit must pass the exact cosine test:
    flagged rows are a subset of the brute-force cross pairs, with the
    same n_hits wherever LSH found all of a corpus item's neighbors."""
    from pyspark.sql import functions as F

    from hive_udf_spark.operators.decontam import semantic_decontam
    from hive_udf_spark.operators.similarity import dot_int, quantize_vec
    from hive_udf_spark.sources import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    ev = emb.filter(F.col("vec_id") % 41 == 0)
    corpus = emb.filter(F.col("vec_id") % 41 != 0)
    out = {r.vec_id: r.n_hits for r in semantic_decontam(corpus, ev, min_cosine=0.35).collect()}
    q = emb.select("vec_id", quantize_vec("embedding").alias("qv"))
    a = q.filter(F.col("vec_id") % 41 != 0).select(F.col("vec_id").alias("c"), F.col("qv").alias("qa"))
    b = q.filter(F.col("vec_id") % 41 == 0).select(F.col("vec_id").alias("e"), F.col("qv").alias("qb"))
    dq = dot_int(F.col("qa"), F.col("qb"))
    na = dot_int(F.col("qa"), F.col("qa"))
    nb = dot_int(F.col("qb"), F.col("qb"))
    brute = {
        r.c: r.n
        for r in a.crossJoin(b)
        .select("c", dq.alias("d"), na.alias("na"), nb.alias("nb"))
        .filter(
            (F.col("d") > 0)
            & ((F.col("d") * F.col("d")).cast("double")
               >= 0.1225 * (F.col("na").cast("double") * F.col("nb").cast("double")))
        )
        .groupBy("c").agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert set(out) <= set(brute)  # no false positives, ever
    for cid, n in out.items():
        assert n <= brute[cid]  # LSH may miss candidates, never invent


def test_semantic_decontam_shuffle_mode_equivalent(spark, sf_dir):
    """broadcast_eval=False (eval side too big for an executor) must
    produce the identical result through the shuffled join."""
    from pyspark.sql import functions as F

    from hive_udf_spark.operators.decontam import semantic_decontam
    from hive_udf_spark.sources import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    ev = emb.filter(F.col("vec_id") % 41 == 0)
    corpus = emb.filter(F.col("vec_id") % 41 != 0)
    a = sorted(map(tuple, semantic_decontam(corpus, ev, min_cosine=0.35).collect()))
    b = sorted(map(tuple, semantic_decontam(
        corpus, ev, min_cosine=0.35, broadcast_eval=False
    ).collect()))
    assert a == b and len(a) > 0


def test_semantic_decontam_plan_broadcast_no_python(spark, sf_dir):
    from pyspark.sql import functions as F

    from hive_udf_spark.operators.decontam import semantic_decontam
    from hive_udf_spark.sources import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    ev = emb.filter(F.col("vec_id") % 41 == 0)
    corpus = emb.filter(F.col("vec_id") % 41 != 0)
    plan = (
        semantic_decontam(corpus, ev, min_cosine=0.35)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "BroadcastHashJoin" in plan


def test_semantic_decontam_validation(spark, sf_dir):
    import pytest as _pytest

    from hive_udf_spark.operators.decontam import semantic_decontam
    from hive_udf_spark.sources import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    with _pytest.raises(ValueError):
        semantic_decontam(emb, emb, nbits=33, bands=8)
    with _pytest.raises(ValueError):
        semantic_decontam(emb, emb, nbits=64, bands=8)


def test_semantic_decontam_caches_contract(spark, sf_dir):
    """caches=None never persists; caches=[] persists both prepped side
    tables and hands them back for release."""
    from pyspark.sql import functions as F

    from hive_udf_spark.operators.decontam import semantic_decontam
    from hive_udf_spark.sources import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    ev = emb.filter(F.col("vec_id") % 41 == 0)
    corpus = emb.filter(F.col("vec_id") % 41 != 0)
    semantic_decontam(corpus, ev, min_cosine=0.35).count()
    assert spark._jsparkSession.sharedState().cacheManager().isEmpty()
    handles: list = []
    semantic_decontam(corpus, ev, min_cosine=0.35, caches=handles).count()
    assert len(handles) == 2
    assert not spark._jsparkSession.sharedState().cacheManager().isEmpty()
    for h in handles:
        h.unpersist()
    assert spark._jsparkSession.sharedState().cacheManager().isEmpty()


def test_novelty_scores_semantics(spark):
    """Reference members score 0; disjoint docs score 1e6; partial
    overlap is the exact novel fraction; short docs score (0,0,0)."""
    import pytest
    from pyspark.sql import functions as F  # noqa: F401

    from hive_udf_spark.operators.decontam import novelty_scores

    ref = spark.createDataFrame(
        [(100, "a b c d e")], "doc_id long, text string"
    )
    docs = spark.createDataFrame(
        [
            (1, "a b c d e"),     # all 3 trigrams seen -> 0
            (2, "x y z w"),       # 2 trigrams, both novel -> 1e6
            (3, "a b c q r"),     # trigrams: abc(seen), bcq, cqr -> 2/3
            (4, "a b"),           # too short -> (0,0,0)
        ],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: (r.n_ngrams, r.novel_ngrams, r.novelty_ppm)
        for r in novelty_scores(docs, ref, n=3).collect()
    }
    assert got[1] == (3, 0, 0)
    assert got[2] == (2, 2, 1_000_000)
    assert got[3] == (3, 2, 666_666)
    assert got[4] == (0, 0, 0)
    with pytest.raises(ValueError, match="n must"):
        novelty_scores(docs, ref, n=0)
