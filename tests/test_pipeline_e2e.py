"""End-to-end training-data pipeline integration: the operators compose.

One realistic flow over the fixture corpus — dedup with multiplicity →
adaptive quality band → LM perplexity scoring → leakage-safe split →
pack — asserting the conservation invariants that make the stages safe
to chain (every oracle checks a stage in isolation; this pins the
seams: column contracts, row conservation, no doc gained or lost)."""

from __future__ import annotations

from pyspark.sql import functions as F

from hive_udf_spark.sources import load_table


def test_pipeline_end_to_end(spark, sf_dir):
    from hive_udf_spark.operators.chunking import (
        leakage_safe_split,
        pack_documents,
        percentile_band_filter,
    )
    from hive_udf_spark.operators.dedup import dedup_clusters, dedup_representatives
    from hive_udf_spark.operators.importance import lm_perplexity_scores

    docs = load_table(spark, sf_dir, "documents")
    n_docs = docs.count()

    # 1. dedup, keeping multiplicity
    reps = dedup_representatives(docs, "doc_id", "text", threshold=0.7, mode="star")
    assert reps.agg(F.sum("multiplicity")).collect()[0][0] == n_docs
    kept = docs.join(
        reps.select(F.col("rep_id").alias("doc_id"), "multiplicity"), "doc_id"
    )
    n_kept = kept.count()
    assert 0 < n_kept < n_docs  # the corpus is duplicate-dense

    # 2. adaptive per-source length band
    banded = percentile_band_filter(
        kept, "n_chars", lo_q=0.02, hi_q=0.98, group_cols=["source"]
    )
    n_band = banded.count()
    assert 0 < n_band <= n_kept

    # 3. LM quality scores attach 1:1
    scored = banded.join(
        lm_perplexity_scores(banded, banded.filter(F.col("lang") == "en")),
        "doc_id",
    )
    assert scored.count() == n_band

    # 4. leakage-safe split over the surviving docs (cluster-hashed)
    clusters = dedup_clusters(scored, "doc_id", "text", threshold=0.7, mode="star")
    split = leakage_safe_split(scored, clusters, test_fraction=0.1, seed=3)
    assert split.count() == n_band
    sides = (
        split.join(clusters, ["doc_id", "cluster"])
        .groupBy("cluster")
        .agg(F.count_distinct("split").alias("k"))
    )
    assert sides.filter(F.col("k") > 1).count() == 0  # never straddles

    # 5. pack the train side into context windows
    train = scored.join(
        split.filter(F.col("split") == "train").select("doc_id"), "doc_id"
    )
    packed = pack_documents(train, "doc_id", "text", budget=512)
    assert packed.count() == train.count()
    total_tokens = packed.agg(F.sum("n_tokens")).collect()[0][0]
    last = packed.agg(F.max(F.col("offset") + F.col("n_tokens"))).collect()[0][0]
    assert last == total_tokens  # offsets form one contiguous stream
