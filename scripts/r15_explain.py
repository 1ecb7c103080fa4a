#!/usr/bin/env python
"""r15 optimization round: capture .explain('formatted') for the bench
entries under optimization, into plans/r15/<name>_<tag>.txt.

Usage: python scripts/r15_explain.py <tag> [entry,entry,...]

The DataFrame builders mirror bench.py's parameters exactly (same
operators, same arguments) so the captured plan is the benched plan.
Entries whose timed body is not a single DataFrame (iterative trainers,
streaming sinks) are captured at their dominant relation and noted
inline in OPTIMIZATION_r15.md instead.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402


def builders(spark, sf_dir):
    from hive_udf_spark.operators.dedup import (
        build_minhash_index,
        containment_pairs,
        dedup_clusters,
        near_dup_pairs,
        prefix_filter_pairs,
        probe_minhash_index,
    )
    from hive_udf_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")

    def b_containment_join():
        return containment_pairs(docs, "doc_id", "text", threshold=0.8, shingle_n=3)

    def b_prefix_filter_join():
        return prefix_filter_pairs(docs, "doc_id", "text", threshold=0.9)

    def b_minhash_lsh_dedup():
        return near_dup_pairs(
            docs, "doc_id", "text", threshold=0.7, num_hashes=16, bands=4,
            portable=False, sig_prefilter_margin=0.25, hashed_tokens=True,
        )

    def b_dedup_clusters_exact():
        return dedup_clusters(
            docs, "doc_id", "text", threshold=0.7, hashed_tokens=True, mode="exact"
        )

    def b_incremental_dedup_shuffle():
        # plan captured WITH broadcast disabled, as the bench runs it
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        corpus = docs.filter(F.col("doc_id") % 2 != 0)
        batch = docs.filter(F.col("doc_id") % 2 == 0)
        index = build_minhash_index(corpus, "doc_id", "text", 16, hashed_tokens=True)
        return probe_minhash_index(
            index, batch, "doc_id", "text", threshold=0.5, num_hashes=16,
            bands=8, hashed_tokens=True,
        )

    def b_hybrid_rrf():
        from hive_udf_spark.operators.retrieval import build_tfidf_index, hybrid_rrf_topk

        queries = docs.filter(F.col("doc_id") % 97 == 0)
        qvecs = emb.filter(F.col("vec_id") % 97 == 0)
        return hybrid_rrf_topk(build_tfidf_index(docs), queries, emb, qvecs, k=10)

    def b_topk_dot_bruteforce():
        from hive_udf_spark.operators.similarity import topk_dot_quantized

        queries = emb.filter(F.col("vec_id") % 10 == 0)
        return topk_dot_quantized(emb, queries, k=5)

    def b_video_near_dup():
        from hive_udf_spark.operators.dedup import shared_signature_pairs
        from hive_udf_spark.operators.multimodal import video_frame_signatures

        sigs = video_frame_signatures(docs)
        return shared_signature_pairs(sigs, "doc_id", "ahash", min_shared=2)

    def b_pagerank_1m():
        from hive_udf_spark.operators.graph import pagerank_fixed

        n, m = 200_000, 5
        edges = spark.range(n * m).selectExpr(
            f"id % {n} AS src",
            f"(id * 2654435761 + id div {n} * 40503 + 7) % {n} AS dst",
        ).filter("src != dst")
        return pagerank_fixed(edges, iters=5)

    def b_ann_pq():
        from hive_udf_spark.operators.similarity import ann_pq

        queries = emb.filter(F.col("vec_id") % 10 == 0)
        return ann_pq(emb, queries, k=5, n_subspaces=8, n_codes=64, refine=50)

    return {
        "containment_join": b_containment_join,
        "prefix_filter_join": b_prefix_filter_join,
        "minhash_lsh_dedup": b_minhash_lsh_dedup,
        "dedup_clusters_exact": b_dedup_clusters_exact,
        "incremental_dedup_shuffle": b_incremental_dedup_shuffle,
        "hybrid_rrf": b_hybrid_rrf,
        "topk_dot_bruteforce": b_topk_dot_bruteforce,
        "video_near_dup": b_video_near_dup,
        "pagerank_1m": b_pagerank_1m,
        "ann_pq": b_ann_pq,
    }


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    only = sys.argv[2].split(",") if len(sys.argv) > 2 else None

    from hive_udf_spark.session import get_spark

    spark = get_spark("r15-explain")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    outdir = os.path.join(REPO, "plans", "r15")
    os.makedirs(outdir, exist_ok=True)
    for name, fn in builders(spark, sf_dir).items():
        if only and name not in only:
            continue
        df = fn()
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(outdir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} chars)")
    spark.stop()


if __name__ == "__main__":
    main()
