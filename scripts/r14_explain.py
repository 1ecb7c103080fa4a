#!/usr/bin/env python
"""r14 optimization round: capture .explain('formatted') for the bench
entries under optimization, into plans/r14/<name>_<tag>.txt.

Usage: python scripts/r14_explain.py <tag> [entry,entry,...]

The DataFrame builders mirror bench.py's parameters exactly (same
operators, same arguments) so the captured plan is the benched plan.
Entries whose timed body is not a single DataFrame (iterative trainers,
streaming sinks) are captured at their dominant relation and noted
inline in OPTIMIZATION_r14.md instead.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402


def builders(spark, sf_dir):
    from hive_udf_spark.operators.dedup import (
        containment_pairs,
        dedup_clusters,
        near_dup_pairs,
        prefix_filter_pairs,
    )
    from hive_udf_spark.operators.spandedup import strip_duplicate_spans
    from hive_udf_spark.plans import QUERIES
    from hive_udf_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")

    def b_containment_join():
        return containment_pairs(docs, "doc_id", "text", threshold=0.8, shingle_n=3)

    def b_prefix_filter_join():
        return prefix_filter_pairs(docs, "doc_id", "text", threshold=0.5)

    def b_strip_spans():
        return strip_duplicate_spans(docs, n=5, min_count=2, keep_first=True)

    def b_minhash_lsh_dedup():
        return near_dup_pairs(
            docs, "doc_id", "text", threshold=0.7, num_hashes=16, bands=4,
            portable=False, sig_prefilter_margin=0.25, hashed_tokens=True,
        )

    def b_fuzzy_edit_join():
        return QUERIES["dedup_fuzzy_edit_join"].fn(spark, sf_dir)

    def b_mojibake_repair():
        return QUERIES["text_mojibake_repair"].fn(spark, sf_dir)

    def b_semantic_decontam():
        from hive_udf_spark.operators.decontam import semantic_decontam

        ev = emb.filter(F.col("vec_id") % 41 == 0)
        corpus = emb.filter(F.col("vec_id") % 41 != 0)
        return semantic_decontam(corpus, ev, min_cosine=0.35)

    def b_dsir_weights():
        from hive_udf_spark.operators.importance import dsir_weights

        return dsir_weights(
            docs, docs.filter(F.col("lang") == "en"), "doc_id", "text", buckets=8192,
        )

    def b_dedup_clusters():
        return dedup_clusters(docs, "doc_id", "text", threshold=0.7, hashed_tokens=True)

    def b_dedup_clusters_exact():
        return dedup_clusters(
            docs, "doc_id", "text", threshold=0.7, hashed_tokens=True, mode="exact"
        )

    def b_fmp4_frame_sample():
        return QUERIES["multimodal_fmp4_frame_sample"].fn(spark, sf_dir)

    def b_codec_tiff_tiled_decode():
        return QUERIES["multimodal_tiff_tiled_decode"].fn(spark, sf_dir)

    def b_codec_mp1_audio():
        return QUERIES["multimodal_mp1_audio_features"].fn(spark, sf_dir)

    def b_compressed_shards_scan():
        return QUERIES["source_compressed_shards_scan"].fn(spark, sf_dir)

    def b_crawl_frontier():
        return QUERIES["pipeline_crawl_frontier"].fn(spark, sf_dir)

    def b_idn_fold():
        return QUERIES["web_url_idn_fold"].fn(spark, sf_dir)

    def b_host_pagerank():
        return QUERIES["web_host_pagerank"].fn(spark, sf_dir)

    def b_topk_dot_bruteforce():
        from hive_udf_spark.operators.similarity import topk_dot_quantized

        queries = emb.filter(F.col("vec_id") % 10 == 0)
        return topk_dot_quantized(emb, queries, k=5)

    def b_semdedup():
        return QUERIES["similarity_semdedup"].fn(spark, sf_dir)

    return {
        "semdedup": b_semdedup,
        "crawl_frontier": b_crawl_frontier,
        "idn_fold": b_idn_fold,
        "host_pagerank": b_host_pagerank,
        "topk_dot_bruteforce": b_topk_dot_bruteforce,
        "fmp4_frame_sample": b_fmp4_frame_sample,
        "codec_tiff_tiled_decode": b_codec_tiff_tiled_decode,
        "codec_mp1_audio": b_codec_mp1_audio,
        "compressed_shards_scan": b_compressed_shards_scan,
        "containment_join": b_containment_join,
        "prefix_filter_join": b_prefix_filter_join,
        "strip_spans": b_strip_spans,
        "minhash_lsh_dedup": b_minhash_lsh_dedup,
        "fuzzy_edit_join": b_fuzzy_edit_join,
        "mojibake_repair": b_mojibake_repair,
        "semantic_decontam": b_semantic_decontam,
        "dsir_weights": b_dsir_weights,
        "dedup_clusters": b_dedup_clusters,
        "dedup_clusters_exact": b_dedup_clusters_exact,
    }


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    only = sys.argv[2].split(",") if len(sys.argv) > 2 else None

    from hive_udf_spark.session import get_spark

    spark = get_spark("r14-explain")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    outdir = os.path.join(REPO, "plans", "r14")
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
