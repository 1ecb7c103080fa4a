#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line:
  {"metric": "total_wall_sec", "value": N, "unit": "sec",
   "queries": {name: sec, ...}, "queries_cold": {name: sec, ...},
   "warm_runs": 3, "sf": 0.1}

"queries" (and the headline total) are the MEDIAN of
$SPARK_GRAFT_BENCH_RUNS warm runs per entry (default 3) — robust to the
machine-contention windows that inflated six entries in the r5 driver
artifact with git-verified unchanged code. "queries_cold" keeps each
entry's first (cold) run on record.

Queries are forced end-to-end with the noop sink (full computation, no
driver collect cost). Scale-path variants are benchmarked (fast xxhash64
hashes, LSH instead of brute force) — the oracle gate covers correctness;
this measures throughput of the plans we'd run at 100 TB.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def bench_queries(spark, sf_dir: str) -> dict[str, float]:
    from hive_udf_spark.functions import approx_distinct, sketch_merge_agg
    from hive_udf_spark.functions.lc import lc_cardinality
    from hive_udf_spark.operators.dedup import near_dup_pairs, simhash_block_pairs
    from hive_udf_spark.operators.similarity import ann_hyperplane_lsh, topk_dot_quantized
    from hive_udf_spark.plans import QUERIES
    from hive_udf_spark.sources import load_table

    lineitem = load_table(spark, sf_dir, "lineitem")
    events = load_table(spark, sf_dir, "events")
    orders = load_table(spark, sf_dir, "orders")
    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")

    # trained + encoded once, outside any timed body: q_ann_pq_pretrained
    # measures steady-state per-batch search cost with the index build
    # (training + corpus encoding, both write-once in production)
    # amortized away
    from hive_udf_spark.operators.similarity import pq_codebooks, pq_encode

    _PQ_BOOKS = pq_codebooks(emb, n_subspaces=8, n_codes=64)
    _PQ_CODES = pq_encode(emb, _PQ_BOOKS).localCheckpoint(eager=True)

    def q_hll_lineitem():
        _force(
            lineitem.groupBy("l_returnflag", "l_linestatus").agg(
                approx_distinct("l_orderkey").alias("s")
            )
        )

    def q_hll_exact_compare():
        _force(
            events.groupBy("event_type").agg(
                F.count_distinct("user_id").alias("exact"),
                approx_distinct("user_id").alias("s"),
            )
        )

    def q_lc_orders():
        _force(
            orders.groupBy("o_orderpriority").agg(
                lc_cardinality("o_custkey", 1_000_000).alias("lc")
            )
        )

    def q_sketch_rollup():
        daily = events.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
            approx_distinct("user_id").alias("s")
        )
        _force(daily.agg(sketch_merge_agg("s").alias("m")))

    def q_tpch_q1():
        QUERIES["tpch_q1_pricing_summary"].fn(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()

    def q_tpch_q5():
        QUERIES["tpch_q5_regional_volume"].fn(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()

    def q_window_topk():
        QUERIES["window_topk_parts_per_brand"].fn(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()

    def q_minhash_lsh_fast():
        caches: list = []
        _force(
            near_dup_pairs(
                docs,
                "doc_id",
                "text",
                threshold=0.7,
                num_hashes=16,
                bands=4,  # r=4: right s-curve for t=0.7
                portable=False,
                sig_prefilter_margin=0.25,
                hashed_tokens=True,  # 8-byte set ops on the fast path
                caches=caches,
            )
        )
        for c in caches:
            c.unpersist()

    def q_dedup_clusters():
        # default mode (star since r4): the no-thought call is scale-safe
        from hive_udf_spark.operators.dedup import dedup_clusters

        _force(dedup_clusters(docs, "doc_id", "text", threshold=0.7, hashed_tokens=True))

    def q_dedup_clusters_exact():
        # opt-in quadratic regime, kept measured so the cost stays visible
        from hive_udf_spark.operators.dedup import dedup_clusters

        _force(
            dedup_clusters(
                docs, "doc_id", "text", threshold=0.7, hashed_tokens=True, mode="exact"
            )
        )

    def q_dedup_clusters_star():
        from hive_udf_spark.operators.dedup import dedup_clusters_star

        _force(dedup_clusters_star(docs, "doc_id", "text", threshold=0.7))

    def q_simhash_blocked_fast():
        caches: list = []
        _force(
            simhash_block_pairs(
                docs, "doc_id", "text", max_hamming=6, portable=False, caches=caches
            )
        )
        for c in caches:
            c.unpersist()

    def q_topk_dot():
        queries = emb.filter(F.col("vec_id") % 10 == 0)
        _force(topk_dot_quantized(emb, queries, k=5))

    # (brute embedding_near_pairs is the oracle baseline, not an engine
    # path: measured 56.8 s vs 6.3 s for the LSH path at sf0.1 — 9× —
    # recorded in SCALE_NOTES.md, not re-run every round)
    def q_near_pairs_lsh():
        from hive_udf_spark.operators.similarity import embedding_near_pairs_lsh

        caches: list = []
        _force(embedding_near_pairs_lsh(emb, min_cosine=0.35, nbits=32, bands=8, caches=caches))
        for c in caches:
            c.unpersist()

    def q_ann_lsh():
        queries = emb.filter(F.col("vec_id") % 10 == 0)
        _force(ann_hyperplane_lsh(emb, queries, k=5, nbits=16, bands=4))

    def q_ann_ivf():
        from hive_udf_spark.operators.similarity import ann_ivf

        queries = emb.filter(F.col("vec_id") % 10 == 0)
        _force(ann_ivf(emb, queries, k=5, n_centroids=16, nprobe=4))

    def q_ann_pq():
        from hive_udf_spark.operators.similarity import ann_pq

        queries = emb.filter(F.col("vec_id") % 10 == 0)
        _force(ann_pq(emb, queries, k=5, n_subspaces=8, n_codes=64, refine=50))

    def q_ann_pq_pretrained():
        # steady-state regime (r4 verdict item 4): train-once/search-many.
        # Codebook training runs OUTSIDE the timed body, so this entry is
        # the warm per-batch search cost alone; q_ann_pq keeps the
        # cold train+search cost on record.
        from hive_udf_spark.operators.similarity import ann_pq

        queries = emb.filter(F.col("vec_id") % 10 == 0)
        _force(ann_pq(emb, queries, k=5, refine=50, books=_PQ_BOOKS, codes=_PQ_CODES))

    def q_vec_dedup_clusters():
        from hive_udf_spark.operators.similarity import embedding_dedup_clusters

        _force(embedding_dedup_clusters(emb, min_cosine=0.35, nbits=32, bands=8))

    def q_pipeline_prep():
        from hive_udf_spark.operators.chunking import (
            chunk_documents,
            mixture_weighted_repeat,
            pack_documents,
            stratified_sample,
        )

        _force(chunk_documents(docs, "doc_id", "text", chunk_tokens=128, overlap=16))
        _force(pack_documents(docs, "doc_id", "text", budget=2048, shard_col="lang"))
        _force(
            stratified_sample(docs, "lang", "doc_id", {"en": 0.5, "de": 0.25}, seed=7)
        )
        _force(
            mixture_weighted_repeat(docs, "lang", "doc_id", {"en": 2.5, "de": 0.4})
        )

    def q_decontaminate():
        from hive_udf_spark.functions.text import tokenize
        from hive_udf_spark.operators.decontam import contamination_report

        bench_set = docs.filter(F.col("doc_id") % 97 == 0).select(
            F.col("doc_id").alias("bench_id"),
            F.array_join(F.slice(tokenize("text"), 1, 12), " ").alias("prompt"),
        )
        _force(
            contamination_report(
                docs, bench_set, "doc_id", "text", "bench_id", "prompt", n=8
            )
        )

    def q_bloom_prefilter():
        from hive_udf_spark.functions.bloom import bloom_prefilter_join

        part = load_table(spark, sf_dir, "part").filter(F.col("p_size") <= 5)
        _force(
            bloom_prefilter_join(
                lineitem, part, "l_partkey", "p_partkey", m_bits=1 << 16, k=5
            )
        )

    def q_freq_sketches():
        from hive_udf_spark.functions.freq import cms_lookup, cms_table, top_k_exploded
        from hive_udf_spark.functions.text import tokenize

        toks = docs.select(F.explode(tokenize("text")).alias("token"))
        _force(top_k_exploded(toks, "token", k=20, max_items_tracked=10000))
        cms = cms_table(toks, "token", depth=4, width=1024)
        _force(cms_lookup(cms, toks, "token", depth=4, width=1024))

    def q_asof_join():
        QUERIES["asof_latest_order_before_event"].fn(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()

    def q_range_join():
        QUERIES["range_join_events_next_hour"].fn(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()

    def q_tpch_q7():
        QUERIES["tpch_q7ish_nation_trade_volume"].fn(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()

    def q_lc_two_phase():
        QUERIES["approx_distinct_lc_two_phase"].fn(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()

    def q_tpch_q10():
        QUERIES["tpch_q10_returned_items"].fn(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()

    def q_text_profile():
        QUERIES["text_token_stats_by_lang"].fn(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()

    def q_gopher_filter():
        from hive_udf_spark.functions.text import gopher_filter_table

        # The test corpus is ONE parquet row group → one task; real corpora
        # arrive in thousands of splits. Spread the scan so the bench
        # measures the (shuffle-free) operator, not the fixture's file
        # layout. The repartition is bench-side only — the operator itself
        # never shuffles.
        spread = docs.repartition(int(spark.sparkContext.defaultParallelism))
        _force(gopher_filter_table(spread, "text", id_cols=("doc_id",)))

    def q_kmv_grouped():
        from hive_udf_spark.functions.kmv import kmv_table

        _force(kmv_table(events, ["event_type"], "user_id", k=64))

    def q_incremental_dedup():
        # fast path: xxhash64 tokens/bands (the oracle covers portable mode)
        from hive_udf_spark.operators.dedup import build_minhash_index, probe_minhash_index

        corpus = docs.filter(F.col("doc_id") % 10 != 0)
        batch = docs.filter(F.col("doc_id") % 10 == 0)
        index = build_minhash_index(corpus, "doc_id", "text", 16, hashed_tokens=True)
        _force(
            probe_minhash_index(
                index, batch, "doc_id", "text", threshold=0.5, num_hashes=16, bands=8,
                hashed_tokens=True,
            )
        )

    def q_incremental_dedup_shuffle():
        # broadcast disabled + 50/50 split: the batch is too big to ship
        # to executors, proving the shuffle-only probe plan (SMJ/shuffled
        # hash on the verify joins; band-key-only candidate exchange) —
        # r3 verdict item 7. Timing recorded alongside the broadcast
        # regime above.
        from hive_udf_spark.operators.dedup import build_minhash_index, probe_minhash_index

        old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            corpus = docs.filter(F.col("doc_id") % 2 != 0)
            batch = docs.filter(F.col("doc_id") % 2 == 0)
            index = build_minhash_index(corpus, "doc_id", "text", 16, hashed_tokens=True)
            _force(
                probe_minhash_index(
                    index, batch, "doc_id", "text", threshold=0.5, num_hashes=16,
                    bands=8, hashed_tokens=True,
                )
            )
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)

    def q_lc_struct_table():
        # packed-word relational LC facade (r4): bit_or words before the
        # exchange, JVM-serialized bitmaps
        from hive_udf_spark.functions.lc import lc_table

        _force(lc_table(orders, ["o_orderpriority"], "o_custkey", size_bytes=65536))

    def q_lc_struct_table_default():
        # same facade at the reference's 1 MB default map (131,072 words):
        # linearity proof for the r5 run-length serializer — cost must stay
        # flat vs the 64 KiB entry, not grow 16x with the map size
        from hive_udf_spark.functions.lc import lc_table

        _force(lc_table(orders, ["o_orderpriority"], "o_custkey", size_bytes=1_000_000))

    def q_quantile_sketch():
        # fast path: xxhash64 row sample (oracle covers portable mode)
        from hive_udf_spark.functions.qsketch import qsketch_quantile, quantile_sketch_table

        cents = orders.withColumn(
            "cents", F.round(F.col("o_totalprice") * 100).cast("bigint")
        )
        _force(
            quantile_sketch_table(
                cents, ["o_orderpriority"], "cents", "o_orderkey", k=256
            ).select("o_orderpriority", qsketch_quantile("qs", 0.5))
        )

    def q_dsir_weights():
        # fast path: xxhash64 features (the oracle covers portable mode)
        from hive_udf_spark.operators.importance import dsir_weights

        _force(
            dsir_weights(
                docs, docs.filter(F.col("lang") == "en"), "doc_id", "text",
                buckets=8192,
            )
        )

    def q_strip_spans():
        # full span pipeline at xxhash64 speed: postings -> mark (join
        # mode, AQE-skew-splittable) -> islands -> O(len) strip fold
        from hive_udf_spark.operators.spandedup import strip_duplicate_spans

        _force(strip_duplicate_spans(docs, n=5, min_count=2, keep_first=True))

    def q_bpe_train():
        # iterative trainer: 8 Spark jobs over the vocab-reduced corpus
        from hive_udf_spark.functions.bpe import bpe_doc_token_counts, bpe_train

        _, vocab = bpe_train(docs, "text", num_merges=8)
        _force(bpe_doc_token_counts(docs, vocab))

    def q_bpe_train_256():
        # batched trainer at realistic merge depth (r5 verdict item 3):
        # 256 merges at batch=16 ≈ 16 rounds, not 256 sequential jobs —
        # the scheduler-cost scaling path for 32k-merge vocabs. The
        # documents table's generator vocabulary is only 31 words
        # (pair-exhausts near 100 merges), so train on a deterministic
        # 50k-word hex corpus where 256 merges are real work.
        from hive_udf_spark.functions.bpe import bpe_train

        corpus = spark.range(50_000).select(
            F.lower(F.hex(F.xxhash64("id"))).alias("text")
        )
        merges, vocab = bpe_train(corpus, "text", num_merges=256, batch=16)
        assert len(merges) >= 256, len(merges)
        _force(vocab)

    def q_image_near_dup():
        # mapInPandas decode + aHash + blocked Hamming pairs over 8x8
        # PGM blobs built from each doc's first 64 chars
        from hive_udf_spark.operators.dedup import hamming_block_pairs
        from hive_udf_spark.operators.multimodal import image_ahash_table

        payload = F.rpad(F.substring("text", 1, 64), 64, " ")
        blobs = docs.select("doc_id", payload.alias("__s")).filter(
            F.col("__s").rlike("^[\\x00-\\x7F]*$")
        ).select(
            "doc_id",
            F.concat(F.lit(b"P5\n8 8\n255\n"), F.encode(F.col("__s"), "UTF-8")).alias("blob"),
        )
        sigs = image_ahash_table(blobs)
        _force(hamming_block_pairs(sigs, "doc_id", "ahash", max_hamming=6))

    def q_codec_png_decode():
        # compressed-image decode throughput (r6): Paeth-filtered zlib
        # PNG fixture encode + full vendored decode, Arrow-batched
        from hive_udf_spark.operators.multimodal import (
            decode_image_features,
            png_encoder_udf,
        )

        payload = F.rpad(F.substring("text", 1, 64), 64, " ")
        enc = png_encoder_udf(8, 8, filter_type=4)
        # repartition to the executor width: sf0.1 documents is ONE
        # parquet file (2 splits) — at 100 TB the scan has thousands of
        # splits, so 2-way parallelism would misrepresent the plan
        blobs = docs.repartition(32).select("doc_id", payload.alias("__s")).filter(
            F.col("__s").rlike("^[\\x00-\\x7F]*$")
        ).select("doc_id", enc(F.col("__s")).alias("blob"))
        _force(decode_image_features(blobs, fake=False))

    def q_codec_jpeg_decode():
        # baseline-JPEG decode throughput (r6): Huffman entropy decode +
        # dequant + IDCT per 64x64 image, Arrow-batched
        from hive_udf_spark.operators.multimodal import (
            decode_image_features,
            jpeg_block_encoder_udf,
        )

        payload = F.rpad(F.substring("text", 1, 64), 64, " ")
        enc = jpeg_block_encoder_udf(8, quality=100)
        blobs = docs.repartition(32).select("doc_id", payload.alias("__s")).filter(
            F.col("__s").rlike("^[\\x00-\\x7F]*$")
        ).select("doc_id", enc(F.col("__s")).alias("blob"))
        _force(decode_image_features(blobs, fake=False))

    def q_prefix_filter():
        # EXACT similarity join (no LSH recall): complete pair set at
        # J >= 0.9 — contract-bound to true-pair volume like the other
        # pair emitters
        from hive_udf_spark.operators.dedup import prefix_filter_pairs

        caches: list = []
        _force(prefix_filter_pairs(docs, "doc_id", "text", threshold=0.9, caches=caches))
        for c in caches:
            c.unpersist()

    def q_pcsa_grouped():
        from hive_udf_spark.functions.pcsa import pcsa_estimate, pcsa_table

        _force(
            pcsa_estimate(
                pcsa_table(lineitem, ["l_returnflag"], "l_orderkey", m=256),
                ["l_returnflag"],
                m=256,
            )
        )

    def q_kmv_sliding():
        # trailing 7-day distinct from the daily sketch table alone
        from hive_udf_spark.functions.kmv import kmv_merge_table, kmv_table

        daily = kmv_table(
            events.withColumn("day", F.date_trunc("day", "ts")), ["day"], "user_id", k=256
        )
        src = daily.select(F.col("day").alias("src_day"), "kmv")
        joined = daily.select("day").join(
            src,
            (F.col("src_day") <= F.col("day"))
            & (F.col("src_day") >= F.col("day") - F.expr("INTERVAL 6 DAYS")),
        )
        _force(kmv_merge_table(joined, ["day"], "kmv", 256))

    def q_funnel_cohort():
        from hive_udf_spark.operators.temporal import cohort_retention, funnel_steps

        _force(
            funnel_steps(
                events, "user_id", "ts", "event_type",
                ["view", "click", "purchase"], within_hours=72,
            )
        )
        _force(cohort_retention(events, "user_id", "ts"))

    def q_bm25_search():
        from hive_udf_spark.operators.retrieval import bm25_topk, build_tfidf_index

        index = build_tfidf_index(docs)
        queries = docs.filter(F.col("doc_id") % 97 == 0)
        _force(bm25_topk(index, queries, k=10))

    def q_lm_perplexity():
        from hive_udf_spark.operators.importance import lm_perplexity_scores

        _force(lm_perplexity_scores(docs, docs.filter(F.col("lang") == "en")))

    def q_quantile_sliding():
        from hive_udf_spark.plans import QUERIES

        _force(QUERIES["sketch_quantile_sliding_window"].fn(spark, sf_dir))

    def q_profile_histogram():
        # r8: distributed equi-depth histogram — range-sharded prefix sum
        # (no single-partition window) over a distinct≈rows column
        from hive_udf_spark.plans import QUERIES

        _force(QUERIES["profile_histogram_totalprice"].fn(spark, sf_dir))

    def q_url_canonicalize():
        # r7 family (r7 verdict item 7): the pure-codegen canonicalization
        # chain — scheme/host/port/path/query normalization + PSL
        # registrable-domain extraction, zero shuffle
        from hive_udf_spark.plans import QUERIES

        _force(QUERIES["web_url_canonicalize"].fn(spark, sf_dir))

    def q_url_dedup():
        # canonical-key dedup: the chain above + one hash-agg shuffle on
        # the bounded url_key strings
        from hive_udf_spark.plans import QUERIES

        _force(QUERIES["web_url_dedup"].fn(spark, sf_dir))

    def q_mojibake_repair():
        # r7/r8 family: three corruption modes + the 244-step fold-replace
        # repair cascade (aggregate HOF), detect scores — per-row codegen
        from hive_udf_spark.plans import QUERIES

        _force(QUERIES["text_mojibake_repair"].fn(spark, sf_dir))

    def q_crawl_frontier():
        # r8: sitemap -> canonicalize -> robots verdict -> url_key dedup,
        # the full crawl-frontier composition
        from hive_udf_spark.plans import QUERIES

        _force(QUERIES["pipeline_crawl_frontier"].fn(spark, sf_dir))

    def q_fuzzy_edit_join():
        # r8: PassJoin d=2 — 75 HOF-generated keys/row, segment-key
        # shuffle join, native-levenshtein verify
        from hive_udf_spark.plans import QUERIES

        _force(QUERIES["dedup_fuzzy_edit_join"].fn(spark, sf_dir))

    def q_host_pagerank():
        # r8: href extraction + RFC 3986 resolution + canonicalization
        # -> host edges -> 5 integer power iterations
        from hive_udf_spark.plans import QUERIES

        _force(QUERIES["web_host_pagerank"].fn(spark, sf_dir))

    def q_codec_tiff_tiled():
        # r8: tiled-layout LZW+predictor decode (tags 322-325)
        from hive_udf_spark.plans import QUERIES

        _force(QUERIES["multimodal_tiff_tiled_decode"].fn(spark, sf_dir))

    def q_codec_pdf_extract():
        # r8: classic-xref walk + FlateDecode + Tj/TJ text replay
        from hive_udf_spark.plans import QUERIES

        _force(QUERIES["multimodal_pdf_extract"].fn(spark, sf_dir))

    def q_c4_line_filter():
        # r8: C4/RefinedWeb line rules — pure per-row projection
        # (split -> filter lambda -> rejoin), zero shuffle
        from hive_udf_spark.plans import QUERIES

        _force(QUERIES["text_c4_line_filter"].fn(spark, sf_dir))

    def q_boilerplate_removal():
        # r8: CCNet corpus-frequency boilerplate — one line-count shuffle,
        # broadcast removal join, one groupBy(doc_id) reassembly
        from hive_udf_spark.plans import QUERIES

        _force(QUERIES["text_boilerplate_line_removal"].fn(spark, sf_dir))

    def q_correlation_matrix():
        # r8: 6 Pearson pairs in ONE partial+final co-moment aggregate
        from hive_udf_spark.plans import QUERIES

        _force(QUERIES["profile_correlation_matrix"].fn(spark, sf_dir))

    def q_luhn_validation():
        # r8: PAN candidate extraction + constant-cost Luhn fold per row
        from hive_udf_spark.plans import QUERIES

        _force(QUERIES["text_pii_luhn_validation"].fn(spark, sf_dir))

    def q_line_repetition():
        # r8: Gopher duplicate-line rules — per-row array folds, no shuffle
        from hive_udf_spark.plans import QUERIES

        _force(QUERIES["text_line_repetition_stats"].fn(spark, sf_dir))

    def q_semdedup():
        # r8: SemDeDup — one cell-id shuffle, bounded within-cell join, CC
        from hive_udf_spark.plans import QUERIES

        _force(QUERIES["similarity_semdedup"].fn(spark, sf_dir))

    def q_token_entropy():
        # r8: per-doc unigram entropy as one sorted-array fold, no shuffle
        from hive_udf_spark.plans import QUERIES

        _force(QUERIES["text_token_entropy"].fn(spark, sf_dir))

    def q_jsonl_ingest():
        # r8: serialize -> corrupt -> PERMISSIVE scan -> quarantine audit
        from hive_udf_spark.plans import QUERIES

        _force(QUERIES["source_jsonl_roundtrip_quarantine"].fn(spark, sf_dir))

    def q_politeness_schedule():
        # r8: per-host wave assignment — host-partitioned window only
        from hive_udf_spark.plans import QUERIES

        _force(QUERIES["web_crawl_politeness_schedule"].fn(spark, sf_dir))

    def q_winsorize():
        # r8: one percentile aggregate + broadcast clamp projection
        from hive_udf_spark.plans import QUERIES

        _force(QUERIES["profile_winsorize_totalprice"].fn(spark, sf_dir))

    def q_audio_quality():
        # r8: WAV decode -> clipping/silence/energy metrics, map-side
        from hive_udf_spark.plans import QUERIES

        _force(QUERIES["multimodal_audio_quality"].fn(spark, sf_dir))

    def q_centroid_outliers():
        # r8: labels x 64 sum agg, broadcast centroids, WindowGroupLimit
        from hive_udf_spark.plans import QUERIES

        _force(QUERIES["similarity_centroid_outliers"].fn(spark, sf_dir))

    def q_politeness_crawl_delay():
        # r8: robots.txt TEXT parse (per-host) + delay-weighted waves
        from hive_udf_spark.plans import QUERIES

        _force(QUERIES["web_politeness_crawl_delay"].fn(spark, sf_dir))

    def q_footer_audit():
        # r8: distributed footer-only parquet audit (no data pages)
        from hive_udf_spark.plans import QUERIES

        _force(QUERIES["source_parquet_footer_audit"].fn(spark, sf_dir))

    def q_percent_rank():
        # r8: global percent_rank via ranked_distinct + value equi-join
        from hive_udf_spark.plans import QUERIES

        _force(QUERIES["profile_percent_rank_totalprice"].fn(spark, sf_dir))

    def q_codec_docx_extract():
        # r8: OPC zip walk + WordprocessingML run/entity replay
        from hive_udf_spark.plans import QUERIES

        _force(QUERIES["multimodal_docx_extract"].fn(spark, sf_dir))

    def q_markdown_extract():
        # r8: shared-chain markdown strip — per-row codegen, no shuffle
        from hive_udf_spark.plans import QUERIES

        _force(QUERIES["text_markdown_extract"].fn(spark, sf_dir))

    def q_codec_xlsx_extract():
        # r8: OPC zip + SpreadsheetML cells + shared-strings indirection
        from hive_udf_spark.plans import QUERIES

        _force(QUERIES["multimodal_xlsx_extract"].fn(spark, sf_dir))

    def q_srt_parse():
        # r8: caption parse — pure codegen, explode + regexp fields
        from hive_udf_spark.plans import QUERIES

        _force(QUERIES["multimodal_srt_parse"].fn(spark, sf_dir))

    def q_codec_epub_extract():
        # r8: OCF zip tier in Python, markup->text tier JVM (html chain)
        from hive_udf_spark.plans import QUERIES

        _force(QUERIES["multimodal_epub_extract"].fn(spark, sf_dir))

    def q_streaming_boilerplate():
        # r8: incremental line-DF state, 5 batches + one-commit swaps
        from hive_udf_spark.plans import QUERIES

        _force(QUERIES["streaming_incremental_boilerplate"].fn(spark, sf_dir))

    def q_codec_progressive_jpeg():
        # r8: multi-scan SOF2 decode (4 scan kinds + in-scan restarts)
        from hive_udf_spark.operators.multimodal import (
            decode_image_features,
            jpeg_block_encoder_udf,
        )

        payload = F.rpad(F.substring("text", 1, 64), 64, " ")
        enc = jpeg_block_encoder_udf(8, quality=100, progressive=True, restart_interval=5)
        blobs = docs.repartition(32).select("doc_id", payload.alias("__s")).filter(
            F.col("__s").rlike("^[\\x00-\\x7F]*$")
        ).select("doc_id", enc(F.col("__s")).alias("blob"))
        _force(decode_image_features(blobs, fake=False))

    def q_codec_webp_decode():
        # r9: lossless-WebP decode throughput — VP8L prefix-code decode
        # + transform inverses, mode-rotated fixture encode, Arrow-batched
        from hive_udf_spark.operators.multimodal import (
            decode_image_features,
            webp_encoder_udf,
        )

        payload = F.rpad(F.substring("text", 1, 64), 64, " ")
        enc = webp_encoder_udf(8, 8)
        blobs = docs.repartition(32).select("doc_id", payload.alias("__s")).filter(
            F.col("__s").rlike("^[\\x00-\\x7F]*$")
        ).select("doc_id", enc(F.col("__s")).alias("blob"))
        _force(decode_image_features(blobs, fake=False))

    def q_codec_webp_lossy_decode():
        # r10: lossy VP8 decode via the native-dispatch tier (libwebp
        # luma plane), flat-macroblock fixture encode, Arrow-batched
        from hive_udf_spark.plans import QUERIES

        _force(QUERIES["multimodal_webp_lossy_decode"].fn(spark, sf_dir))

    def q_codec_avif_decode():
        # r10: lossless-AV1 AVIF encode+decode via libheif/libaom
        # native dispatch — hash-exact pixel identity over real AV1
        from hive_udf_spark.plans import QUERIES

        _force(QUERIES["multimodal_avif_decode"].fn(spark, sf_dir))

    def q_codec_webp_anim():
        # r10: animated-WebP ANMF walk + compositing + frame sampling
        from hive_udf_spark.plans import QUERIES

        _force(QUERIES["multimodal_webp_anim_frame_sample"].fn(spark, sf_dir))

    def q_warc_br_encoding():
        # r10: Content-Encoding: br bodies (plain/chunked/gzip-stacked)
        # through the WARC walk + native libbrotli dispatch
        from hive_udf_spark.plans import QUERIES

        _force(QUERIES["text_warc_br_content_encoding"].fn(spark, sf_dir))

    def q_codec_pdf_xrefstream():
        # r9: PDF 1.5 machinery — xref streams (W-packed, PNG-predicted),
        # object streams, /Prev chains
        from hive_udf_spark.plans import QUERIES

        _force(QUERIES["multimodal_pdf_xrefstream_extract"].fn(spark, sf_dir))

    def q_codec_pdf_encrypted():
        # r10: standard-security-handler decrypt (RC4-40/128, AES-128)
        # + the usual xref/flate/text-replay walk, quarantine rotation
        from hive_udf_spark.plans import QUERIES

        _force(QUERIES["multimodal_pdf_encrypted_extract"].fn(spark, sf_dir))

    def q_codec_pdf_type0():
        # r9: Type0/Identity-H extraction — ToUnicode CMap parse +
        # per-code routing of 2-byte-CID hex show strings
        from hive_udf_spark.plans import QUERIES

        _force(QUERIES["multimodal_pdf_type0_extract"].fn(spark, sf_dir))

    def q_exif_extract():
        # r9: EXIF IFD walk + integer micro-degree GPS fold
        from hive_udf_spark.plans import QUERIES

        _force(QUERIES["multimodal_exif_extract"].fn(spark, sf_dir))

    def q_exif_strip():
        # r9: privacy scrub (APP1 drop) + full decode of the scrubbed blob
        from hive_udf_spark.plans import QUERIES

        _force(QUERIES["multimodal_exif_strip"].fn(spark, sf_dir))

    def q_png_metadata():
        # r9: PNG tEXt/zTXt/iTXt + eXIf chunk extraction
        from hive_udf_spark.plans import QUERIES

        _force(QUERIES["multimodal_png_metadata_extract"].fn(spark, sf_dir))

    def q_vtt_parse():
        # r9: WebVTT cue parsing — pure codegen, no UDF, no shuffle
        from hive_udf_spark.plans import QUERIES

        _force(QUERIES["multimodal_vtt_parse"].fn(spark, sf_dir))

    def q_codec_tar_extract():
        # r9: tar shard walk — checksum-verified headers, PAX/GNU long
        # names, gzip stratum
        from hive_udf_spark.plans import QUERIES

        _force(QUERIES["multimodal_tar_extract"].fn(spark, sf_dir))

    def q_webdataset_group():
        # r9: WebDataset sample assembly — map-side contiguity grouping,
        # zero shuffle
        from hive_udf_spark.plans import QUERIES

        _force(QUERIES["multimodal_webdataset_group"].fn(spark, sf_dir))

    def q_codec_flac_decode():
        # r9: FLAC decode throughput — frame walk, Rice residual decode,
        # FIXED prediction, CRC verification, Arrow-batched
        from hive_udf_spark.plans import QUERIES

        _force(QUERIES["multimodal_flac_audio_features"].fn(spark, sf_dir))

    def q_warc_content_encoding():
        # r9: HTTP Content-Encoding (gzip/deflate/stacked-chunked) decode
        # inside WARC ingestion
        from hive_udf_spark.plans import QUERIES

        _force(QUERIES["text_warc_content_encoding"].fn(spark, sf_dir))

    def q_codec_zstd_roundtrip():
        # r9: vendored RFC 8878 zstd — encode (shape-rotated) + full decode
        from hive_udf_spark.plans import QUERIES

        _force(QUERIES["multimodal_zstd_roundtrip"].fn(spark, sf_dir))

    def q_warc_zstd_encoding():
        # r9: Content-Encoding: zstd bodies (plain/chunked/gzip-stacked)
        # through the WARC walk + vendored zstd decoder
        from hive_udf_spark.plans import QUERIES

        _force(QUERIES["text_warc_zstd_content_encoding"].fn(spark, sf_dir))

    def q_avro_roundtrip():
        # r10: vendored Avro OCF source — zigzag varints, unions,
        # null/deflate blocks, per-block sync verify, map-side decode
        from hive_udf_spark.plans import QUERIES

        _force(QUERIES["source_avro_roundtrip"].fn(spark, sf_dir))

    def q_msgpack_roundtrip():
        # r10: vendored MessagePack row-log shards — full type family,
        # width boundaries, nested arrays, bomb-checked sizes
        from hive_udf_spark.plans import QUERIES

        _force(QUERIES["source_msgpack_roundtrip"].fn(spark, sf_dir))

    def q_cbor_roundtrip():
        # r10: vendored CBOR sequence shards — tags, preferred-width
        # floats, indefinite containers + chunked strings on odd shards
        from hive_udf_spark.plans import QUERIES

        _force(QUERIES["source_cbor_roundtrip"].fn(spark, sf_dir))

    def q_arrow_ipc_roundtrip():
        # r10: Arrow IPC file shards via pyarrow (zstd-buffer rotation)
        from hive_udf_spark.plans import QUERIES

        _force(QUERIES["source_arrow_ipc_roundtrip"].fn(spark, sf_dir))

    def q_sqlite_roundtrip():
        # r10: SQLite database shards via stdlib deserialize, read-only
        from hive_udf_spark.plans import QUERIES

        _force(QUERIES["source_sqlite_roundtrip"].fn(spark, sf_dir))

    def q_orc_roundtrip():
        # r9: native ORC sink+scan with predicate pushdown
        from hive_udf_spark.plans import QUERIES

        _force(QUERIES["source_orc_roundtrip"].fn(spark, sf_dir))

    def q_xml_roundtrip():
        # r9: native XML sink+scan, explicit schema, escape-invisible
        from hive_udf_spark.plans import QUERIES

        _force(QUERIES["source_xml_roundtrip"].fn(spark, sf_dir))

    def q_media_probe():
        # r9: Ogg/ID3/WebM structural probes — the O(header) triage pass
        from hive_udf_spark.plans import QUERIES

        _force(QUERIES["multimodal_ogg_probe"].fn(spark, sf_dir))
        _force(QUERIES["multimodal_id3_probe"].fn(spark, sf_dir))
        _force(QUERIES["multimodal_webm_probe"].fn(spark, sf_dir))
        _force(QUERIES["multimodal_heif_probe"].fn(spark, sf_dir))

    def q_streaming_shards_ingest():
        # r9: streaming .jsonl.{zst,xz,gz} ingest — one-commit merge sink
        from hive_udf_spark.plans import QUERIES

        _force(QUERIES["streaming_compressed_shards_ingest"].fn(spark, sf_dir))

    def q_compressed_shards_scan():
        # r9: .jsonl.{zst,xz,gz} shard ingestion — decode + line split +
        # schema'd JSON parse
        from hive_udf_spark.plans import QUERIES

        _force(QUERIES["source_compressed_shards_scan"].fn(spark, sf_dir))

    def q_idn_fold():
        # r9: RFC 3492 punycode fold of unicode hosts before url_key
        from hive_udf_spark.plans import QUERIES

        _force(QUERIES["web_url_idn_fold"].fn(spark, sf_dir))

    def q_langid_stopwords():
        # r9: language ID scored with the SHIPPED stopword lists
        from hive_udf_spark.plans import QUERIES

        _force(QUERIES["text_lang_id_stopwords"].fn(spark, sf_dir))

    def q_delta_roundtrip():
        # r11: vendored Delta Lake source — log replay, checkpoint,
        # remove reconciliation, distributed parquet scan of the live set
        from hive_udf_spark.plans import QUERIES

        _force(QUERIES["source_delta_roundtrip"].fn(spark, sf_dir))

    def q_iceberg_roundtrip():
        # r11: vendored Iceberg source — metadata walk + Avro manifests
        from hive_udf_spark.plans import QUERIES

        _force(QUERIES["source_iceberg_roundtrip"].fn(spark, sf_dir))

    def q_color_features():
        # r11: RGB decode tier over the 4-format lossless rotation
        from hive_udf_spark.plans import QUERIES

        _force(QUERIES["multimodal_color_features"].fn(spark, sf_dir))

    def q_color_near_dup():
        # r11: per-channel aHash + R-channel pigeonhole blocking
        from hive_udf_spark.plans import QUERIES

        _force(QUERIES["multimodal_color_near_dup"].fn(spark, sf_dir))

    def q_codec_av1_frame_sample():
        # r11: lossless AV1-in-MP4 demux + libdav1d frame decode
        from hive_udf_spark.plans import QUERIES

        _force(QUERIES["multimodal_mp4_av1_frame_sample"].fn(spark, sf_dir))

    def q_codec_hevc_frame_sample():
        # r11: lossless HEVC-in-MP4 demux (hvcC → Annex-B re-framing)
        # + libde265 frame decode
        from hive_udf_spark.plans import QUERIES

        _force(QUERIES["multimodal_mp4_hevc_frame_sample"].fn(spark, sf_dir))

    def q_codec_webm_av1_frame_sample():
        # r11: AV1-in-WebM cluster demux + libdav1d frame decode
        from hive_udf_spark.plans import QUERIES

        _force(QUERIES["multimodal_webm_av1_frame_sample"].fn(spark, sf_dir))

    def q_codec_webm_hevc_frame_sample():
        # r11: HEVC-in-Matroska (CodecPrivate hvcC) + libde265 decode
        from hive_udf_spark.plans import QUERIES

        _force(QUERIES["multimodal_webm_hevc_frame_sample"].fn(spark, sf_dir))

    def q_codec_avc_frame_sample():
        # r11: I_PCM H.264-in-MP4 demux (avcC → Annex-B) + vendored decode
        from hive_udf_spark.plans import QUERIES

        _force(QUERIES["multimodal_mp4_avc_frame_sample"].fn(spark, sf_dir))

    def q_webm_subtitles():
        # r11: S_TEXT/UTF8 cue extraction from Matroska containers
        from hive_udf_spark.plans import QUERIES

        _force(QUERIES["multimodal_webm_subtitles"].fn(spark, sf_dir))

    def q_mp4_subtitles():
        # r11: tx3g timed-text extraction (gap samples, stts timing)
        from hive_udf_spark.plans import QUERIES

        _force(QUERIES["multimodal_mp4_subtitles"].fn(spark, sf_dir))

    def q_fmp4_frame_sample():
        # r12: fragmented-MP4 demux (moof/traf/trun, both base anchors)
        from hive_udf_spark.plans import QUERIES

        _force(QUERIES["multimodal_fmp4_frame_sample"].fn(spark, sf_dir))

    def q_codec_mp1_audio():
        # r12: MPEG-1 Layer I bitstream decode (subband tier)
        from hive_udf_spark.plans import QUERIES

        _force(QUERIES["multimodal_mp1_audio_features"].fn(spark, sf_dir))

    def q_codec_au_audio():
        # r11: Sun AU container (µ-law codes straight from text)
        from hive_udf_spark.plans import QUERIES

        _force(QUERIES["multimodal_au_audio_features"].fn(spark, sf_dir))

    def q_codec_aiff_audio():
        # r11: AIFF container (80-bit-extended rate, signed BE PCM)
        from hive_udf_spark.plans import QUERIES

        _force(QUERIES["multimodal_aiff_audio_features"].fn(spark, sf_dir))

    def q_heic_exif_extract():
        # r11: EXIF-as-linked-item extraction from HEIC
        from hive_udf_spark.plans import QUERIES

        _force(QUERIES["multimodal_heic_exif_extract"].fn(spark, sf_dir))

    def q_codec_heic_decode():
        # r11: lossless HEIC (grid/idat layout) encode+decode via
        # libheif/libx265/libde265
        from hive_udf_spark.plans import QUERIES

        _force(QUERIES["multimodal_heic_decode"].fn(spark, sf_dir))

    def q_delta_dv_column_mapping():
        # r11: roaring deletion vectors + physical-name column mapping
        from hive_udf_spark.plans import QUERIES

        _force(QUERIES["source_delta_dv_column_mapping"].fn(spark, sf_dir))

    def q_iceberg_v2_deletes():
        # r11: position + equality delete application (broadcast anti-joins)
        from hive_udf_spark.plans import QUERIES

        _force(QUERIES["source_iceberg_v2_deletes"].fn(spark, sf_dir))

    def q_hudi_mor_deletes():
        # r13: MOR delete-block tombstones + delete-then-reinsert merge
        from hive_udf_spark.plans import QUERIES

        _force(QUERIES["source_hudi_mor_deletes"].fn(spark, sf_dir))

    def q_iceberg_field_id_reads():
        # r13: field-id column resolution across a rename (cloned-session
        # scan, one-footer detection)
        from hive_udf_spark.plans import QUERIES

        _force(QUERIES["source_iceberg_renamed_column"].fn(spark, sf_dir))

    def q_iceberg_schema_evolution():
        # r13: add/drop+readd/int-promotion evolution under field ids
        from hive_udf_spark.plans import QUERIES

        _force(QUERIES["source_iceberg_schema_evolution"].fn(spark, sf_dir))

    def q_delta_compaction():
        # r13: OPTIMIZE-style small-file compaction (one-commit swap)
        from hive_udf_spark.plans import QUERIES

        _force(QUERIES["sink_delta_compaction"].fn(spark, sf_dir))

    def q_iceberg_compaction():
        # r13: rewrite compaction — row-level deletes made permanent
        from hive_udf_spark.plans import QUERIES

        _force(QUERIES["sink_iceberg_compaction"].fn(spark, sf_dir))

    def q_hudi_clustering():
        # r13: replacecommit clustering = MOR log compaction
        from hive_udf_spark.plans import QUERIES

        _force(QUERIES["sink_hudi_clustering"].fn(spark, sf_dir))

    def q_hudi_upsert_ingest():
        # r13: MOR upsert/delete sink (bucket-index routing)
        from hive_udf_spark.plans import QUERIES

        _force(QUERIES["streaming_hudi_upsert_ingest"].fn(spark, sf_dir))

    def q_iceberg_upsert_ingest():
        # r13: equality-delete upsert snapshots (sequence-gated merge)
        from hive_udf_spark.plans import QUERIES

        _force(QUERIES["streaming_iceberg_upsert_ingest"].fn(spark, sf_dir))

    def q_iceberg_name_mapping():
        # r13: schema.name-mapping.default over id-less files
        from hive_udf_spark.plans import QUERIES

        _force(QUERIES["source_iceberg_name_mapping"].fn(spark, sf_dir))

    def q_delta_vacuum_lifecycle():
        # r13: ingest -> orphan -> compact -> vacuum, read-back checked
        from hive_udf_spark.plans import QUERIES

        _force(QUERIES["sink_delta_vacuum_lifecycle"].fn(spark, sf_dir))

    def q_delta_checkpointed_ingest():
        # r13: periodic classic checkpoints (reader fast-path)
        from hive_udf_spark.plans import QUERIES

        _force(QUERIES["streaming_delta_checkpointed_ingest"].fn(
            spark, sf_dir))

    def q_iceberg_partitioned_compaction():
        # r14: hot-partition-only rewrite, cold groups carry as EXISTING
        from hive_udf_spark.plans import QUERIES

        _force(QUERIES["sink_iceberg_partitioned_compaction"].fn(
            spark, sf_dir))

    def q_hudi_partitioned_clustering():
        # r14: hot-partition-only replacecommit
        from hive_udf_spark.plans import QUERIES

        _force(QUERIES["sink_hudi_partitioned_clustering"].fn(
            spark, sf_dir))

    def q_hudi_composite_key():
        # r14: 2-field record key MOR merge with composite delete blocks
        from hive_udf_spark.plans import QUERIES

        _force(QUERIES["source_hudi_mor_composite_key"].fn(spark, sf_dir))

    def q_tfrecord_roundtrip():
        # r14: TFRecord framing + tf.train.Example proto decode,
        # raw/gzip/zstd shard rotation
        from hive_udf_spark.plans import QUERIES

        _force(QUERIES["source_tfrecord_roundtrip"].fn(spark, sf_dir))

    def q_iceberg_multiname_mapping():
        # r14: per-file alias resolution, one scan per writer era
        from hive_udf_spark.plans import QUERIES

        _force(QUERIES["source_iceberg_multiname_mapping"].fn(
            spark, sf_dir))

    def q_delta_auto_maintained_ingest():
        # r14: in-sink compaction/vacuum cadence, bounded layout
        from hive_udf_spark.plans import QUERIES

        _force(QUERIES["streaming_delta_auto_maintained_ingest"].fn(
            spark, sf_dir))

    def q_delta_dv_delete():
        # r14: delete-without-rewrite via executor-written DVs
        from hive_udf_spark.plans import QUERIES

        _force(QUERIES["sink_delta_dv_delete"].fn(spark, sf_dir))

    def q_delta_changes():
        # r14: CDF-lite change query incl. DV-diff deletes
        from hive_udf_spark.plans import QUERIES

        _force(QUERIES["source_delta_changes"].fn(spark, sf_dir))

    def q_iceberg_incremental():
        # r14: snapshot-range incremental append scan
        from hive_udf_spark.plans import QUERIES

        _force(QUERIES["source_iceberg_incremental"].fn(spark, sf_dir))

    def q_hudi_incremental():
        # r14: instant-range incremental query
        from hive_udf_spark.plans import QUERIES

        _force(QUERIES["source_hudi_incremental"].fn(spark, sf_dir))

    def q_delta_cdf_stream():
        # r14: Python Data Source streaming reader over the change feed
        from hive_udf_spark.plans import QUERIES

        _force(QUERIES["streaming_delta_cdf_source"].fn(spark, sf_dir))

    def q_iceberg_incremental_stream():
        # r14: snapshot-offset streaming source (Python Data Source API)
        from hive_udf_spark.plans import QUERIES

        _force(QUERIES["streaming_iceberg_incremental_source"].fn(
            spark, sf_dir))

    def q_hudi_incremental_stream():
        # r14: instant-offset streaming source
        from hive_udf_spark.plans import QUERIES

        _force(QUERIES["streaming_hudi_incremental_source"].fn(
            spark, sf_dir))

    def q_delta_merge():
        # r14: copy-on-write MERGE INTO, O(touched files)
        from hive_udf_spark.plans import QUERIES

        _force(QUERIES["sink_delta_merge"].fn(spark, sf_dir))

    def q_iceberg_merge():
        # r14: merge-on-read MERGE INTO, zero rewrite
        from hive_udf_spark.plans import QUERIES

        _force(QUERIES["sink_iceberg_merge"].fn(spark, sf_dir))

    def q_hudi_merge():
        # r14: MOR log-block MERGE INTO, no base rewrites
        from hive_udf_spark.plans import QUERIES

        _force(QUERIES["sink_hudi_merge"].fn(spark, sf_dir))

    def q_codec_ogg_dispatch():
        # r14: native Opus/Vorbis decode dispatch (quarantine-when-absent)
        from hive_udf_spark.plans import QUERIES

        _force(QUERIES["multimodal_ogg_audio_features"].fn(spark, sf_dir))

    def q_codec_mp3_dispatch():
        # r13: native MPEG-audio decode dispatch (quarantine-when-absent)
        from hive_udf_spark.plans import QUERIES

        _force(QUERIES["multimodal_mp3_audio_features"].fn(spark, sf_dir))

    def q_streaming_delta_ingest():
        # r11: micro-batches -> Delta commits -> read_delta snapshot
        from hive_udf_spark.plans import QUERIES

        _force(QUERIES["streaming_delta_ingest"].fn(spark, sf_dir))

    def q_hudi_roundtrip():
        # r11: vendored Hudi COW source — timeline walk + file slices
        from hive_udf_spark.plans import QUERIES

        _force(QUERIES["source_hudi_roundtrip"].fn(spark, sf_dir))

    def q_hudi_mor_roundtrip():
        # r12: MERGE_ON_READ — distributed log-block decode + key merge
        from hive_udf_spark.plans import QUERIES

        _force(QUERIES["source_hudi_mor_roundtrip"].fn(spark, sf_dir))

    def q_delta_dv_id_mode():
        # r12: id-mode column mapping (parquet field ids) + in-scan DV
        from hive_udf_spark.plans import QUERIES

        _force(QUERIES["source_delta_dv_id_mode"].fn(spark, sf_dir))

    def q_iceberg_nested_types():
        # r12: recursive struct/list/map schema conversion + nested scan
        from hive_udf_spark.plans import QUERIES

        _force(QUERIES["source_iceberg_nested_types"].fn(spark, sf_dir))

    def q_delta_v2_checkpoint():
        # r12: v2 checkpoint (sidecar layout) replay + DV survival
        from hive_udf_spark.plans import QUERIES

        _force(QUERIES["source_delta_v2_checkpoint"].fn(spark, sf_dir))

    def q_streaming_iceberg_ingest():
        # r12: micro-batches -> append snapshots (manifest reuse)
        from hive_udf_spark.plans import QUERIES

        _force(QUERIES["streaming_iceberg_ingest"].fn(spark, sf_dir))

    def q_streaming_hudi_ingest():
        # r12: micro-batches -> completed timeline commits
        from hive_udf_spark.plans import QUERIES

        _force(QUERIES["streaming_hudi_ingest"].fn(spark, sf_dir))

    def q_semantic_decontam():
        from hive_udf_spark.operators.decontam import semantic_decontam

        ev = emb.filter(F.col("vec_id") % 41 == 0)
        corpus = emb.filter(F.col("vec_id") % 41 != 0)
        _force(semantic_decontam(corpus, ev, min_cosine=0.35))

    def q_incremental_spans():
        from hive_udf_spark.operators.spandedup import (
            build_ngram_index,
            probe_duplicate_spans,
        )

        corpus = docs.filter(F.col("doc_id") % 10 != 0)
        batch = docs.filter(F.col("doc_id") % 10 == 0)
        _force(probe_duplicate_spans(build_ngram_index(corpus, n=5), batch, n=5))

    def q_containment_join():
        # EXACT asymmetric containment (3-gram shingles): prefix-probed
        # candidates vs the quadratic brute oracle — contract-bound to
        # true subset-pair volume
        from hive_udf_spark.operators.dedup import containment_pairs

        _force(containment_pairs(docs, "doc_id", "text", threshold=0.8, shingle_n=3))

    def q_pagerank_1m():
        # pure iteration throughput: 5 integer power-iterations over a
        # deterministic 1M-edge graph (200k nodes, out-degree 5) —
        # graph CONSTRUCTION cost is a different operator's bench
        # (simhash_blocked / minhash_lsh_dedup generate the pair sets)
        from hive_udf_spark.operators.graph import pagerank_fixed

        n, m = 200_000, 5
        edges = spark.range(n * m).selectExpr(
            f"id % {n} AS src",
            f"(id * 2654435761 + id div {n} * 40503 + 7) % {n} AS dst",
        ).filter("src != dst")
        _force(pagerank_fixed(edges, iters=5))

    def q_hybrid_rrf():
        # BM25 leg + brute vector leg + integer RRF fusion
        from hive_udf_spark.operators.retrieval import build_tfidf_index, hybrid_rrf_topk

        queries = docs.filter(F.col("doc_id") % 97 == 0)
        qvecs = emb.filter(F.col("vec_id") % 97 == 0)
        _force(
            hybrid_rrf_topk(build_tfidf_index(docs), queries, emb, qvecs, k=10)
        )

    def q_hllp_grouped():
        # portable HLL: relational register build + bit-exact estimate
        from hive_udf_spark.functions.hllp import hllp_estimate, hllp_table

        _force(
            hllp_estimate(
                hllp_table(lineitem, ["l_returnflag"], "l_orderkey", m=256),
                ["l_returnflag"],
                m=256,
            )
        )

    def q_nb_classify():
        # fast path: xxhash64 buckets (the oracle covers portable mode);
        # closed-form fit on the 4/5 split + full-corpus argmax scoring
        from hive_udf_spark.operators.importance import nb_classify

        _force(
            nb_classify(docs, docs.filter(F.col("doc_id") % 5 != 0), buckets=4096)
        )

    def q_video_near_dup():
        # container build -> real frame walk (2:1 sampled) -> per-frame
        # aHash -> shared-keyframe pair join
        from hive_udf_spark.operators.dedup import shared_signature_pairs
        from hive_udf_spark.operators.multimodal import video_frame_signatures

        sigs = video_frame_signatures(docs)
        _force(shared_signature_pairs(sigs, "doc_id", "ahash", min_shared=2))

    benches = {
        "hll_grouped_lineitem": q_hll_lineitem,
        "hll_vs_exact_events": q_hll_exact_compare,
        "lc_grouped_orders": q_lc_orders,
        "sketch_rollup": q_sketch_rollup,
        "tpch_q1": q_tpch_q1,
        "tpch_q5": q_tpch_q5,
        "window_topk": q_window_topk,
        "minhash_lsh_dedup": q_minhash_lsh_fast,
        "dedup_clusters": q_dedup_clusters,
        "dedup_clusters_exact": q_dedup_clusters_exact,
        "dedup_clusters_star": q_dedup_clusters_star,
        "simhash_blocked": q_simhash_blocked_fast,
        "topk_dot_bruteforce": q_topk_dot,
        "near_pairs_lsh": q_near_pairs_lsh,
        "vec_dedup_clusters": q_vec_dedup_clusters,
        "ann_lsh": q_ann_lsh,
        "ann_ivf": q_ann_ivf,
        "ann_pq": q_ann_pq,
        "ann_pq_pretrained": q_ann_pq_pretrained,
        "pipeline_prep": q_pipeline_prep,
        "decontaminate": q_decontaminate,
        "bloom_prefilter": q_bloom_prefilter,
        "freq_sketches": q_freq_sketches,
        "asof_join": q_asof_join,
        "range_join": q_range_join,
        "tpch_q7": q_tpch_q7,
        "tpch_q10": q_tpch_q10,
        "lc_two_phase": q_lc_two_phase,
        "lc_struct_table": q_lc_struct_table,
        "lc_struct_table_default": q_lc_struct_table_default,
        "quantile_sketch": q_quantile_sketch,
        "text_profile": q_text_profile,
        "gopher_filter": q_gopher_filter,
        "kmv_grouped": q_kmv_grouped,
        "incremental_dedup": q_incremental_dedup,
        "incremental_dedup_shuffle": q_incremental_dedup_shuffle,
        "dsir_weights": q_dsir_weights,
        "strip_spans": q_strip_spans,
        "bpe_train": q_bpe_train,
        "bpe_train_256": q_bpe_train_256,
        "image_near_dup": q_image_near_dup,
        "prefix_filter_join": q_prefix_filter,
        "pcsa_grouped": q_pcsa_grouped,
        "kmv_sliding_7d": q_kmv_sliding,
        "funnel_cohort": q_funnel_cohort,
        "incremental_spans": q_incremental_spans,
        "bm25_search": q_bm25_search,
        "semantic_decontam": q_semantic_decontam,
        "quantile_sliding_7d": q_quantile_sliding,
        "lm_perplexity": q_lm_perplexity,
        "containment_join": q_containment_join,
        "pagerank_1m": q_pagerank_1m,
        "hybrid_rrf": q_hybrid_rrf,
        "hllp_grouped": q_hllp_grouped,
        "nb_classify": q_nb_classify,
        "video_near_dup": q_video_near_dup,
        "codec_png_decode": q_codec_png_decode,
        "codec_jpeg_decode": q_codec_jpeg_decode,
        "profile_histogram": q_profile_histogram,
        "url_canonicalize": q_url_canonicalize,
        "url_dedup": q_url_dedup,
        "mojibake_repair": q_mojibake_repair,
        "crawl_frontier": q_crawl_frontier,
        "codec_progressive_jpeg_decode": q_codec_progressive_jpeg,
        "fuzzy_edit_join": q_fuzzy_edit_join,
        "host_pagerank": q_host_pagerank,
        "codec_tiff_tiled_decode": q_codec_tiff_tiled,
        "codec_pdf_extract": q_codec_pdf_extract,
        "c4_line_filter": q_c4_line_filter,
        "boilerplate_removal": q_boilerplate_removal,
        "correlation_matrix": q_correlation_matrix,
        "luhn_validation": q_luhn_validation,
        "line_repetition": q_line_repetition,
        "semdedup": q_semdedup,
        "token_entropy": q_token_entropy,
        "jsonl_ingest": q_jsonl_ingest,
        "politeness_schedule": q_politeness_schedule,
        "winsorize": q_winsorize,
        "audio_quality": q_audio_quality,
        "centroid_outliers": q_centroid_outliers,
        "politeness_crawl_delay": q_politeness_crawl_delay,
        "footer_audit": q_footer_audit,
        "percent_rank": q_percent_rank,
        "codec_docx_extract": q_codec_docx_extract,
        "markdown_extract": q_markdown_extract,
        "codec_xlsx_extract": q_codec_xlsx_extract,
        "srt_parse": q_srt_parse,
        "codec_epub_extract": q_codec_epub_extract,
        "streaming_boilerplate": q_streaming_boilerplate,
        "codec_webp_decode": q_codec_webp_decode,
        "codec_webp_lossy_decode": q_codec_webp_lossy_decode,
        "warc_br_encoding": q_warc_br_encoding,
        "codec_avif_decode": q_codec_avif_decode,
        "codec_webp_anim_frame_sample": q_codec_webp_anim,
        "codec_pdf_xrefstream_extract": q_codec_pdf_xrefstream,
        "codec_pdf_type0_extract": q_codec_pdf_type0,
        "codec_pdf_encrypted_extract": q_codec_pdf_encrypted,
        "codec_flac_decode": q_codec_flac_decode,
        "codec_tar_extract": q_codec_tar_extract,
        "webdataset_group": q_webdataset_group,
        "vtt_parse": q_vtt_parse,
        "exif_extract": q_exif_extract,
        "exif_strip": q_exif_strip,
        "png_metadata_extract": q_png_metadata,
        "warc_content_encoding": q_warc_content_encoding,
        "codec_zstd_roundtrip": q_codec_zstd_roundtrip,
        "warc_zstd_encoding": q_warc_zstd_encoding,
        "compressed_shards_scan": q_compressed_shards_scan,
        "streaming_shards_ingest": q_streaming_shards_ingest,
        "media_probe": q_media_probe,
        "orc_roundtrip": q_orc_roundtrip,
        "avro_roundtrip": q_avro_roundtrip,
        "arrow_ipc_roundtrip": q_arrow_ipc_roundtrip,
        "msgpack_roundtrip": q_msgpack_roundtrip,
        "cbor_roundtrip": q_cbor_roundtrip,
        "sqlite_roundtrip": q_sqlite_roundtrip,
        "xml_roundtrip": q_xml_roundtrip,
        "idn_fold": q_idn_fold,
        "langid_stopwords": q_langid_stopwords,
        "delta_roundtrip": q_delta_roundtrip,
        "iceberg_roundtrip": q_iceberg_roundtrip,
        "hudi_roundtrip": q_hudi_roundtrip,
        "iceberg_v2_deletes": q_iceberg_v2_deletes,
        "delta_dv_column_mapping": q_delta_dv_column_mapping,
        "streaming_delta_ingest": q_streaming_delta_ingest,
        "color_features": q_color_features,
        "color_near_dup": q_color_near_dup,
        "codec_av1_frame_sample": q_codec_av1_frame_sample,
        "codec_hevc_frame_sample": q_codec_hevc_frame_sample,
        "codec_avc_frame_sample": q_codec_avc_frame_sample,
        "codec_webm_av1_frame_sample": q_codec_webm_av1_frame_sample,
        "codec_webm_hevc_frame_sample": q_codec_webm_hevc_frame_sample,
        "codec_heic_decode": q_codec_heic_decode,
        "heic_exif_extract": q_heic_exif_extract,
        "codec_au_audio": q_codec_au_audio,
        "webm_subtitles": q_webm_subtitles,
        "mp4_subtitles": q_mp4_subtitles,
        "codec_aiff_audio": q_codec_aiff_audio,
        "hudi_mor_roundtrip": q_hudi_mor_roundtrip,
        "delta_dv_id_mode": q_delta_dv_id_mode,
        "iceberg_nested_types": q_iceberg_nested_types,
        "fmp4_frame_sample": q_fmp4_frame_sample,
        "codec_mp1_audio": q_codec_mp1_audio,
        "delta_v2_checkpoint": q_delta_v2_checkpoint,
        "streaming_iceberg_ingest": q_streaming_iceberg_ingest,
        "streaming_hudi_ingest": q_streaming_hudi_ingest,
        "hudi_mor_deletes": q_hudi_mor_deletes,
        "iceberg_field_id_reads": q_iceberg_field_id_reads,
        "iceberg_schema_evolution": q_iceberg_schema_evolution,
        "codec_mp3_dispatch": q_codec_mp3_dispatch,
        "delta_compaction": q_delta_compaction,
        "iceberg_compaction": q_iceberg_compaction,
        "hudi_clustering": q_hudi_clustering,
        "delta_checkpointed_ingest": q_delta_checkpointed_ingest,
        "delta_vacuum_lifecycle": q_delta_vacuum_lifecycle,
        "iceberg_name_mapping": q_iceberg_name_mapping,
        "hudi_upsert_ingest": q_hudi_upsert_ingest,
        "iceberg_upsert_ingest": q_iceberg_upsert_ingest,
        "iceberg_partitioned_compaction": q_iceberg_partitioned_compaction,
        "hudi_partitioned_clustering": q_hudi_partitioned_clustering,
        "hudi_composite_key": q_hudi_composite_key,
        "tfrecord_roundtrip": q_tfrecord_roundtrip,
        "iceberg_multiname_mapping": q_iceberg_multiname_mapping,
        "delta_auto_maintained_ingest": q_delta_auto_maintained_ingest,
        "codec_ogg_dispatch": q_codec_ogg_dispatch,
        "delta_dv_delete": q_delta_dv_delete,
        "delta_changes": q_delta_changes,
        "iceberg_incremental": q_iceberg_incremental,
        "hudi_incremental": q_hudi_incremental,
        "delta_cdf_stream": q_delta_cdf_stream,
        "iceberg_incremental_stream": q_iceberg_incremental_stream,
        "hudi_incremental_stream": q_hudi_incremental_stream,
        "delta_merge": q_delta_merge,
        "iceberg_merge": q_iceberg_merge,
        "hudi_merge": q_hudi_merge,
    }

    # Contention-robust protocol (r5 verdict item 1): a single-shot run
    # lets one OS/contention window inflate whatever entry it overlaps —
    # r5's official artifact showed 6 entries at 2-6x with git-verified
    # unchanged code. Per entry: one COLD run (recorded separately), then
    # SPARK_GRAFT_BENCH_RUNS warm runs (default 3) whose MEDIAN is the
    # headline number. Cache is cleared before every run so "warm" means
    # JIT/codegen-warm, never inherited cached data.
    # Quiet-first ordering (r14 — the r13 verdict's task 7): three
    # entries moved 1.5-2.5x between in-run and standalone measurement
    # in EVERY round since r11 with git-verified unchanged code
    # (SCALE_NOTES r12 batch 4 / r13 batch 6) — heavy Python-worker
    # entries whose cost is sensitive to the session state the
    # preceding ~150 entries leave behind (GC pressure, allocator
    # fragmentation in the 32 long-lived workers).  Running them FIRST,
    # against the same just-warmed session state the standalone
    # protocol measures, removes the recurring in-run skew every
    # verdict has had to re-adjudicate instead of re-measuring by hand.
    quiet_first = ("exif_strip", "media_probe", "pagerank_1m")
    benches = {
        **{k: benches[k] for k in quiet_first if k in benches},
        **{k: v for k, v in benches.items() if k not in quiet_first},
    }
    n_warm = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3")))
    # Iteration aid: SPARK_GRAFT_BENCH_ONLY=a,b,c runs a subset. The
    # driver never sets it, so official artifacts stay full-registry.
    only = os.environ.get("SPARK_GRAFT_BENCH_ONLY")
    if only:
        wanted = {w for w in only.split(",") if w}
        unknown = wanted - benches.keys()
        if unknown:
            raise SystemExit(f"unknown bench entries: {sorted(unknown)}")
        benches = {k: v for k, v in benches.items() if k in wanted}
    times: dict[str, float] = {}
    cold: dict[str, float] = {}

    def _timed(fn) -> float:
        spark.catalog.clearCache()
        t0 = time.time()
        fn()
        return round(time.time() - t0, 3)

    for name, fn in benches.items():
        cold[name] = _timed(fn)
        warm = sorted(_timed(fn) for _ in range(n_warm))
        times[name] = warm[len(warm) // 2]
    return times, cold, n_warm


# The compact stdout line's key set (see main()): every key any prior
# round's compact line printed, in the r14 printed order. Append-only —
# removing or renaming a key here makes the driver's round-over-round
# diff report a dropped query.
_COMPACT_PINNED = (
    "exif_strip", "media_probe", "pagerank_1m", "hll_grouped_lineitem",
    "hll_vs_exact_events", "lc_grouped_orders", "sketch_rollup", "tpch_q1",
    "tpch_q5", "window_topk", "minhash_lsh_dedup", "dedup_clusters",
    "dedup_clusters_exact", "dedup_clusters_star", "simhash_blocked",
    "topk_dot_bruteforce", "near_pairs_lsh", "vec_dedup_clusters",
    "ann_lsh", "ann_ivf", "ann_pq", "ann_pq_pretrained", "pipeline_prep",
    "decontaminate", "bloom_prefilter", "freq_sketches", "asof_join",
    "range_join", "tpch_q7", "tpch_q10", "lc_two_phase", "lc_struct_table",
    "lc_struct_table_default", "quantile_sketch", "text_profile",
    "gopher_filter", "kmv_grouped", "incremental_dedup",
    "incremental_dedup_shuffle", "dsir_weights", "strip_spans", "bpe_train",
    "bpe_train_256", "image_near_dup", "prefix_filter_join", "pcsa_grouped",
    "kmv_sliding_7d", "funnel_cohort", "incremental_spans", "bm25_search",
    "semantic_decontam", "quantile_sliding_7d", "lm_perplexity",
    "containment_join", "hybrid_rrf", "hllp_grouped", "nb_classify",
    "video_near_dup", "codec_png_decode", "codec_jpeg_decode",
    "profile_histogram", "url_canonicalize", "url_dedup", "mojibake_repair",
    "crawl_frontier", "codec_progressive_jpeg_decode",
)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)

    from hive_udf_spark.session import get_spark

    spark = get_spark("bench")
    # warm the JVM/session so timings measure the queries, not startup
    spark.range(1000).select(F.sum("id")).collect()
    # warm the Python workers too: as of r4 almost every operator is
    # JVM-only, so without this the ONE bench entry that still uses a
    # pandas UDF (lc_two_phase) would absorb the whole 32-process
    # interpreter spin-up (~3-4 s) that earlier rounds amortized across
    # many Python-using queries — making cross-round numbers
    # incomparable. Real deployments run with warm workers.
    def _noop(batches):
        yield from batches

    spark.range(32 * 4).repartition(32).mapInPandas(
        _noop, schema="id long"
    ).count()

    times, cold, n_warm = bench_queries(spark, sf_dir)
    total = round(sum(times.values()), 3)
    payload = json.dumps(
        {
            "metric": "total_wall_sec",
            "value": total,
            "unit": "sec",
            "queries": times,
            "queries_cold": cold,
            "warm_runs": n_warm,
            "sf": sf,
        }
    )
    # The stdout line is the driver contract, but the driver's artifact
    # keeps only the LAST ~2000 chars of stdout — r8/r9 committed
    # "parsed": null because the full per-query JSON (~5 KB for 100+
    # entries) can never survive that tail intact. So: the COMPLETE
    # JSON goes to a committed file + an early stdout line (for humans
    # reading logs), and the FINAL stdout line is a compact variant
    # guaranteed to fit in the tail — same metric/value/sf contract,
    # "queries" filled greedily in registry order until the line would
    # exceed the budget, with an explicit count of what was elided.
    try:
        with open(
            os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "BENCH_full_latest.json"),
            "w",
        ) as f:
            f.write(payload + "\n")
    except OSError:
        pass  # read-only checkout: stdout lines still carry the result
    print(payload)
    # r15 (r14 verdict "What's wrong" #2): the compact line's key set is
    # PINNED, not filled greedily in registry order. Greedy fill meant any
    # dict reorder or added entry shifted which ~65 keys got printed — the
    # r14 PERF diff reported one "dropped" and two "new" queries that were
    # neither. The pinned set is exactly the 65 keys the r14 line printed
    # plus codec_progressive_jpeg_decode (the r14 phantom drop, restored).
    # Additions-only vs every previous round's printed set; deterministic
    # under any future registry edit. New registry entries stay in
    # BENCH_full_latest.json (the complete artifact) by design.
    compact = {k: times[k] for k in _COMPACT_PINNED if k in times}
    if os.environ.get("SPARK_GRAFT_BENCH_ONLY"):
        # iteration-aid subset runs (never the driver): print what ran
        compact = dict(times)
    base = {
        "metric": "total_wall_sec",
        "value": total,
        "unit": "sec",
        "queries": compact,
        "queries_elided": len(times) - len(compact),
        "queries_total": len(times),
        "full": "BENCH_full_latest.json",
        "warm_runs": n_warm,
        "sf": sf,
    }
    line = json.dumps(base)
    assert len(line) <= 2000, len(line)
    print(line, flush=True)
    try:
        spark.stop()
    except Exception:
        pass  # a teardown hiccup must not turn a finished bench into rc!=0
    os._exit(0)


if __name__ == "__main__":
    main()
