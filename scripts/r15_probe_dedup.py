#!/usr/bin/env python
"""r15 guide-§1 decomposition probe: where do the exact-verify dedup
entries spend their seconds? Times each pipeline stage in isolation
(eager checkpoint between stages) so candidate-generation cost and
per-pair verify cost are separated. Probe only — never run by the
driver; bench.py remains the official timing surface.

Usage: python scripts/r15_probe_dedup.py [prefix,containment,minhash,incremental]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402


def _force(df):
    df.write.format("noop").mode("overwrite").save()


def timed(label, fn, runs=2):
    best = None
    for _ in range(runs):
        t0 = time.time()
        out = fn()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    print(f"  {label:<42s} {best:7.3f} s")
    return out


def main() -> None:
    only = set(sys.argv[1].split(",")) if len(sys.argv) > 1 else None

    from hive_udf_spark.functions.text import ngrams, tokenize, word_set
    from hive_udf_spark.operators.dedup import (
        jaccard_pair_stats,
        lsh_candidate_pairs,
        minhash_signature,
        prefix_filter_candidates,
    )
    from hive_udf_spark.session import get_spark
    from hive_udf_spark.sources import load_table

    spark = get_spark("r15-probe-dedup")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    docs = load_table(spark, sf_dir, "documents")
    # warm workers/JIT
    spark.range(1000).select(F.sum("id")).collect()

    if only is None or "prefix" in only:
        print("== prefix_filter_join (t=0.9, word sets, strings) ==")
        ws = docs.select(F.col("doc_id").alias("__id"), word_set("text").alias("__w")).filter(
            F.size("__w") > 0
        )
        ws = timed("ws materialize (tokenize)", lambda: ws.localCheckpoint(eager=True))
        cands = timed(
            "candidates (explode+join+distinct)",
            lambda: prefix_filter_candidates(ws, 0.9).localCheckpoint(eager=True),
        )
        print(f"  candidate pairs: {cands.count()}")
        wa = ws.select(F.col("__id").alias("id_a"), F.col("__w").alias("__wa"))
        wb = ws.select(F.col("__id").alias("id_b"), F.col("__w").alias("__wb"))

        def verify():
            joined = cands.join(wa, "id_a").join(wb, "id_b")
            inter, union = jaccard_pair_stats(F.col("__wa"), F.col("__wb"))
            _force(
                joined.select(
                    "id_a", "id_b", inter.cast("long").alias("i"), union.cast("long").alias("u")
                ).filter(F.col("i") * 1_000_000 >= 900_000 * F.col("u"))
            )

        timed("verify (2 joins + array_intersect)", verify)

        def attach_only():
            joined = cands.join(wa, "id_a").join(wb, "id_b")
            _force(joined.select("id_a", "id_b", F.size("__wa").alias("x"), F.size("__wb").alias("y")))

        timed("attach only (2 joins, size() not intersect)", attach_only)

    if only is None or "containment" in only:
        print("== containment_join (t=0.8, 3-gram shingles) ==")
        t_ppm = 800_000
        unit = F.array_distinct(ngrams(tokenize("text"), 3))
        ws = docs.select(F.col("doc_id").alias("__id"), unit.alias("__w")).filter(
            F.size("__w") > 0
        )
        ws = timed("ws materialize (3-gram shingles)", lambda: ws.localCheckpoint(eager=True))
        tokens = ws.select(F.explode("__w").alias("__t"))
        freq = tokens.groupBy("__t").agg(F.count(F.lit(1)).alias("__f"))
        ranked = (
            ws.select("__id", F.size("__w").alias("__n"), F.explode("__w").alias("__t"))
            .join(freq, "__t")
            .groupBy("__id", "__n")
            .agg(F.sort_array(F.collect_list(F.struct(F.col("__f"), F.col("__t")))).alias("__rs"))
        )
        ranked = timed("ranked (freq join + collect+sort)", lambda: ranked.localCheckpoint(eager=True))
        plen = (
            F.col("__n")
            - F.expr(f"CAST((CAST(__n AS BIGINT) * {t_ppm} + 999999) div 1000000 AS INT)")
            + F.lit(1)
        )
        probe = ranked.select(
            F.col("__id").alias("id_a"),
            F.col("__n").alias("__na"),
            F.explode(F.transform(F.slice("__rs", 1, plen), lambda s: s["__t"])).alias("__r"),
        )
        container = ws.select(
            F.col("__id").alias("id_b"),
            F.size("__w").alias("__nb"),
            F.explode("__w").alias("__r"),
        )
        cands = (
            probe.join(
                container,
                (probe["__r"] == container["__r"])
                & (F.col("id_a") != F.col("id_b"))
                & (F.col("__nb").cast("long") * F.lit(1_000_000)
                   >= F.lit(t_ppm) * F.col("__na").cast("long")),
            )
            .select("id_a", "id_b")
            .distinct()
        )
        cands = timed("candidates (probe x container + distinct)", lambda: cands.localCheckpoint(eager=True))
        print(f"  candidate pairs: {cands.count()}")
        wa = ws.select(F.col("__id").alias("id_a"), F.col("__w").alias("__wa"))
        wb = ws.select(F.col("__id").alias("id_b"), F.col("__w").alias("__wb"))

        def verify():
            joined = cands.join(wa, "id_a").join(wb, "id_b")
            inter = F.size(F.array_intersect(F.col("__wa"), F.col("__wb")))
            _force(
                joined.select(
                    "id_a", "id_b", inter.cast("long").alias("i"),
                    F.size("__wa").cast("long").alias("sa"),
                    F.size("__wb").cast("long").alias("sb"),
                ).filter(F.col("i") * 1_000_000 >= F.lit(t_ppm) * F.col("sa"))
            )

        timed("verify (2 joins + array_intersect)", verify)

    if only is None or "minhash" in only:
        print("== minhash_lsh_dedup (t=0.7, b=4, hashed tokens, prefilter 0.25) ==")
        shingles = F.transform(word_set("text"), lambda t: F.xxhash64(t))
        with_sig = (
            docs.select(F.col("doc_id").alias("__id"), shingles.alias("__ws"))
            .filter(F.size("__ws") > 0)
            .withColumn("sig", minhash_signature(F.col("__ws"), 16, False))
        )
        with_sig = timed("signatures materialize", lambda: with_sig.localCheckpoint(eager=True))
        cands = lsh_candidate_pairs(with_sig, "__id", "sig", 4, 4, hashed_band_key=True)
        cands = timed("candidates (band join + distinct)", lambda: cands.localCheckpoint(eager=True))
        print(f"  candidate pairs: {cands.count()}")
        payload = [F.col("__ws"), F.size("__ws").alias("__n"), F.col("sig")]
        side = with_sig.select(F.col("__id"), F.struct(*payload).alias("__pl"))

        def verify(prefilter: bool):
            joined = (
                cands.join(side.withColumnRenamed("__id", "id_a").withColumnRenamed("__pl", "__pa"), "id_a")
                .join(side.withColumnRenamed("__id", "id_b").withColumnRenamed("__pl", "__pb"), "id_b")
            )
            if prefilter:
                est_num = F.aggregate(
                    F.zip_with(F.col("__pa.sig"), F.col("__pb.sig"), lambda x, y: (x == y).cast("int")),
                    F.lit(0),
                    lambda a, x: a + x,
                )
                joined = joined.filter(est_num * F.lit(1_000_000) >= F.lit(450_000 * 16))
            inter = F.size(F.array_intersect(F.col("__pa.__ws"), F.col("__pb.__ws")))
            union = F.col("__pa.__n") + F.col("__pb.__n") - inter
            _force(
                joined.select("id_a", "id_b", inter.alias("i"), union.alias("u")).filter(
                    F.col("i") * F.lit(1_000_000) >= F.lit(700_000) * F.col("u")
                )
            )

        timed("verify (prefilter + intersect)", lambda: verify(True))
        timed("verify (intersect, no prefilter)", lambda: verify(False))

    if only is None or "incremental" in only:
        print("== incremental_dedup_shuffle (t=0.5, b=8, hashed, no broadcast) ==")
        from hive_udf_spark.operators.dedup import build_minhash_index

        old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            corpus = docs.filter(F.col("doc_id") % 2 != 0)
            batch = docs.filter(F.col("doc_id") % 2 == 0)
            index = build_minhash_index(corpus, "doc_id", "text", 16, hashed_tokens=True)
            probe = build_minhash_index(batch, "doc_id", "text", 16, hashed_tokens=True)
            index = timed("index materialize", lambda: index.localCheckpoint(eager=True))
            probe = timed("probe materialize", lambda: probe.localCheckpoint(eager=True))

            from hive_udf_spark.operators.dedup import _band_key

            band_idx = F.explode(F.sequence(F.lit(0), F.lit(7))).alias("__band")

            def banded(side, role):
                s = side.select(F.col("doc_id").alias(f"{role}_id"), band_idx, F.col("sig").alias("__s"))
                return s.select(
                    f"{role}_id", "__band",
                    _band_key(F.col("__s"), F.col("__band"), 2, True).alias("__bkey"),
                )

            cands = (
                banded(probe, "batch")
                .join(banded(index, "corpus"), ["__band", "__bkey"])
                .select("batch_id", "corpus_id")
                .distinct()
            )
            cands = timed("candidates (band join + distinct)", lambda: cands.localCheckpoint(eager=True))
            print(f"  candidate pairs: {cands.count()}")
            bt = probe.select(
                F.col("doc_id").alias("batch_id"), F.col("tokens").alias("__ta"), F.size("tokens").alias("__na")
            )
            ct = index.select(
                F.col("doc_id").alias("corpus_id"), F.col("tokens").alias("__tb"), F.size("tokens").alias("__nb")
            )

            def verify():
                inter = F.size(F.array_intersect(F.col("__ta"), F.col("__tb")))
                union = F.col("__na") + F.col("__nb") - inter
                _force(
                    cands.join(bt, "batch_id").join(ct, "corpus_id")
                    .select("batch_id", "corpus_id", inter.alias("i"), union.alias("u"))
                    .filter(F.col("i") * F.lit(1_000_000) >= F.lit(500_000) * F.col("u"))
                )

            timed("verify (2 joins + intersect)", verify)
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)

    spark.stop()


if __name__ == "__main__":
    main()
