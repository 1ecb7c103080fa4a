"""DSIR importance-weighting tests (operators/importance.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hive_udf_spark.operators.importance import (
    dsir_logratio_table,
    dsir_weights,
    hashed_ngram_buckets,
)
from hive_udf_spark.sources import load_table


def test_hashed_ngram_buckets_shape(spark):
    df = spark.createDataFrame(
        [("a b a",), ("solo",), ("",)], "text string"
    ).select(hashed_ngram_buckets("text", buckets=64, n_max=2).alias("f"))
    rows = [r.f for r in df.collect()]
    # 3 unigrams (repeats kept) + 2 bigrams; 1 unigram + 0 bigrams; empty
    assert len(rows[0]) == 5
    assert len(rows[1]) == 1
    assert rows[2] == []
    assert all(0 <= b < 64 for r in rows for b in r)
    # repeats preserved: 'a' appears twice with the same bucket
    assert rows[0][0] == rows[0][2]


def test_hashed_ngram_buckets_validation(spark):
    df = spark.createDataFrame([("x",)], "text string")
    with pytest.raises(ValueError, match="n_max"):
        df.select(hashed_ngram_buckets("text", n_max=3))
    with pytest.raises(ValueError, match="buckets"):
        df.select(hashed_ngram_buckets("text", buckets=1))


def test_dsir_weights_separate_target_like_docs(spark):
    """Docs sharing the target corpus's vocabulary must outscore docs
    that share the background's; weights are integer micro-nats."""
    target_texts = [(i, "learn teach study school exam lesson") for i in range(10)]
    noise_texts = [(100 + i, "crank widget sprocket flange bolt rivet") for i in range(10)]
    docs = spark.createDataFrame(target_texts + noise_texts, "doc_id long, text string")
    target = spark.createDataFrame(
        [(i, t) for i, t in target_texts], "doc_id long, text string"
    )
    got = {r.doc_id: r for r in dsir_weights(docs, target, buckets=256).collect()}
    assert len(got) == 20
    for i in range(10):
        assert got[i].weight_micro > got[100 + i].weight_micro
        assert got[i].weight_micro > 0  # target-like => positive LLR
    # empty-text doc stays addressable with zero weight
    docs2 = docs.union(spark.createDataFrame([(999, "")], "doc_id long, text string"))
    got2 = {r.doc_id: r for r in dsir_weights(docs2, target, buckets=256).collect()}
    assert got2[999].n_features == 0 and got2[999].weight_micro == 0


def test_dsir_logratio_table_is_dense_and_bounded(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(50)
    tgt = docs.filter(F.col("lang") == "en")
    tbl = dsir_logratio_table(docs, tgt, buckets=512).collect()
    assert len(tbl) == 512  # dense axis: every bucket present
    assert {r["__b"] for r in tbl} == set(range(512))


def test_dsir_plan_shape(spark, sf_dir):
    """Scale shape: no Python stage; the model joins onto the feature
    stream as a broadcast; the per-doc weight sum partial-aggregates
    before its exchange."""
    docs = load_table(spark, sf_dir, "documents")
    tgt = docs.filter(F.col("lang") == "en")
    out = dsir_weights(docs, tgt, buckets=1024)
    plan = out._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "BroadcastHashJoin" in plan
    assert "partial_sum" in plan  # weight sum combines map-side


def test_lm_perplexity_matches_python_reference(spark):
    """Integer micro-nat scores equal a pure-Python mirror (same hashes,
    same quantized logs)."""
    import hashlib
    import math

    from hive_udf_spark.operators.importance import lm_perplexity_scores

    def py_portable_hash60(s, seed):
        return int(hashlib.md5(f"{seed}:{s}".encode()).hexdigest()[:15], 16)

    model = [(100 + i, "the cat sat on the mat") for i in range(3)]
    docs = [
        (1, "the cat sat on the mat"),
        (2, "mat the on sat cat the"),
        (3, "one"),
        (4, ""),
    ]
    B, seed = 64, 13
    ddf = spark.createDataFrame(docs, "doc_id long, text string")
    mdf = spark.createDataFrame(model, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_bigrams, r.logprob_micro)
        for r in lm_perplexity_scores(ddf, mdf, buckets=B, portable=True, seed=seed).collect()
    }

    def pairs(text):
        w = text.split()
        return [(w[i], w[i] + " " + w[i + 1]) for i in range(len(w) - 1)]

    gcnt, ccnt = {}, {}
    for _, t in model:
        for a, g in pairs(t):
            gcnt[py_portable_hash60(g, seed) % B] = gcnt.get(py_portable_hash60(g, seed) % B, 0) + 1
            ccnt[py_portable_hash60(a, seed) % B] = ccnt.get(py_portable_hash60(a, seed) % B, 0) + 1
    want = {}
    for did, t in docs:
        s, n = 0, 0
        for a, g in pairs(t):
            lg = round(math.log(gcnt.get(py_portable_hash60(g, seed) % B, 0) + 1.0) * 1e6)
            lc = round(math.log(ccnt.get(py_portable_hash60(a, seed) % B, 0) + float(B)) * 1e6)
            s += lg - lc
            n += 1
        want[did] = (n, s)
    assert got == want


def test_lm_perplexity_separation(spark, sf_dir):
    """In-distribution docs (the model's own slice) must average higher
    per-bigram log-prob than out-of-distribution docs."""
    from pyspark.sql import functions as F

    from hive_udf_spark.operators.importance import lm_perplexity_scores
    from hive_udf_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents")
    model = docs.filter(F.col("lang") == "en")
    out = lm_perplexity_scores(docs, model, buckets=2048)
    joined = out.join(docs.select("doc_id", "lang"), "doc_id").filter(
        F.col("n_bigrams") > 0
    )
    means = {
        r.lang: r.m
        for r in joined.groupBy("lang")
        .agg(F.avg(F.col("logprob_micro") / F.col("n_bigrams")).alias("m"))
        .collect()
    }
    assert means["en"] > means["zh"]


def test_source_kl_divergence_orders_drift(spark):
    """A group drawn from the corpus-typical distribution scores near
    zero; a group with its own private vocabulary scores higher."""
    from hive_udf_spark.operators.importance import source_kl_divergence

    common = "alpha beta gamma delta epsilon"
    rows = [("typical", common) for _ in range(20)] + [
        ("drifted", "zeta eta theta iota kappa") for _ in range(20)
    ] + [("typical2", common) for _ in range(20)]
    df = spark.createDataFrame(rows, "source string, text string")
    got = {r.source: r for r in source_kl_divergence(df, buckets=512).collect()}
    assert got["typical"].n_tokens == 100
    # typical groups match the mixture better than the minority vocab
    assert got["drifted"].kl_micro > got["typical"].kl_micro
    # quantization can dip a hair below zero, never materially
    assert all(r.kl_micro > -512 for r in got.values())


def test_top_pmi_bigrams_planted_collocation(spark):
    """A pair that only ever occurs together tops the PMI ranking; a
    pair below min_count never appears."""
    from hive_udf_spark.operators.importance import top_pmi_bigrams

    rows = [(f"w{i % 7} sticky pair w{(i + 3) % 7}",) for i in range(40)] + [
        ("rare once",)
    ]
    df = spark.createDataFrame(rows, "text string")
    got = top_pmi_bigrams(df, k=5, min_count=5).collect()
    assert got[0].bigram == "sticky pair" and got[0].rank == 1
    assert all(r.bigram != "rare once" for r in got)
    assert all(r.c_ab >= 5 for r in got)


def test_corpus_stats_plan_shapes(spark, sf_dir):
    """Scale shape for the r5 scoring/statistics ops: zero Python
    stages; model/summary tables broadcast onto the streams; the heavy
    aggregates partially combine map-side."""
    from hive_udf_spark.operators.importance import (
        lm_perplexity_scores,
        source_kl_divergence,
        top_pmi_bigrams,
    )

    docs = load_table(spark, sf_dir, "documents")

    def fmt(df):
        return df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )

    lm = fmt(lm_perplexity_scores(docs, docs.filter(F.col("lang") == "en")))
    assert "EvalPython" not in lm
    assert lm.count("BroadcastHashJoin") >= 2  # both dense log tables
    assert "partial_sum" in lm  # per-doc score combines map-side

    kl = fmt(source_kl_divergence(docs))
    assert "EvalPython" not in kl
    assert "partial_count" in kl  # (group, bucket) counts combine map-side

    pmi = fmt(top_pmi_bigrams(docs))
    assert "EvalPython" not in pmi
    assert "partial_count" in pmi
    assert "TakeOrderedAndProject" in pmi  # top-k never global-sorts


def test_nb_classify_matches_python_reference(spark):
    """NB scores and argmax equal a pure-Python mirror (same hashes,
    same quantized logs, same tie-break)."""
    import hashlib
    import math

    from hive_udf_spark.operators.importance import nb_classify

    def ph(s, seed):
        return int(hashlib.md5(f"{seed}:{s}".encode()).hexdigest()[:15], 16)

    labeled = [
        (1, "cat", "cats purr and meow loudly"),
        (2, "cat", "a cat naps on the mat"),
        (3, "dog", "dogs bark and fetch sticks"),
        (4, "dog", "a dog runs in the park"),
        (5, "dog", "the dog chews a bone"),
    ]
    docs = [
        (10, "the cat naps"),
        (11, "a dog runs and barks"),
        (12, ""),
        (13, "zebra zebra"),
    ]
    B, seed = 32, 19
    ldf = spark.createDataFrame(labeled, "doc_id long, label string, text string")
    ddf = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_tokens, r.pred_label, r.score_micro, r.margin_micro)
        for r in nb_classify(
            ddf, ldf, label_col="label", buckets=B, portable=True, seed=seed
        ).collect()
    }

    counts, ndocs = {}, {}
    for _, lab, t in labeled:
        ndocs[lab] = ndocs.get(lab, 0) + 1
        for w in t.split():
            counts[(lab, ph(w, seed) % B)] = counts.get((lab, ph(w, seed) % B), 0) + 1
    classes = sorted(ndocs)
    nc = {c: sum(v for (l, _), v in counts.items() if l == c) for c in classes}
    n_total = sum(ndocs.values())
    want = {}
    for did, t in docs:
        toks = t.split()
        scores = []
        for c in classes:
            s = round(math.log(ndocs[c] / n_total) * 1e6)
            for w in toks:
                b = ph(w, seed) % B
                s += round(math.log((counts.get((c, b), 0) + 1.0) / (nc[c] + float(B))) * 1e6)
            scores.append((s, c))
        # argmax: score desc, label asc
        ranked = sorted(scores, key=lambda x: (-x[0], x[1]))
        margin = ranked[0][0] - (ranked[1][0] if len(ranked) > 1 else ranked[0][0])
        want[did] = (len(toks), ranked[0][1], ranked[0][0], margin)
    assert got == want
    # sanity: the separable docs classify correctly with positive margin
    assert got[10][1] == "cat" and got[11][1] == "dog"
    assert got[10][3] > 0 and got[11][3] > 0
    # empty doc: prior-only argmax (dog has the larger prior)
    assert got[12] == want[12] and got[12][1] == "dog" and got[12][0] == 0


def test_nb_classify_single_class_margin_zero(spark):
    from hive_udf_spark.operators.importance import nb_classify

    ldf = spark.createDataFrame([(1, "x", "a b")], "doc_id long, label string, text string")
    ddf = spark.createDataFrame([(2, "a")], "doc_id long, text string")
    rows = nb_classify(ddf, ldf, label_col="label", buckets=16, portable=True).collect()
    assert len(rows) == 1 and rows[0].pred_label == "x" and rows[0].margin_micro == 0


def test_nb_classify_null_label_rows_excluded_from_fit(spark):
    """NULL-label training rows must not create a NULL class."""
    from hive_udf_spark.operators.importance import nb_classify

    ldf = spark.createDataFrame(
        [(1, "x", "a a"), (2, None, "b b b")],
        "doc_id long, label string, text string",
    )
    ddf = spark.createDataFrame([(3, "b")], "doc_id long, text string")
    rows = nb_classify(ddf, ldf, label_col="label", buckets=16, portable=True).collect()
    assert [r.pred_label for r in rows] == ["x"]


def test_nb_classify_plan_shape(spark, sf_dir):
    """Model tables broadcast; no row-at-a-time Python; the corpus-sized
    aggregations are partial (map-side combine before the exchange)."""
    from hive_udf_spark.operators.importance import nb_classify

    docs = load_table(spark, sf_dir, "documents")
    plan = nb_classify(docs, docs, label_col="lang")._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_nb_classify_random_corpora_match_reference(spark):
    """Randomized labeled corpora (skewed class sizes, shared vocab,
    empty docs, unlabeled rows): predictions, scores, and margins equal
    the Python mirror on every seed."""
    import hashlib
    import math
    import random

    from hive_udf_spark.operators.importance import nb_classify

    def ph(s, seed):
        return int(hashlib.md5(f"{seed}:{s}".encode()).hexdigest()[:15], 16)

    B, hseed = 32, 19
    for seed in (0, 1, 2):
        rng = random.Random(seed)
        vocab = [f"t{j}" for j in range(15)]
        labels = ["a", "b", "c"]
        rows = []
        for i in range(40):
            lab = rng.choice(labels) if rng.random() > 0.1 else None
            n = rng.choice([0, 1, 4, 12])
            rows.append((i, lab, " ".join(rng.choice(vocab) for _ in range(n))))
        ldf = spark.createDataFrame(rows, "doc_id long, label string, text string")
        got = {
            r.doc_id: (r.n_tokens, r.pred_label, r.score_micro, r.margin_micro)
            for r in nb_classify(
                ldf, ldf, label_col="label", buckets=B, portable=True, seed=hseed
            ).collect()
        }
        # python mirror
        counts, ndocs = {}, {}
        for _, lab, t in rows:
            if lab is None:
                continue
            ndocs[lab] = ndocs.get(lab, 0) + 1
            for w in t.split():
                key = (lab, ph(w, hseed) % B)
                counts[key] = counts.get(key, 0) + 1
        classes = sorted(ndocs)
        nc = {c: sum(v for (l, _), v in counts.items() if l == c) for c in classes}
        n_total = sum(ndocs.values())
        for did, _, t in rows:
            toks = t.split()
            scores = []
            for c in classes:
                s = round(math.log(ndocs[c] / n_total) * 1e6)
                for w in toks:
                    b = ph(w, hseed) % B
                    s += round(
                        math.log((counts.get((c, b), 0) + 1.0) / (nc[c] + float(B)))
                        * 1e6
                    )
                scores.append((s, c))
            ranked = sorted(scores, key=lambda x: (-x[0], x[1]))
            margin = ranked[0][0] - (ranked[1][0] if len(ranked) > 1 else ranked[0][0])
            assert got[did] == (len(toks), ranked[0][1], ranked[0][0], margin), (
                seed,
                did,
            )
