"""Sparse retrieval (inverted-index TF-IDF / BM25) property tests."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from hive_udf_spark.operators.retrieval import (
    bm25_topk,
    build_tfidf_index,
    tfidf_topk,
)

_DOCS = [
    (1, "apple banana apple cherry"),
    (2, "banana cherry cherry durian durian durian"),
    (3, "apple apple apple apple"),
    (4, "elderberry fig grape elderberry"),
    (5, "apple banana cherry durian elderberry fig grape"),
    (6, "banana banana"),
    (7, ""),
]


def _reference(docs, queries, k, mode, k1=1200, b=750, max_df=None):
    """Pure-Python mirror of the documented integer scoring."""
    tf = {i: Counter(t.split()) for i, t in docs if t.split()}
    dl = {i: sum(c.values()) for i, c in tf.items()}
    n, tt = len(tf), sum(dl.values())
    df = Counter()
    for c in tf.values():
        for term in c:
            df[term] += 1
    if max_df is not None:
        df = {t: d for t, d in df.items() if d <= max_df}
    w = {t: (n * 1000) // d for t, d in df.items()}
    out = []
    for qid, qtext in queries:
        qc = Counter(qtext.split())
        scores = {}
        for did, c in tf.items():
            if did == qid:
                continue
            s = 0
            for term, qf in qc.items():
                if term not in w or term not in c:
                    continue
                if mode == "tfidf":
                    s += qf * c[term] * w[term]
                else:
                    dnorm = ((1000 - b) * tt + b * dl[did] * n) // tt
                    denom = 1000 * c[term] + (k1 * dnorm) // 1000
                    s += qf * ((w[term] * c[term] * (k1 + 1000)) // denom)
            if s > 0:
                scores[did] = s
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
        out += [(qid, did, s, r + 1) for r, (did, s) in enumerate(ranked)]
    return sorted(out)


def test_tfidf_matches_reference(spark):
    docs = spark.createDataFrame(_DOCS, "doc_id long, text string")
    index = build_tfidf_index(docs)
    queries = [(1, _DOCS[0][1]), (5, _DOCS[4][1])]
    qdf = spark.createDataFrame(queries, "doc_id long, text string")
    got = sorted(
        (r.query_id, r.doc_id, r.score, r.rank)
        for r in tfidf_topk(index, qdf, k=3).collect()
    )
    assert got == _reference(_DOCS, queries, 3, "tfidf")


def test_bm25_matches_reference(spark):
    docs = spark.createDataFrame(_DOCS, "doc_id long, text string")
    index = build_tfidf_index(docs)
    queries = [(1, _DOCS[0][1]), (2, _DOCS[1][1]), (5, _DOCS[4][1])]
    qdf = spark.createDataFrame(queries, "doc_id long, text string")
    got = sorted(
        (r.query_id, r.doc_id, r.score, r.rank)
        for r in bm25_topk(index, qdf, k=4).collect()
    )
    assert got == _reference(_DOCS, queries, 4, "bm25")


def test_bm25_saturates_vs_tfidf(spark):
    """BM25's tf saturation: doc 3 (apple x4) must not dominate a
    one-apple query the way it does under the linear tf dot product."""
    docs = spark.createDataFrame(_DOCS, "doc_id long, text string")
    index = build_tfidf_index(docs)
    qdf = spark.createDataFrame([(99, "apple")], "doc_id long, text string")
    tf_scores = {r.doc_id: r.score for r in tfidf_topk(index, qdf, k=10).collect()}
    bm_scores = {r.doc_id: r.score for r in bm25_topk(index, qdf, k=10).collect()}
    # linear: doc3 = 4x doc5's score; saturated: well under 4x
    assert tf_scores[3] == 4 * tf_scores[5]
    assert bm_scores[3] < 3 * bm_scores[5]


def test_max_df_drops_stopwords(spark):
    """A term in > max_df docs must vanish from the index and scoring."""
    docs = spark.createDataFrame(_DOCS, "doc_id long, text string")
    index = build_tfidf_index(docs, max_df=2)
    terms = {r.term for r in index.select("term").distinct().collect()}
    assert "apple" not in terms and "banana" not in terms  # df 4, 4
    assert "durian" in terms  # df 2
    queries = [(1, _DOCS[0][1])]
    qdf = spark.createDataFrame(queries, "doc_id long, text string")
    got = sorted(
        (r.query_id, r.doc_id, r.score, r.rank)
        for r in tfidf_topk(index, qdf, k=5).collect()
    )
    assert got == _reference(_DOCS, queries, 5, "tfidf", max_df=2)


def test_index_parquet_round_trip(spark, tmp_path):
    """The index is a persistable relation: write, reload, search — no
    corpus rescan, identical results."""
    docs = spark.createDataFrame(_DOCS, "doc_id long, text string")
    index = build_tfidf_index(docs)
    path = str(tmp_path / "inv_index")
    index.write.parquet(path)
    reloaded = spark.read.parquet(path)
    qdf = spark.createDataFrame([(5, _DOCS[4][1])], "doc_id long, text string")
    a = sorted(map(tuple, bm25_topk(index, qdf, k=5).collect()))
    b = sorted(map(tuple, bm25_topk(reloaded, qdf, k=5).collect()))
    assert a == b


def test_retrieval_plan_no_python_partial_agg(spark):
    """All-JVM: no Python eval nodes; the score aggregation partially
    combines before the exchange; top-k uses the native window group
    limit (rank filter pushed into the window)."""
    docs = spark.createDataFrame(_DOCS, "doc_id long, text string")
    index = build_tfidf_index(docs)
    qdf = spark.createDataFrame([(1, "apple banana")], "doc_id long, text string")
    plan = bm25_topk(index, qdf, k=3)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "partial_sum" in plan
    assert "WindowGroupLimit" in plan


def test_retrieval_validation(spark):
    import pytest as _pytest

    docs = spark.createDataFrame(_DOCS[:2], "doc_id long, text string")
    index = build_tfidf_index(docs)
    with _pytest.raises(ValueError):
        build_tfidf_index(docs, max_df=0)
    with _pytest.raises(ValueError):
        tfidf_topk(index, docs, k=0)
    with _pytest.raises(ValueError):
        bm25_topk(index, docs, b_milli=2000)


def test_incremental_postings_multi_batch_equals_direct(spark, tmp_path):
    """Batch-by-batch postings merges == one direct build; a retry of
    the committed batch changes nothing; a fresh-lineage id raises."""
    import pytest as _pytest

    from pyspark.sql import functions as F

    from hive_udf_spark.operators.retrieval import doc_postings
    from hive_udf_spark.streaming.retrieval_sink import merge_postings_table

    docs = spark.createDataFrame(_DOCS, "doc_id long, text string")
    table = str(tmp_path / "postings")
    for b in range(3):
        batch = docs.filter(F.col("doc_id") % 3 == b)
        merge_postings_table(spark, doc_postings(batch), table, batch_id=b)
    got = sorted(map(tuple, spark.read.parquet(table).drop("__last_batch").collect()))
    want = sorted(map(tuple, doc_postings(docs).collect()))
    assert got == want
    merge_postings_table(
        spark, doc_postings(docs.filter(F.col("doc_id") % 3 == 2)), table, batch_id=2
    )  # retry: skipped
    again = sorted(map(tuple, spark.read.parquet(table).drop("__last_batch").collect()))
    assert again == want
    with _pytest.raises(ValueError, match="lineage mismatch"):
        merge_postings_table(spark, doc_postings(docs), table, batch_id=0)


def test_bm25_tfidf_random_corpora_match_reference(spark):
    """Randomized corpora (shared vocab, skewed lengths, empty docs):
    both scoring modes equal the Python mirror on every seed."""
    import random

    for seed in (0, 1, 2):
        rng = random.Random(seed)
        vocab = [f"t{j}" for j in range(20)]
        docs = []
        for i in range(30):
            n = rng.choice([0, 1, 3, 8, 25, 60])
            docs.append((i, " ".join(rng.choice(vocab) for _ in range(n))))
        ddf = spark.createDataFrame(docs, "doc_id long, text string")
        index = build_tfidf_index(ddf)
        queries = [d for d in docs if d[0] % 7 == 0 and d[1]]
        qdf = spark.createDataFrame(queries, "doc_id long, text string")
        for mode, fn in (("tfidf", tfidf_topk), ("bm25", bm25_topk)):
            got = sorted(
                (r.query_id, r.doc_id, r.score, r.rank)
                for r in fn(index, qdf, k=4).collect()
            )
            assert got == _reference(docs, queries, 4, mode), (seed, mode)


def test_rrf_fuse_semantics(spark):
    """Fusion math, n_sources, deterministic tie-break, validation."""
    import pytest as _pytest

    from hive_udf_spark.operators.retrieval import rrf_fuse

    lex = spark.createDataFrame(
        [(1, 10, 1), (1, 11, 2), (2, 20, 1)], "query_id long, doc_id long, rank int"
    )
    vec = spark.createDataFrame(
        [(1, 11, 1), (1, 12, 2), (2, 21, 1)], "query_id long, doc_id long, rank int"
    )
    got = {
        (r.query_id, r.doc_id): (r.rrf_micro, r.n_sources, r.rank)
        for r in rrf_fuse([lex, vec], k=10, rrf_k=60).collect()
    }
    c1, c2 = round(1e6 / 61), round(1e6 / 62)
    # doc 11 appears in both lists (ranks 2 and 1) -> fused to the top
    assert got[(1, 11)] == (c2 + c1, 2, 1)
    assert got[(1, 10)] == (c1, 1, 2)
    assert got[(1, 12)] == (c2, 1, 3)
    # query 2: equal single-source scores -> doc_id tie-break
    assert got[(2, 20)][2] == 1 and got[(2, 21)][2] == 2
    with _pytest.raises(ValueError, match="non-empty"):
        rrf_fuse([])
    with _pytest.raises(ValueError, match="rrf_k"):
        rrf_fuse([lex], k=1, rrf_k=0)


def test_hybrid_rrf_random_match_reference(spark):
    """Randomized corpora + vectors: the hybrid ranking equals a Python
    mirror fusing brute-force BM25 and dot ranks on every seed."""
    import random

    from hive_udf_spark.operators.retrieval import hybrid_rrf_topk

    for seed in (0, 1):
        rng = random.Random(seed)
        vocab = [f"t{j}" for j in range(12)]
        docs, vecs = [], []
        for i in range(25):
            docs.append(
                (i, " ".join(rng.choice(vocab) for _ in range(rng.choice([2, 6, 15]))))
            )
            vecs.append((i, [round(rng.uniform(-1, 1), 3) for _ in range(8)]))
        ddf = spark.createDataFrame(docs, "doc_id long, text string")
        vdf = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
        queries = ddf.filter("doc_id % 5 = 0")
        qvecs = vdf.filter("vec_id % 5 = 0")
        index = build_tfidf_index(ddf)
        got = sorted(
            (r.query_id, r.doc_id, r.rrf_micro, r.n_sources, r.rank)
            for r in hybrid_rrf_topk(
                index, queries, vdf, qvecs, k=5, lex_k=4, vec_k=4
            ).collect()
        )
        # python mirror
        lex_ref = _reference(docs, [d for d in docs if d[0] % 5 == 0], 4, "bm25")
        qvq = {i: [round(x * 1000) for x in v] for i, v in vecs}
        vec_ranks = []
        for qid in [i for i, _ in vecs if i % 5 == 0]:
            scored = sorted(
                (
                    (-sum(a * b for a, b in zip(qvq[qid], qvq[j])), j)
                    for j, _ in vecs
                    if j != qid
                ),
            )[:4]
            vec_ranks += [(qid, j, r + 1) for r, (_, j) in enumerate(scored)]
        contribs: dict = {}
        for qid, did, r, *_ in [(q, d, r) for (q, d, _, r) in lex_ref]:
            key = (qid, did)
            contribs[key] = (
                contribs.get(key, (0, 0))[0] + round(1e6 / (60 + r)),
                contribs.get(key, (0, 0))[1] + 1,
            )
        for qid, did, r in vec_ranks:
            key = (qid, did)
            contribs[key] = (
                contribs.get(key, (0, 0))[0] + round(1e6 / (60 + r)),
                contribs.get(key, (0, 0))[1] + 1,
            )
        want = []
        byq: dict = {}
        for (qid, did), (s, n) in contribs.items():
            byq.setdefault(qid, []).append((-s, did, n))
        for qid, lst in byq.items():
            for rank, (negs, did, n) in enumerate(sorted(lst)[:5], start=1):
                want.append((qid, did, -negs, n, rank))
        assert got == sorted(want), seed
