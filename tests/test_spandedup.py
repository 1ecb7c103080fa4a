"""Token-level duplicated-span dedup (operators/spandedup.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hive_udf_spark.operators.spandedup import (
    duplicate_spans,
    ngram_postings,
    strip_duplicate_spans,
)

CORPUS = [
    (1, "the quick brown fox jumps over the lazy dog end one"),
    (2, "prefix two the quick brown fox jumps over the lazy dog suffix two"),
    (3, "totally unique content in this document nothing shared here at all"),
    (4, "rep rep rep rep rep rep rep rep rep rep rep rep"),
    (5, "short doc"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(CORPUS, ["doc_id", "text"])


def _spans(df, **kw):
    out = duplicate_spans(df, n=5, min_count=2, **kw)
    return {
        (r.doc_id, r.span_start, r.span_end): r.span_text
        for r in out.collect()
    }


def test_cross_doc_span_found_and_merged(docs):
    spans = _spans(docs)
    # The 9-token shared passage: five overlapping duplicated 5-grams
    # merged into ONE maximal span per doc.
    assert spans[(1, 0, 9)] == "the quick brown fox jumps over the lazy dog"
    assert spans[(2, 2, 11)] == "the quick brown fox jumps over the lazy dog"
    # Unique and too-short docs produce no spans.
    assert not any(d in (3, 5) for d, _, _ in spans)


def test_within_doc_repetition_marked(docs):
    spans = _spans(docs)
    assert (4, 0, 12) in spans  # whole doc is self-repeating


def test_keep_first_preserves_canonical_copy(docs):
    spans = _spans(docs, keep_first=True)
    # doc 1 holds the corpus-first occurrence -> untouched.
    assert not any(d == 1 for d, _, _ in spans)
    assert (2, 2, 11) in spans
    # doc 4: position 0 is the first occurrence of its 5-gram; the
    # remaining positions stay duplicated.
    assert (4, 1, 12) in spans


def test_mark_modes_equivalent(docs):
    a = _spans(docs, mark_mode="join")
    b = _spans(docs, mark_mode="window")
    assert a == b
    a = _spans(docs, mark_mode="join", keep_first=True)
    b = _spans(docs, mark_mode="window", keep_first=True)
    assert a == b


def test_strip_rebuilds_interspan_text(docs):
    out = {
        r.doc_id: (r.clean_text, r.total_tokens, r.dup_tokens)
        for r in strip_duplicate_spans(docs, n=5, min_count=2).collect()
    }
    assert out[1] == ("end one", 11, 9)
    assert out[2] == ("prefix two suffix two", 13, 9)
    assert out[3][2] == 0 and out[3][0] == CORPUS[2][1]  # untouched
    assert out[4] == ("", 12, 12)  # fully duplicated doc -> empty
    assert out[5] == ("short doc", 2, 0)


def test_strip_keep_first_leaves_one_copy(docs):
    out = {r.doc_id: r.clean_text for r in
           strip_duplicate_spans(docs, n=5, min_count=2, keep_first=True).collect()}
    assert out[1] == CORPUS[0][1]  # canonical copy intact
    assert out[2] == "prefix two suffix two"


def test_spans_disjoint_and_in_bounds(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    rows = (
        duplicate_spans(docs, n=5, min_count=2, with_text=False)
        .orderBy("doc_id", "span_start")
        .collect()
    )
    assert rows  # sf0.001 documents share vocabulary heavily
    lens = {r.doc_id: r.n for r in
            docs.select("doc_id", F.size(F.split(F.col("text"), r"\s+")).alias("n")).collect()}
    prev = {}
    for r in rows:
        assert 0 <= r.span_start < r.span_end <= lens[r.doc_id]
        assert r.span_tokens == r.span_end - r.span_start >= 5
        if r.doc_id in prev:
            # maximal spans never touch: a gap of >=1 token separates them
            assert r.span_start > prev[r.doc_id]
        prev[r.doc_id] = r.span_end


def test_every_span_text_repeats_in_corpus(spark, sf_dir):
    """Soundness: each emitted span contains a 5-gram occurring >= 2 times."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    postings = ngram_postings(docs, n=5)
    counts = postings.groupBy("__key").count()
    spans = duplicate_spans(docs, n=5, min_count=2, with_text=True)
    span_grams = spans.select(
        F.posexplode(
            F.transform(
                F.sequence(F.lit(1), F.size(F.split("span_text", " ")) - F.lit(4)),
                lambda i: F.array_join(F.slice(F.split(F.col("span_text"), " "), i, 5), " "),
            )
        ).alias("_", "gram")
    ).select(F.xxhash64(F.lit(0), F.col("gram")).alias("__key")).distinct()
    undup = span_grams.join(counts, "__key").filter(F.col("count") < 2)
    assert undup.count() == 0


def test_no_python_in_plans(docs):
    for df in (
        duplicate_spans(docs, n=5, min_count=2),
        strip_duplicate_spans(docs, n=5, min_count=2, keep_first=True),
    ):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_mark_join_partial_aggregates_before_exchange(docs):
    """The dup-key count must map-side combine: a partial_count aggregate
    appears below the exchange in the marked-positions subplan."""
    df = duplicate_spans(docs, n=5, min_count=2, mark_mode="join", with_text=False)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "partial_count" in plan


# ---------------------------------------------------------------------------
# property: random corpora vs a brute-force Python reference
# ---------------------------------------------------------------------------


def _ref_spans(corpus: dict[int, list[str]], n: int, min_count: int, keep_first: bool):
    """O(corpus²) reference: count every n-gram, mark positions, merge
    islands per doc."""
    from collections import Counter

    occ = Counter()
    postings = []
    for d in sorted(corpus):
        toks = corpus[d]
        for p in range(len(toks) - n + 1):
            g = tuple(toks[p : p + n])
            occ[g] += 1
            postings.append((d, p, g))
    firsts = {}
    for d, p, g in postings:  # postings are in (doc, pos) order already
        if g not in firsts:
            firsts[g] = (d, p)
    marked = {}
    for d, p, g in postings:
        if occ[g] >= min_count and not (keep_first and firsts[g] == (d, p)):
            marked.setdefault(d, []).append(p)
    spans = {}
    for d, ps in marked.items():
        out, s, e = [], None, None
        for p in sorted(ps):
            if s is None:
                s, e = p, p + n
            elif p > e:
                out.append((s, e))
                s, e = p, p + n
            else:
                e = p + n
        out.append((s, e))
        spans[d] = out
    return spans


def test_random_corpora_match_reference(spark):
    import random

    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=12, deadline=None)
    @given(st.integers(0, 10**6))
    def run(seed):
        rng = random.Random(seed)
        vocab = ["a", "b", "c", "d"]
        corpus = {
            d: [rng.choice(vocab) for _ in range(rng.randint(0, 14))]
            for d in range(6)
        }
        keep_first = bool(seed % 2)
        df = spark.createDataFrame(
            [(d, " ".join(t)) for d, t in corpus.items()], ["doc_id", "text"]
        )
        got = {}
        for r in duplicate_spans(
            df, n=3, min_count=2, keep_first=keep_first, with_text=False
        ).collect():
            got.setdefault(r.doc_id, []).append((r.span_start, r.span_end))
        for d in got:
            got[d].sort()
        want = _ref_spans(corpus, 3, 2, keep_first)
        assert got == want, (seed, got, want)

    run()


# ---------------------------------------------------------------------------
# incremental index + probe (r5)
# ---------------------------------------------------------------------------


def test_incremental_probe_equals_full_rebuild(spark, sf_dir):
    """Index(corpus) + probe(batch) finds exactly the batch's spans that
    a full-corpus duplicate_spans run would report for those docs."""
    from hive_udf_spark.operators.spandedup import (
        build_ngram_index,
        probe_duplicate_spans,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    corpus = docs.filter(F.col("doc_id") % 10 != 0)
    batch = docs.filter(F.col("doc_id") % 10 == 0)
    index = build_ngram_index(corpus, n=5)
    got = sorted(
        (r.doc_id, r.span_start, r.span_end)
        for r in probe_duplicate_spans(index, batch, n=5, min_count=2).collect()
    )
    full = duplicate_spans(docs, n=5, min_count=2, with_text=False)
    want = sorted(
        (r.doc_id, r.span_start, r.span_end)
        for r in full.filter(F.col("doc_id") % 10 == 0).collect()
    )
    # probe marks batch-vs-corpus AND batch-internal duplicates; a full
    # rebuild additionally counts corpus-internal-only n-grams, which
    # cannot change BATCH span marking (all counts >= probe totals come
    # from the same postings) — the sets must be identical
    assert got == want


def test_index_update_additive(spark):
    from hive_udf_spark.operators.spandedup import (
        build_ngram_index,
        update_ngram_index,
    )

    a = spark.createDataFrame([(1, "x y z w q")], ["doc_id", "text"])
    b = spark.createDataFrame([(2, "x y z w q")], ["doc_id", "text"])
    both = spark.createDataFrame(
        [(1, "x y z w q"), (2, "x y z w q")], ["doc_id", "text"]
    )
    merged = update_ngram_index(build_ngram_index(a), build_ngram_index(b))
    direct = build_ngram_index(both)
    assert sorted((r["__key"], r.cnt) for r in merged.collect()) == sorted(
        (r["__key"], r.cnt) for r in direct.collect()
    )
