"""Learned BPE tokenizer (functions/bpe.py) vs a pure-Python reference."""

from __future__ import annotations

import collections

import pytest
from pyspark.sql import functions as F

from hive_udf_spark.functions.bpe import (
    apply_merge_expr,
    apply_merges_expr,
    bpe_doc_token_counts,
    bpe_train,
    word_vocab,
)

CORPUS = [
    (1, "low low low low low"),
    (2, "lower lower newest newest"),
    (3, "newest newest newest newest widest widest"),
]


def ref_bpe(words: list[str], k: int):
    """The classic Sennrich et al. trainer: overlapping pair counts,
    greedy left-to-right merge, (count desc, pair asc) tie-break."""
    vocab = {w: list(w) for w in set(words)}
    cnt = collections.Counter(words)
    merges = []
    for _ in range(k):
        pairs: collections.Counter = collections.Counter()
        for w, syms in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += cnt[w]
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        a, b = best
        for w, syms in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            vocab[w] = out
    return merges, vocab


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(CORPUS, ["doc_id", "text"])


# r14: cap=0 forces the distributed loop, the default cap takes the
# driver-side solve on these small fixtures — both must match the
# references bit-for-bit
BOTH_PATHS = pytest.mark.parametrize("cap", [0, 2_000_000], ids=["dist", "driver"])


@BOTH_PATHS
def test_train_matches_python_reference(docs, cap):
    merges, vocab = bpe_train(docs, num_merges=6, driver_solve_max_symbols=cap)
    words = [w for _, t in CORPUS for w in t.split()]
    ref_merges, ref_vocab = ref_bpe(words, 6)
    assert [tuple(m) for m in merges] == ref_merges
    assert {r.word: r.syms for r in vocab.collect()} == ref_vocab


def test_greedy_nonoverlapping_merge(spark):
    """'aaaa' + (a,a) -> ['aa','aa']; 'aaa' -> ['aa','a'] (left-to-right)."""
    df = spark.createDataFrame([("aaaa",), ("aaa",), ("ba",)], ["w"])
    out = {
        r.w: r.m
        for r in df.select(
            "w", apply_merge_expr(F.split("w", ""), "a", "a").alias("m")
        ).collect()
    }
    assert out["aaaa"] == ["aa", "aa"]
    assert out["aaa"] == ["aa", "a"]
    assert out["ba"] == ["b", "a"]


def test_merge_chain_matches_vocab(docs):
    """Applying the learned merge sequence to raw characters reproduces
    the trained vocab's segmentation (the unseen-word inference path)."""
    merges, vocab = bpe_train(docs, num_merges=6)
    replayed = word_vocab(docs).select(
        "word", apply_merges_expr(F.split("word", ""), merges).alias("syms")
    )
    assert {r.word: r.syms for r in replayed.collect()} == {
        r.word: r.syms for r in vocab.collect()
    }


@BOTH_PATHS
def test_early_stop_when_no_pairs(spark, cap):
    df = spark.createDataFrame([(1, "a b c")], ["doc_id", "text"])
    merges, vocab = bpe_train(df, num_merges=10, driver_solve_max_symbols=cap)
    assert merges == []  # all words single-char: nothing to merge
    assert all(len(r.syms) == 1 for r in vocab.collect())


def test_doc_token_counts(docs):
    _, vocab = bpe_train(docs, num_merges=6)
    seg = {r.word: len(r.syms) for r in vocab.collect()}
    got = {r.doc_id: r.n_subtokens for r in bpe_doc_token_counts(docs, vocab).collect()}
    want = {
        d: sum(seg[w] for w in t.split()) for d, t in CORPUS
    }
    assert got == want


def test_no_python_in_plans(docs):
    # cap=0: this pins the DISTRIBUTED trainer's plans Python-free
    _, vocab = bpe_train(docs, num_merges=3, driver_solve_max_symbols=0)
    for df in (vocab, bpe_doc_token_counts(docs, vocab)):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_sf_corpus_deterministic(spark, sf_dir):
    """Two trainings over the parquet corpus give identical merges
    (deterministic tie-break) — and every corpus word stays covered."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    m1, v1 = bpe_train(docs, "text", num_merges=4)
    m2, _ = bpe_train(docs, "text", num_merges=4)
    assert m1 == m2 and len(m1) == 4
    counted = bpe_doc_token_counts(docs, v1)
    n_docs = docs.filter(F.size(F.split(F.trim("text"), r"\s+")) > 0).count()
    assert counted.count() == n_docs


def ref_bpe_batched(words: list[str], k: int, batch: int):
    """Pure-Python mirror of the batched trainer (r5 verdict item 3):
    per round, rank pairs (count desc, pair asc), greedily select up to
    ``batch`` pairs with mutually disjoint symbol sets ({a, b, a+b}),
    apply them sequentially in selection order."""
    vocab = {w: list(w) for w in set(words)}
    cnt = collections.Counter(words)

    def apply(a, b):
        for w, syms in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            vocab[w] = out

    merges = []
    while len(merges) < k:
        j = min(batch, k - len(merges))
        pairs: collections.Counter = collections.Counter()
        for w, syms in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += cnt[w]
        if not pairs:
            break
        cand_n = 1 if j == 1 else max(64, 4 * j)
        cand = sorted(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[:cand_n]
        used, sel = set(), []
        for (a, b), _ in cand:
            if len(sel) == j:
                break
            toks = {a, b, a + b}
            if used & toks:
                continue
            sel.append((a, b))
            used |= toks
        merges.extend(sel)
        for a, b in sel:
            apply(a, b)
    return merges, vocab


@BOTH_PATHS
def test_batched_train_matches_python_mirror(docs, cap):
    """Spark batched trainer == pure-Python mirror of the same batched
    rule, merges AND final segmentation, at several batch widths."""
    words = []
    for _, text in CORPUS:
        words.extend(text.split())
    for batch in (2, 4, 16):
        merges, vocab = bpe_train(
            docs, num_merges=10, batch=batch, driver_solve_max_symbols=cap
        )
        ref_m, ref_v = ref_bpe_batched(words, 10, batch)
        assert merges == ref_m, batch
        got = {r.word: list(r.syms) for r in vocab.collect()}
        assert got == ref_v, batch


@BOTH_PATHS
def test_batch_one_is_exact_sequential(docs, cap):
    """batch=1 is bit-identical to the classic sequential trainer."""
    words = []
    for _, text in CORPUS:
        words.extend(text.split())
    merges, _ = bpe_train(docs, num_merges=6, batch=1, driver_solve_max_symbols=cap)
    assert merges == ref_bpe(words, 6)[0]
    with pytest.raises(ValueError, match="batch"):
        bpe_train(docs, num_merges=2, batch=0)


@BOTH_PATHS
def test_batched_random_corpora(spark, cap):
    """Random small corpora: Spark batched == Python mirror (merge list
    and segmentation) — catches ordering/disjointness drift."""
    import random

    for seed in (3, 11):
        rng = random.Random(seed)
        alphabet = "abcd"
        words = [
            "".join(rng.choice(alphabet) for _ in range(rng.randrange(2, 7)))
            for _ in range(40)
        ]
        df = spark.createDataFrame(
            [(i, " ".join(words[i::4])) for i in range(4)], ["doc_id", "text"]
        )
        corpus_words = [w for i in range(4) for w in words[i::4]]
        merges, vocab = bpe_train(
            df, num_merges=8, batch=4, driver_solve_max_symbols=cap
        )
        ref_m, ref_v = ref_bpe_batched(corpus_words, 8, 4)
        assert merges == ref_m, seed
        got = {r.word: list(r.syms) for r in vocab.collect()}
        assert got == ref_v, seed


def test_driver_solve_matches_distributed_on_corpus(spark, sf_dir):
    """r14: the driver-side solve (default cap) and the distributed loop
    (cap=0) must be bit-equal on the REAL parquet corpus — the declared
    oracle query text_bpe_train_segment trains exactly this way."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    m_drv, v_drv = bpe_train(docs, "text", num_merges=8)
    m_dst, v_dst = bpe_train(docs, "text", num_merges=8, driver_solve_max_symbols=0)
    assert m_drv == m_dst
    got_drv = {r.word: (r.cnt, list(r.syms)) for r in v_drv.collect()}
    got_dst = {r.word: (r.cnt, list(r.syms)) for r in v_dst.collect()}
    assert got_drv == got_dst


def test_regex_merge_matches_fold_twins(spark):
    """r14: the trainer applies each round's merges with one native
    regexp_replace pass (apply_merges_regex_expr); it must stay
    bit-equal to the classic and fused fold twins on adversarial symbol
    arrays — equal-symbol runs (greedy parity), back-to-back matches,
    regex metacharacters in symbols, empty arrays."""
    import random

    from pyspark.sql import functions as F

    from hive_udf_spark.functions.bpe import (
        apply_merge_batch_expr,
        apply_merge_expr,
        apply_merges_regex_expr,
    )

    rng = random.Random(7)
    # r15: non-ASCII letters included — the r14 char-escape backslashed
    # them, which Java reserves for named constructs (\Q..\E quoting
    # now); plus a literal "\\E" to exercise the quote-splitting.
    alpha = ["a", "b", "c", "ab", "aa", "x-", "$y", "c.d", "_z",
             "é", "ßü", "日本", "q\\E", "\\"]
    rows = [
        (i, [rng.choice(alpha) for _ in range(rng.randint(0, 12))])
        for i in range(500)
    ]
    df = spark.createDataFrame(rows, "id long, syms array<string>")
    cases = [
        [("a", "a")],
        [("a", "b")],
        [("a", "b"), ("c", "c")],
        [("aa", "b"), ("x-", "$y")],
        [("c.d", "_z"), ("b", "a")],
        [("é", "ßü")],
        [("é", "a"), ("日本", "ßü")],
        [("q\\E", "\\"), ("é", "é")],
    ]
    for sel in cases:
        fold = (
            apply_merge_expr(F.col("syms"), *sel[0])
            if len(sel) == 1
            else apply_merge_batch_expr(F.col("syms"), sel)
        )
        rex = apply_merges_regex_expr(F.col("syms"), sel)
        assert (
            df.select(fold.alias("f"), rex.alias("r"))
            .filter(F.col("f") != F.col("r"))
            .count()
            == 0
        ), sel


def test_nul_bearing_corpus_both_paths(spark):
    """r15 (ADVICE r14): tokenize() is whitespace-split, so a token CAN
    carry an embedded NUL. The regexp_replace merge packs symbols
    NUL-separated — bpe_train must detect this and route through the
    NUL-safe fold twin; driver solve (default cap) and distributed loop
    (cap=0) must stay bit-equal on such a corpus."""
    corpus = [
        (1, "ab\x00c ab\x00c ab\x00c abc abc"),
        (2, "ab ab ab\x00c b\x00cd b\x00cd"),
        (3, "xy xy xy \x00\x00 \x00a"),
    ]
    df = spark.createDataFrame(corpus, ["doc_id", "text"])
    m_drv, v_drv = bpe_train(df, num_merges=6, batch=2)
    m_dst, v_dst = bpe_train(df, num_merges=6, batch=2, driver_solve_max_symbols=0)
    assert m_drv == m_dst
    got_drv = {r.word: (r.cnt, list(r.syms)) for r in v_drv.collect()}
    got_dst = {r.word: (r.cnt, list(r.syms)) for r in v_dst.collect()}
    assert got_drv == got_dst
    # and both match the pure-Python reference
    words = [w for _, t in corpus for w in t.split()]
    ref_m, ref_v = ref_bpe_batched(words, 6, 2)
    assert m_drv == ref_m
    assert {w: s for w, (c, s) in got_drv.items()} == ref_v
