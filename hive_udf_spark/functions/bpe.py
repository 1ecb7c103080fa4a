"""Byte-pair-encoding tokenizer training and corpus encoding.

Real learned BPE (Sennrich et al. 2016) over the corpus, Spark-first:

* **Vocabulary reduction**: the corpus first collapses to distinct
  (word, count) rows — the classic BPE-trainer trick. All iteration
  work happens on the vocab table (orders of magnitude smaller than
  the corpus; bounded by distinct-word count, not corpus size).
* **Training iteration** (× num_merges): adjacent symbol pairs are
  counted corpus-weighted with one partial-aggregated groupBy; the
  argmax pair (count desc, then lexicographic — deterministic) is a
  single collected row per iteration (bounded driver state: k rows
  total); the merge applies to every vocab word with one greedy
  left-to-right ``aggregate`` fold — pure JVM, no Python.
  ``localCheckpoint`` truncates lineage each iteration so iteration i
  does not recompute merges 1..i−1.
* **Encoding**: corpus words broadcast-join the trained vocab's
  segmentation — per-document sub-token counts without re-running any
  merge at corpus scale. Unseen words (inference time) fall back to
  ``apply_merges_expr``, the same fold chain as training.

Pair counting matches the reference BPE exactly: overlapping adjacent
pairs all count ("aaa" contributes (a,a) twice); merge application is
greedy left-to-right non-overlapping ("aaaa" + (a,a) → "aa","aa").
No end-of-word marker is appended (documented choice; add one by
mapping words to word+suffix before training if needed).

The reference engine has no tokenizer surface (its repo is the
cardinality UDAF); this belongs to the mandated text-analysis extension
set (SURVEY.md §2.3) next to the regex BPE-ish counter in
functions/text.py — that one approximates, this one learns.

Scale: the corpus is touched exactly twice (vocab build, encode join);
everything between runs on the vocab relation. Per-iteration shuffle is
partial-aggregated (pair, count) rows; driver state is one row per
iteration.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from hive_udf_spark.functions.text import tokenize

__all__ = [
    "word_vocab",
    "bpe_train",
    "apply_merge_expr",
    "apply_merges_expr",
    "apply_merge_batch_expr",
    "bpe_doc_token_counts",
]


def word_vocab(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, cnt, syms) per distinct corpus word; syms starts as the
    word's character array."""
    words = df.select(F.explode(tokenize(text_col)).alias("word"))
    return (
        words.groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select("word", "cnt", F.split("word", "").alias("syms"))
    )


def _pair_counts(vocab: DataFrame) -> DataFrame:
    """Corpus-weighted adjacent-pair counts over the vocab's symbol
    arrays — overlapping occurrences all count, mirroring the reference
    BPE's get_stats."""
    n = F.size("syms")
    pairs = F.when(
        n >= 2,
        F.zip_with(
            F.slice("syms", 1, n - 1),
            F.slice("syms", 2, n - 1),
            lambda a, b: F.struct(a.alias("a"), b.alias("b")),
        ),
    ).otherwise(F.array().cast("array<struct<a:string,b:string>>"))
    return (
        vocab.select("cnt", F.explode(pairs).alias("p"))
        .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .agg(F.sum("cnt").alias("c"))
    )


def apply_merge_expr(syms: Column, a: str, b: str) -> Column:
    """Greedy left-to-right non-overlapping application of merge (a, b)
    to a symbol array — one ``aggregate`` fold, O(len), JVM-only."""
    la, lb = F.lit(a), F.lit(b)
    zero = F.struct(
        F.array().cast("array<string>").alias("acc"),
        F.lit(None).cast("string").alias("carry"),
    )
    return F.aggregate(
        syms,
        zero,
        lambda st, s: F.when(
            st["carry"].isNotNull() & (st["carry"] == la) & (s == lb),
            F.struct(
                F.concat(st["acc"], F.array(F.concat(la, lb))).alias("acc"),
                F.lit(None).cast("string").alias("carry"),
            ),
        ).otherwise(
            F.struct(
                F.when(
                    st["carry"].isNotNull(), F.concat(st["acc"], F.array(st["carry"]))
                )
                .otherwise(st["acc"])
                .alias("acc"),
                s.alias("carry"),
            )
        ),
        lambda st: F.when(
            st["carry"].isNotNull(), F.concat(st["acc"], F.array(st["carry"]))
        ).otherwise(st["acc"]),
    )


def apply_merges_expr(syms: Column, merges: list[tuple[str, str]]) -> Column:
    """Chain of merge folds in training order (inference path for words
    outside the trained vocab)."""
    for a, b in merges:
        syms = apply_merge_expr(syms, a, b)
    return syms


# key separator for the fused batch fold: symbols come from tokenize()
# (word characters) and their concatenations, so NUL can never occur in
# a symbol and (carry NUL s) uniquely identifies the adjacent pair
_SEP = "\x00"


def _regex_escape(s: str) -> str:
    """Quote a symbol as a Java regex literal with ``\\Q...\\E`` —
    exactly ``java.util.regex.Pattern.quote``. The r14 char-escape
    (backslash before every non-``[A-Za-z0-9_]`` char) was undefined for
    non-ASCII letters: Java reserves backslash-before-alphabetic for
    named constructs, so a merge pair like ``(é, s)`` could throw
    ``PatternSyntaxException`` on the distributed path. Literal quoting
    has no such reserved space; an embedded ``\\E`` is split-and-rejoined
    the way Pattern.quote does."""
    return "\\Q" + s.replace("\\E", "\\E\\\\E\\Q") + "\\E"


def apply_merges_regex_expr(syms: Column, pairs: list[tuple[str, str]]) -> Column:
    """The fused batch merge as ONE native ``regexp_replace`` pass.

    The symbol array is packed as ``\\x00 sym \\x00 sym ... \\x00`` (NUL
    never occurs in a symbol) and every selected pair becomes one
    alternation branch ``(?<=\\x00)(a)\\x00(b)(?=\\x00)`` with the
    replacement the concatenation of every capture group (Java renders
    unmatched groups as empty). This is exactly the greedy
    left-to-right non-overlapping semantics of the fold twin
    ``apply_merge_batch_expr``:

    * Java's regex scan is sequential leftmost-first, and a match
      consumes ``a\\x00b`` but neither boundary separator (lookarounds),
      so back-to-back occurrences (``a b a b``) and equal-symbol runs
      (``a a a`` → ``aa, a``) merge exactly as the greedy fold does;
    * replacement text is never rescanned within the pass
      (``appendReplacement`` continues from the match end), matching
      the fold's carry discipline — a merged token cannot feed another
      merge in the same round, which symbol-disjointness of the
      selected pairs already guarantees for cross-pair interactions.

    Property-tested bit-equal against the fold twin (and the fold twin
    against the pure-Python reference). One compiled-regex scan per row
    replaces the interpreted per-element fold — measured ~4x cheaper
    per training round on the bench corpus (r14).
    """
    if not pairs:
        return syms
    branches = "|".join(
        f"({_regex_escape(a)}){_SEP}({_regex_escape(b)})" for a, b in pairs
    )
    pattern = f"(?<={_SEP})(?:{branches})(?={_SEP})"
    repl = "".join(f"${i}" for i in range(1, 2 * len(pairs) + 1))
    packed = F.concat(F.lit(_SEP), F.array_join(syms, _SEP), F.lit(_SEP))
    replaced = F.regexp_replace(packed, pattern, repl)
    return F.filter(F.split(replaced, _SEP), lambda t: t != F.lit(""))


def apply_merge_batch_expr(syms: Column, pairs: list[tuple[str, str]]) -> Column:
    """Apply a SYMBOL-DISJOINT set of merges in one left-to-right fold.

    Precondition (enforced by bpe_train's greedy selection): no pair's
    ``a``/``b``/merged token appears in another selected pair. Under
    that, sequential greedy application of the pairs is equivalent to a
    single simultaneous pass — at any position at most one pair can
    match (each symbol belongs to one pair), and no pair's output can
    create or destroy another's match sites (outputs are disjoint from
    all other pairs' symbols). One O(len) fold with an O(|pairs|) map
    lookup per step replaces |pairs| nested folds — the fused path that
    makes batched training's per-round cost independent of batch width.
    """
    if not pairs:
        return syms
    # The lookup key is LENGTH-PREFIXED ("len(a):a<NUL>b") so the
    # (carry, symbol) → key mapping is bijective even when symbols
    # contain NUL — a bare a<NUL>b key would alias ("x", "\0y") with
    # ("x\0", "y"). Identical output for NUL-free symbols.
    entries: list[Column] = []
    for a, b in pairs:
        entries.extend([F.lit(f"{len(a)}:{a}{_SEP}{b}"), F.lit(a + b)])
    m = F.create_map(*entries)

    def _key(carry: Column, s: Column) -> Column:
        return F.concat(
            F.length(carry).cast("string"), F.lit(":"), carry, F.lit(_SEP), s
        )

    zero = F.struct(
        F.array().cast("array<string>").alias("acc"),
        F.lit(None).cast("string").alias("carry"),
    )
    return F.aggregate(
        syms,
        zero,
        lambda st, s: F.when(
            st["carry"].isNotNull()
            & F.element_at(m, _key(st["carry"], s)).isNotNull(),
            F.struct(
                F.concat(
                    st["acc"],
                    F.array(F.element_at(m, _key(st["carry"], s))),
                ).alias("acc"),
                F.lit(None).cast("string").alias("carry"),
            ),
        ).otherwise(
            F.struct(
                F.when(
                    st["carry"].isNotNull(), F.concat(st["acc"], F.array(st["carry"]))
                )
                .otherwise(st["acc"])
                .alias("acc"),
                s.alias("carry"),
            )
        ),
        lambda st: F.when(
            st["carry"].isNotNull(), F.concat(st["acc"], F.array(st["carry"]))
        ).otherwise(st["acc"]),
    )


def _driver_train(
    rows: list[tuple[str, int]], num_merges: int, batch: int
) -> tuple[list[tuple[str, str]], dict[str, list[str]]]:
    """The training loop solved driver-side over a collected (word, cnt)
    vocab — the classic fast-BPE incremental trainer: a pair→count dict
    plus a pair→words inverted index, so each merge touches only the
    words that contain it instead of re-counting the whole vocab.

    Bit-equal to the distributed loop by construction: candidate
    ordering is the same (count desc, a asc, b asc — ``heapq.nsmallest``
    on the negated key is exactly the distributed ``orderBy .. limit``),
    the candidate prefix bound and greedy symbol-disjoint selection are
    the same code shape, and the merge application is the same greedy
    left-to-right non-overlapping scan (property-tested against the
    pure-Python references in tests/test_bpe.py, batch=1 and batched).

    The inverted index is stale-tolerant: entries are never removed when
    a pair disappears from a word (the apply pass detects no-match words
    by unchanged length and skips them), and a selected pair's whole
    entry set is consumed with ``pop`` — after its merge the pair cannot
    exist in any word. ``pair_cnt`` holds exact counts throughout (only
    nonzero entries), so stale index entries can never elect a pair.
    """
    import heapq

    vocab = {w: list(w) for w, _ in rows}
    cnt = dict(rows)
    pair_cnt: dict[tuple[str, str], int] = {}
    index: dict[tuple[str, str], set[str]] = {}
    pc_get = pair_cnt.get

    for w, syms in vocab.items():
        c = cnt[w]
        for p in zip(syms, syms[1:]):
            pair_cnt[p] = pc_get(p, 0) + c
            s = index.get(p)
            if s is None:
                index[p] = {w}
            else:
                s.add(w)

    merges: list[tuple[str, str]] = []
    while len(merges) < num_merges:
        j = min(batch, num_merges - len(merges))
        if not pair_cnt:
            break
        cand_n = 1 if j == 1 else max(64, 4 * j)
        if cand_n == 1:
            cand = [min(pair_cnt.items(), key=lambda kv: (-kv[1], kv[0]))]
        else:
            cand = heapq.nsmallest(
                cand_n, pair_cnt.items(), key=lambda kv: (-kv[1], kv[0])
            )
        used: set[str] = set()
        sel: list[tuple[str, str]] = []
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
            ab = a + b
            for w in index.pop((a, b), ()):
                syms = vocab[w]
                n = len(syms)
                last = n - 1
                # greedy left-to-right non-overlapping match scan — the
                # exact fold semantics of the original rebuild loop
                i = 0
                matches: list[int] = []
                while i < last:
                    if syms[i] == a and syms[i + 1] == b:
                        matches.append(i)
                        i += 2
                    else:
                        i += 1
                if not matches:  # stale index entry: pair gone
                    continue
                # splice the new symbol sequence from slices (C-speed
                # copies) instead of per-symbol appends
                first = matches[0]
                out: list[str] = syms[:first]
                prev = first
                for m in matches:
                    out += syms[prev:m]
                    out.append(ab)
                    prev = m + 2
                out += syms[prev:]
                c = cnt[w]
                # windowed count/index update (r14): only pairs whose
                # start index touches [first−1, last_match+1] change —
                # prefix and suffix pairs are content-identical in old
                # and new form, so the original full-word decrement/
                # increment cancelled them exactly; pairs in the gaps
                # BETWEEN matches fall inside both windows and still
                # cancel. Index entries for unchanged pairs already
                # reference w (inductively: all pairs were indexed at
                # word build, and every later content change happens
                # inside some update window), and the index is
                # stale-tolerant by design, so window-only adds are
                # sound.
                lastm = matches[-1]
                lo = first - 1 if first > 0 else 0
                hi = min(n - 2, lastm + 1)
                # q, not j: j is the round's batch size (ADVICE r14 —
                # shadowing it here survived only by reassignment order)
                for q in range(lo, hi + 1):
                    p = (syms[q], syms[q + 1])
                    d = pair_cnt[p] - c
                    if d:
                        pair_cnt[p] = d
                    else:
                        del pair_cnt[p]
                vocab[w] = out
                # new-form window: prefix is unchanged, so the first
                # changed pair still starts at first−1; the last match
                # lands at lastm − (len(matches)−1) after each earlier
                # match shrank the sequence by one. The last CREATED
                # pair is (ab, next) starting AT nlast — the old form's
                # (b, next) counterpart started at lastm+1 — so the new
                # window ends at nlast (nlast+1 would pull in the first
                # suffix-internal pair, which the old window correctly
                # leaves untouched)
                nlast = lastm - (len(matches) - 1)
                nhi = min(len(out) - 2, nlast)
                for q in range(lo, nhi + 1):
                    p = (out[q], out[q + 1])
                    pair_cnt[p] = pc_get(p, 0) + c
                    s = index.get(p)
                    if s is None:
                        index[p] = {w}
                    else:
                        s.add(w)
    return merges, vocab


def bpe_train(
    df: DataFrame,
    text_col: str = "text",
    num_merges: int = 8,
    batch: int = 1,
    driver_solve_max_symbols: int = 2_000_000,
) -> tuple[list[tuple[str, str]], DataFrame]:
    """Learn ``num_merges`` BPE merges on the corpus.

    Returns (merges in training order, final vocab (word, cnt, syms)).
    Stops early when no adjacent pair remains. Candidate ordering is
    (count desc, a asc, b asc) everywhere, so training is deterministic.

    ``batch`` (r5 verdict item 3) bounds the SCHEDULER cost, the real
    wall-clock limit of job-per-merge training: a realistic 32k-merge
    vocab at batch=1 is 32k sequential Spark jobs — hours of scheduler
    overhead regardless of data size. Each round counts pairs ONCE,
    collects a bounded candidate prefix, greedily selects up to
    ``batch`` pairs whose symbol sets are mutually disjoint (no selected
    pair's ``a``/``b``/merged token ``a+b`` appears in another's — such
    merges cannot feed or starve one another within the round, so their
    fresh-count ranks are simultaneously valid), and applies them as one
    fused fold chain with a single checkpoint. 32k merges at batch=16 ≈
    2k rounds. batch=1 is exactly the classic sequential algorithm;
    batch>1 is the standard batched approximation (merge ORDER can
    differ from sequential BPE where a round's later picks would have
    been outranked by pairs formed by its earlier picks — deterministic
    and mirrored bit-for-bit by the pure-Python reference in tests).

    ``driver_solve_max_symbols`` (r14): when the vocab-reduced corpus is
    small — total initial symbol count (= total distinct-word chars,
    which merges only ever shrink) under the cap — the loop is solved
    driver-side by ``_driver_train`` instead: the bounded-driver-work
    pattern of connected_components' union-find remainder. Sequential
    BPE's wall-clock on a small vocab is pure scheduler latency (one
    candidate-collect job per round, ~0.3 s each regardless of data
    size; 256 merges ≈ 34 rounds ≈ 10 s of round trips), while the
    incremental driver trainer finishes the same vocab in single-digit
    seconds with bounded memory (≤ cap symbols). Results are bit-equal
    (tests parametrize both paths against the same references). Vocabs
    above the cap — the 100 TB regime — run the distributed loop
    unchanged; set the cap to 0 to force it."""
    if num_merges < 0:
        raise ValueError("num_merges must be >= 0")
    if batch < 1:
        raise ValueError("batch must be >= 1")
    # AQE coalesces the (small) vocab shuffle to ONE partition, which
    # would serialize every subsequent merge fold and pair count on a
    # single core for the whole training run. Spread it once; the
    # per-round selects are narrow, so the width sticks across
    # checkpoints. Row placement cannot affect results (pair counts are
    # global aggregates, folds are per-row).
    #
    # Width is VOCAB-size-adaptive (r14): every training round schedules
    # one job over this relation, so its task count is pure per-round
    # overhead once partitions drop below a few thousand words each —
    # size to ~8k words/partition, floored at 2 (never serialize),
    # capped at defaultParallelism (never exceed the cluster width a
    # constant-free repartition would have used).
    par = df.sparkSession.sparkContext.defaultParallelism
    # LAZY checkpoints throughout the loop (r14): each round's candidate
    # collect is the first action over the previous round's fold, so it
    # materializes that checkpoint en route — one Spark job per round
    # instead of two (collect + eager checkpoint), halving the
    # scheduler/codegen round-trips that dominate batched training.
    # Lineage still truncates at every checkpoint once materialized.
    vocab0 = word_vocab(df, text_col).localCheckpoint(eager=False)
    stats = vocab0.agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(F.sum(F.length("word")), F.lit(0)).alias("s"),
        # tokenize() is whitespace-split (Java \s excludes \x00), so a
        # corpus CAN carry a NUL inside a token. The regexp_replace merge
        # packs symbols NUL-separated — an embedded NUL would make the
        # pack/split round-trip dismember that word every round. Detect
        # once here (piggybacked on the sizing aggregate) and route such
        # vocabs through the NUL-safe fold twin below.
        F.coalesce(F.max(F.col("word").contains(_SEP)), F.lit(False)).alias("has_nul"),
    ).collect()[0]
    n_words, n_syms, has_nul = stats.n, int(stats.s), bool(stats.has_nul)
    if n_syms <= driver_solve_max_symbols:
        # bounded driver-side solve (see docstring): collect the reduced
        # vocab, train incrementally, ship the segmentation back as a
        # local relation — same schema as the distributed path. Both
        # transfers ride Arrow (r14): Row-object collect + the verified
        # local-relation createDataFrame were ~30% of the solve's wall
        # at 50k words; toPandas/pandas-createDataFrame move the same
        # rows columnar. tolist() yields plain Python str/int, so the
        # trainer's dict arithmetic sees the exact same values.
        import pandas as pd

        pdf = vocab0.select("word", "cnt").toPandas()
        rows = list(zip(pdf["word"].tolist(), pdf["cnt"].tolist()))
        merges, seg = _driver_train(rows, num_merges, batch)
        out = df.sparkSession.createDataFrame(
            pd.DataFrame(
                {
                    "word": pdf["word"],
                    "cnt": pdf["cnt"],
                    "syms": [seg[w] for w, _ in rows],
                }
            ),
            "word string, cnt bigint, syms array<string>",
        )
        return merges, out
    width = max(2, min(par, (n_words + 8191) // 8192))
    vocab = vocab0.repartition(width).localCheckpoint(eager=False)
    merges: list[tuple[str, str]] = []
    while len(merges) < num_merges:
        j = min(batch, num_merges - len(merges))
        # bounded driver state: j=1 collects exactly the argmax row (the
        # pre-batch behavior); otherwise a fixed candidate prefix — greedy
        # disjoint selection can skip at most |used-symbols| ~ 3j of them
        cand_n = 1 if j == 1 else max(64, 4 * j)
        cand = (
            _pair_counts(vocab)
            .orderBy(F.col("c").desc(), F.col("a").asc(), F.col("b").asc())
            .limit(cand_n)
            .collect()
        )
        if not cand:
            break
        used: set[str] = set()
        sel: list[tuple[str, str]] = []
        for r in cand:
            if len(sel) == j:
                break
            toks = {r.a, r.b, r.a + r.b}
            if used & toks:
                continue
            sel.append((r.a, r.b))
            used |= toks
        merges.extend(sel)
        # one native regexp_replace pass applies the round's merges —
        # bit-equal to the classic/fused folds (property-tested), ~4x
        # cheaper than the interpreted per-element aggregate (r14).
        # Vocabs with a NUL-bearing word take the fold twin: its map
        # keys are (carry, symbol) pairs — a NUL inside a symbol could
        # only alias a key if another selected pair's concatenation
        # matched byte-for-byte, which symbol-disjoint selection
        # excludes; the pack/split regex path has no such guarantee.
        if has_nul:
            syms: Column = apply_merge_batch_expr(F.col("syms"), sel)
        else:
            syms = apply_merges_regex_expr(F.col("syms"), sel)
        vocab = vocab.select("word", "cnt", syms.alias("syms")).localCheckpoint(
            eager=False
        )
    return merges, vocab


def bpe_doc_token_counts(
    df: DataFrame,
    vocab: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document sub-token counts by broadcast-joining corpus words to
    the trained vocab's segmentation (no merge re-application at corpus
    scale). Every corpus word is in the vocab by construction."""
    seg = F.broadcast(vocab.select("word", F.size("syms").alias("__n")))
    words = df.select(F.col(id_col), F.explode(tokenize(text_col)).alias("word"))
    return (
        words.join(seg, "word")
        .groupBy(id_col)
        .agg(F.sum("__n").cast("bigint").alias("n_subtokens"))
    )
