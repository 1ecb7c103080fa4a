"""Language ID with the shipped stopword + script-class tables
(functions/langid.py, r9; widened to 27 languages in r10)."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from hive_udf_spark.functions.langid import (
    SCRIPT_MARKERS,
    STOPWORD_MARKERS,
    lang_id,
    synth_multilingual_sql,
)
from hive_udf_spark.functions.text import tokenize


def _py_score(lang: str, tokens: list[str], text: str) -> int:
    """Driver-side mirror of lang_scores (token + script channels)."""
    s = sum(1 for t in tokens if t in STOPWORD_MARKERS[lang])
    for weight, cls in SCRIPT_MARKERS.get(lang, []):
        s += weight * len(re.findall(f"[{cls}]", text))
    return s


def _py_pred(tokens: list[str], text: str) -> str:
    scores = {lang: _py_score(lang, tokens, text) for lang in STOPWORD_MARKERS}
    best = max(sorted(scores), key=lambda lang: (scores[lang], ))
    # max() keeps the FIRST maximal element of the sorted iteration →
    # lexicographically-smallest tie-break, same as the engine's struct
    # argmax with the -rank field
    return best if scores[best] > 0 else "unknown"


def test_window_dominance_property():
    """The guarantee behind the planted fixture's all-true `correct`
    column, checked exhaustively in plain Python: for EVERY language and
    EVERY cyclic 3-window of its 5-marker list, a document of those
    three markers + neutral filler scores strictly highest for the
    planted language (counting BOTH channels: shared-word token hits
    and same-script block counts for every competitor)."""
    for lang, words in STOPWORD_MARKERS.items():
        for k in range(5):
            window = [words[k % 5], words[(k + 1) % 5], words[(k + 2) % 5]]
            text = f"{window[0]} {window[1]} filler37 {window[2]}"
            tokens = text.split()
            assert _py_pred(tokens, text) == lang, (lang, k, text)


def test_planted_language_accuracy_is_total(spark):
    """On the planted multilingual fixture every document's language is
    recovered by the REAL stopword + script tables — 100% across all 27
    languages, by the window-dominance property above."""
    lang_expr, text_expr = synth_multilingual_sql("spark")
    df = spark.range(0, 540).withColumnRenamed("id", "doc_id").select(
        "doc_id",
        F.expr(lang_expr).alias("planted"),
        F.expr(text_expr).alias("text"),
    )
    got = df.select(
        "planted", lang_id(tokenize("text"), text=F.col("text")).alias("pred")
    ).collect()
    assert len(got) == 540
    assert all(r.planted == r.pred for r in got)
    # all 27 languages appear (540 = 20 × 27)
    assert {r.planted for r in got} == set(STOPWORD_MARKERS)


def test_real_sentence_accuracy(spark):
    """Short REAL sentences — including unsegmented ja/zh/th (no
    whitespace tokens, so only the script channel can route them) and
    the same-script neighbour pairs ru/uk, ar/fa — classify correctly."""
    samples = [
        ("en", "the cat is on the roof and it will not come down"),
        ("de", "der hund ist nicht im garten und die katze schläft"),
        ("fr", "le chat est sur le toit et les oiseaux chantent"),
        ("es", "el perro no es grande pero los gatos son pequeños"),
        ("pt", "o livro não é para todos os alunos desta turma"),
        ("it", "il libro che ho letto non è per tutti"),
        ("nl", "de hond is niet in een tuin maar het huis"),
        ("sv", "det är en hund som springer och leker i parken"),
        ("da", "det er en hund og den løber til parken"),
        ("pl", "to nie jest dobry pomysł się na to zgodzić"),
        ("cs", "to je dobrý nápad že se na to podíváme"),
        ("tr", "bu bir kitap ve senin için çok önemli"),
        ("ro", "aceasta este o carte și nu la este de folos"),
        ("id", "ini adalah buku yang bagus dan untuk di sekolah"),
        ("vi", "đây là các cuốn sách của tôi và có ích"),
        ("ru", "мы не знаем что это значит на самом деле"),
        ("uk", "ми не знаємо що це означає насправді і чому"),
        ("ar", "هذا الكتاب من أفضل ما قرأت في حياتي"),
        ("fa", "این کتاب از بهترین کتاب‌هایی است که خوانده‌ام"),
        ("hi", "यह किताब बहुत अच्छी है और मुझे पसंद है"),
        ("bn", "এই বইটি খুব ভালো এবং আমার পছন্দ হয়"),
        ("ja", "これは日本語のテストですから正しく動きます"),
        ("ko", "이것은 한국어 문장이다 그리고 아주 좋다"),
        ("zh", "我们在这里学习中文因为它很有用"),
        ("th", "นี่คือประโยคภาษาไทยที่ใช้ทดสอบระบบของเรา"),
        ("el", "και αυτό το βιβλίο είναι πολύ καλό να διαβάσεις"),
        ("he", "של הספר הזה את הסיפור הוא לא יודע"),
    ]
    assert {lang for lang, _ in samples} == set(STOPWORD_MARKERS)
    df = spark.createDataFrame(samples, "label string, text string")
    got = df.select(
        "label", lang_id(tokenize("text"), text=F.col("text")).alias("pred")
    ).collect()
    wrong = [(r.label, r.pred) for r in got if r.label != r.pred]
    assert not wrong, wrong


def test_shared_marker_does_not_flip_prediction(spark):
    """'de' lives in the nl, tr AND ro lists; three distinct Dutch
    stopwords including 'de' must still resolve to nl, and likewise for
    Turkish."""
    df = spark.createDataFrame([("de het een",), ("bir ve de",)], "text string")
    got = [
        r.p
        for r in df.select(
            lang_id(tokenize("text"), text=F.col("text")).alias("p")
        ).collect()
    ]
    assert got == ["nl", "tr"]


def test_no_markers_is_unknown(spark):
    df = spark.createDataFrame([("zzz qqq 123",), ("",)], "text string")
    got = [
        r.p
        for r in df.select(
            lang_id(tokenize("text"), text=F.col("text")).alias("p")
        ).collect()
    ]
    assert got == ["unknown", "unknown"]
