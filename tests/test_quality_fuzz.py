"""Adversarial parity fuzz for the JVM quality/repetition kernels.

The Gopher/C4 rule expressions live entirely in Catalyst (split, trim,
rlike, aggregate folds); this fuzz pins their semantics against
independent Python twins over adversarial text — unicode whitespace
(Java's ``\\s`` is ASCII-only), zero-width glue characters, and
repetition-heavy token streams — the same discipline as
tests/test_ws_parity.py for the shingle kernel.

Twin subtleties encoded here on purpose:
* Java/Spark ``trim`` strips ASCII SPACE only (not tabs, not NBSP) —
  a Python twin using ``str.strip()`` would diverge on ``" \\tfoo"``;
* Java's ``\\s`` is ASCII-only IN THE LINE REGEXES TOO — the first run
  of this fuzz caught a twin written with Python's unicode-aware
  ``\\s``: ``'...\\xa0'`` (ellipsis + NBSP) is an ellipsis-ended line
  to Python but not to the JVM or to the RE2 oracle replay, which
  agree with each other (the engine-wide Java-whitespace convention);
* rounding is HALF_UP on the shortest decimal repr (Spark round /
  BigDecimal), not Python's banker's rounding;
* the modal-gram tie-break is the lexicographically smallest gram, and
  a gram seen once is NOT repetition.
"""

import re
from collections import Counter
from decimal import ROUND_HALF_UP, Decimal

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from donut_spark.functions.quality import (
    GOPHER_STOPWORDS,
    gopher_quality,
    gopher_repetition,
)

_JAVA_WS = re.compile("[ \\t\\n\\x0b\\f\\r]+")


def _half_up(x: float) -> float:
    return float(Decimal(repr(x)).quantize(Decimal("1e-6"), ROUND_HALF_UP))


def _py_quality(text: str) -> dict:
    words = [w for w in _JAVA_WS.split(text) if w]
    n = len(words)
    stop_hits = sum(1 for w in words if w.lower() in GOPHER_STOPWORDS)
    alpha = sum(1 for w in words if re.search("[A-Za-z]", w))
    lines = text.split("\n")
    ws = "[ \\t\\n\\x0b\\f\\r]"  # the Java/RE2 ASCII \s class
    bullets = sum(
        1 for ln in lines if re.search(f"^{ws}*[-*•‣▪]", ln)
    )
    ellipsis = sum(
        1 for ln in lines if re.search(f"(\\.\\.\\.|…){ws}*$", ln)
    )
    out = {"n_words": n, "stop_hits": stop_hits}
    if n:
        out["mean_word_len"] = _half_up(sum(len(w) for w in words) / n)
        out["alpha_word_frac"] = _half_up(alpha / n)
    out["bullet_line_frac"] = (
        _half_up(bullets / len(lines)) if lines else 0.0
    )
    out["ellipsis_line_frac"] = (
        _half_up(ellipsis / len(lines)) if lines else 0.0
    )
    return out


def _py_top_frac(text: str, n: int) -> float:
    words = [w for w in _JAVA_WS.split(text.lower()) if w]
    if len(words) < n:
        return 0.0
    grams = [" ".join(words[i : i + n]) for i in range(len(words) - n + 1)]
    c = Counter(grams)
    best = max(c.values())
    if best < 2:
        return 0.0
    bestg = min(g for g, k in c.items() if k == best)
    total = sum(len(w) for w in words)
    if not total:
        return 0.0
    return _half_up(best * len(bestg.replace(" ", "")) / total)


def _py_dup_lines(text: str):
    lines = [ln for ln in text.split("\n") if ln.strip(" ") != ""]
    c = Counter(lines)
    dup_n = sum(k - 1 for k in c.values())
    dup_chars = sum((k - 1) * len(ln) for ln, k in c.items())
    total_chars = sum(len(ln) for ln in lines)
    f1 = _half_up(dup_n / len(lines)) if lines else 0.0
    f2 = _half_up(dup_chars / total_chars) if total_chars else 0.0
    return f1, f2


# adversarial alphabet: repetition-prone tokens, ASCII + unicode ws,
# zero-width glue, bullets/ellipsis line shapes, stop words
_TOKENS = [
    "the", "of", "spam", "ham", "x", "ab",
    " ", "\t", "\n", "\x0b", " ", " ", "　",
    "​", "-", "•", "...", "…", "#", "É", "中",
]
_text = st.lists(
    st.sampled_from(_TOKENS), min_size=0, max_size=60
).map("".join)


@settings(max_examples=12, deadline=None)
@given(texts=st.lists(_text, min_size=1, max_size=8))
def test_quality_kernel_matches_python_twin(spark, texts):
    rows = [(str(i), t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        r.doc_id: r.g
        for r in df.select(
            "doc_id", gopher_quality(F.col("text")).alias("g")
        ).collect()
    }
    for key, text in rows:
        g, want = got[key], _py_quality(text)
        assert g.n_words == want["n_words"], repr(text)
        assert g.stop_hits == want["stop_hits"], repr(text)
        if want["n_words"]:
            assert g.mean_word_len == want["mean_word_len"], repr(text)
            assert g.alpha_word_frac == want["alpha_word_frac"], repr(text)
        assert g.bullet_line_frac == want["bullet_line_frac"], repr(text)
        assert g.ellipsis_line_frac == want["ellipsis_line_frac"], repr(
            text
        )


@settings(max_examples=12, deadline=None)
@given(texts=st.lists(_text, min_size=1, max_size=8))
def test_repetition_kernel_matches_python_twin(spark, texts):
    rows = [(str(i), t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        r.doc_id: r.g
        for r in df.select(
            "doc_id", gopher_repetition(F.col("text")).alias("g")
        ).collect()
    }
    for key, text in rows:
        g = got[key]
        assert g.top2gram_char_frac == _py_top_frac(text, 2), repr(text)
        assert g.top3gram_char_frac == _py_top_frac(text, 3), repr(text)
        f1, f2 = _py_dup_lines(text)
        assert g.dup_line_frac == f1, repr(text)
        assert g.dup_line_char_frac == f2, repr(text)
