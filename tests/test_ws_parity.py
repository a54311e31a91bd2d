"""Unicode-whitespace parity fuzz: the JVM shingle kernel
(``dedup._shingle_explode``, Java regex ``\\s``) vs its Python twin
(``streaming.stream.java_ws_shingles``, used by the ingest-time
contamination filter).

Java's ``\\s`` matches only ASCII ``[ \\t\\n\\x0B\\f\\r]``; Python's is
Unicode-aware (NBSP, U+1680, U+2000-200A, U+2028/29, U+202F, U+205F,
U+3000, U+0085, U+001C-1F). A twin written with Python's ``\\s`` would
tokenize web text containing any of those differently and the
streaming/batch contamination guarantee would silently break — the NBSP
case was caught by a planted test in round 3; this fuzz covers the whole
class. U+200B (zero-width space) is whitespace in NEITHER engine and is
included to pin that it glues words on both sides."""

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F  # noqa: F401  (spark fixture import side)

from donut_spark.operators.dedup import _shingle_explode
from donut_spark.streaming.stream import java_ws_shingles

# the contested class: ASCII ws (both engines), unicode ws (Python-only),
# and non-ws confusables (neither)
_ASCII_WS = " \t\n\x0b\f\r"
_UNICODE_WS = "        　"
_GLUE = "​᠎"  # zero-width space / Mongolian vowel separator: NOT ws
_LETTERS = "abXY9é中"

_text = st.text(
    alphabet=st.sampled_from(list(_LETTERS + _ASCII_WS + _UNICODE_WS + _GLUE)),
    max_size=80,
)


@settings(max_examples=15, deadline=None)
@given(texts=st.lists(_text, min_size=1, max_size=6), n=st.integers(2, 4))
def test_jvm_and_python_shingle_twins_agree(spark, texts, n):
    """For arbitrary unicode-whitespace-bearing corpora, the JVM
    non-distinct shingle explode and the Python twin must produce the
    same multiset of shingles per document — and the distinct variant
    the same set."""
    rows = [(str(i), t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])

    jvm_raw: dict = {r[0]: [] for r in rows}
    for r in _shingle_explode(df, "text", "doc_id", n, distinct=False).collect():
        jvm_raw[r.k].append(r.sh)
    jvm_distinct: dict = {r[0]: set() for r in rows}
    for r in _shingle_explode(df, "text", "doc_id", n).collect():
        jvm_distinct[r.k].add(r.sh)

    for key, text in rows:
        py_raw = java_ws_shingles(text, n)
        assert sorted(jvm_raw[key]) == sorted(py_raw), (
            f"raw shingle divergence on {text!r}"
        )
        assert jvm_distinct[key] == set(py_raw), (
            f"distinct shingle divergence on {text!r}"
        )


@pytest.mark.parametrize("ch", list(_UNICODE_WS))
def test_unicode_ws_is_a_glue_char_in_both_engines(spark, ch):
    """Directed check per character: each Python-only whitespace char
    must behave as a NON-separator (word glue) in both the JVM kernel
    and the Python twin — i.e. 'a<ch>b c' yields the 2-gram with the
    glued token, not a 3-token split."""
    text = f"x{ch}y z"
    df = spark.createDataFrame([("0", text)], ["doc_id", "text"])
    jvm = sorted(r.sh for r in _shingle_explode(df, "text", "doc_id", 2).collect())
    py = sorted(set(java_ws_shingles(text, 2)))
    assert jvm == py == [f"x{ch}y z"]
