"""Rule-based document-quality gates as pure JVM expressions.

The Gopher corpus filters (Rae et al. 2021, "Scaling Language Models:
Methods, Analysis & Insights from Training Gopher", §A1.1) are the
public reference rule set for pretraining-corpus curation: word-count
band, mean-word-length band, symbol-to-word ratio, bullet/ellipsis
line fractions, alphabetic-word fraction, and a minimum stop-word
presence. The engine's composite ``quality_score``
(core/textstats.py:100) is a pandas-UDF heuristic; THIS module is the
production filter path — every rule is a Catalyst expression (split /
higher-order functions / rlike), so a 10^12-doc quality sweep stays
inside whole-stage codegen with zero Python workers.

Thresholds are parameters (defaults = the published Gopher values) so
two runs at different cluster sizes agree bit-for-bit and the q23
oracle can replay every rule in SQL.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "GOPHER_STOPWORDS",
    "C4_FIXTURE",
    "c4_clean",
    "gopher_quality",
    "gopher_repetition",
]

# the paper's stop-word presence set (§A1.1: "contains at least two of
# the following English words: the, be, to, of, and, that, have, with")
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")

_BULLET_RE = r"^\s*[-*•‣▪]"
_ELLIPSIS_RE = r"(\.\.\.|…)\s*$"


def _occurrences(text: Column, needle: str) -> Column:
    """Occurrence count of a literal substring, JVM-side."""
    return (
        F.length(text) - F.length(F.replace(text, F.lit(needle), F.lit("")))
    ) / len(needle)


def gopher_quality(
    text: Column,
    *,
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_word_ratio: float = 0.1,
    max_bullet_line_frac: float = 0.9,
    max_ellipsis_line_frac: float = 0.3,
    min_alpha_word_frac: float = 0.8,
    min_stop_hits: int = 2,
) -> Column:
    """Struct of per-rule measurements + flags + the conjunction.

    Fields: ``n_words``, ``mean_word_len``, ``symbol_ratio``,
    ``bullet_line_frac``, ``ellipsis_line_frac``, ``alpha_word_frac``,
    ``stop_hits`` (measurements); ``ok_words``, ``ok_word_len``,
    ``ok_symbols``, ``ok_bullets``, ``ok_ellipsis``, ``ok_alpha``,
    ``ok_stops`` (per-rule gates); ``gopher_pass`` (all gates). An
    empty/whitespace-only document fails everything. Exposing the
    per-rule gates (not just the conjunction) is what makes the sweep
    actionable — real curation pipelines tune one rule at a time.

    Ratios are rounded to 6 places INSIDE the struct so a DuckDB replay
    of the same arithmetic hashes identically (cross-engine float
    division is otherwise summation-order hostile).
    """
    words = F.filter(F.split(text, r"\s+"), lambda w: w != F.lit(""))
    n_words = F.size(words)
    total_chars = F.aggregate(
        words, F.lit(0).cast("long"), lambda acc, w: acc + F.length(w)
    )
    mean_word_len = F.round(
        total_chars / F.nullif(n_words.cast("double"), F.lit(0.0)), 6
    )
    n_symbols = _occurrences(text, "#") + _occurrences(text, "...") + _occurrences(text, "…")
    symbol_ratio = F.round(
        n_symbols / F.nullif(n_words.cast("double"), F.lit(0.0)), 6
    )
    lines = F.split(text, r"\n")
    n_lines = F.size(lines)
    bullet_frac = F.round(
        F.size(F.filter(lines, lambda ln: ln.rlike(_BULLET_RE)))
        / F.nullif(n_lines.cast("double"), F.lit(0.0)),
        6,
    )
    ellipsis_frac = F.round(
        F.size(F.filter(lines, lambda ln: ln.rlike(_ELLIPSIS_RE)))
        / F.nullif(n_lines.cast("double"), F.lit(0.0)),
        6,
    )
    alpha_frac = F.round(
        F.size(F.filter(words, lambda w: w.rlike("[A-Za-z]")))
        / F.nullif(n_words.cast("double"), F.lit(0.0)),
        6,
    )
    stop_hits = F.size(
        F.filter(
            words, lambda w: F.lower(w).isin(*GOPHER_STOPWORDS)
        )
    )
    ok_words = (n_words >= min_words) & (n_words <= max_words)
    ok_word_len = (mean_word_len >= min_mean_word_len) & (
        mean_word_len <= max_mean_word_len
    )
    ok_symbols = symbol_ratio <= max_symbol_word_ratio
    ok_bullets = bullet_frac <= max_bullet_line_frac
    ok_ellipsis = ellipsis_frac <= max_ellipsis_line_frac
    ok_alpha = alpha_frac >= min_alpha_word_frac
    ok_stops = stop_hits >= min_stop_hits
    nonempty = n_words > 0
    flags = {
        "ok_words": ok_words,
        "ok_word_len": ok_word_len,
        "ok_symbols": ok_symbols,
        "ok_bullets": ok_bullets,
        "ok_ellipsis": ok_ellipsis,
        "ok_alpha": ok_alpha,
        "ok_stops": ok_stops,
    }
    gated = {
        k: F.coalesce(nonempty & v, F.lit(False)).alias(k)
        for k, v in flags.items()
    }
    gopher_pass = F.coalesce(
        nonempty
        & ok_words
        & ok_word_len
        & ok_symbols
        & ok_bullets
        & ok_ellipsis
        & ok_alpha
        & ok_stops,
        F.lit(False),
    )
    return F.struct(
        n_words.cast("long").alias("n_words"),
        mean_word_len.alias("mean_word_len"),
        symbol_ratio.alias("symbol_ratio"),
        bullet_frac.alias("bullet_line_frac"),
        ellipsis_frac.alias("ellipsis_line_frac"),
        alpha_frac.alias("alpha_word_frac"),
        stop_hits.cast("long").alias("stop_hits"),
        *gated.values(),
        gopher_pass.alias("gopher_pass"),
    )


def _dup_after_first(sorted_arr: Column) -> Column:
    """Pairs each element of a SORTED array with its predecessor —
    elements equal to their predecessor are 2nd+ occurrences."""
    shifted = F.concat(
        F.array(F.lit("")),
        F.slice(
            sorted_arr, 1, F.greatest(F.size(sorted_arr) - 1, F.lit(0))
        ),
    )
    return F.zip_with(
        sorted_arr,
        shifted,
        lambda a, b: F.struct(a.alias("v"), (a == b).alias("dup")),
    )


def _word_chars(s: Column) -> Column:
    """Character count of a space-joined gram, spaces excluded."""
    return F.length(F.replace(s, F.lit(" "), F.lit("")))


def _top_gram_char_frac(words: Column, n: int) -> Column:
    """Fraction of word characters inside the most frequent word
    ``n``-gram (ties broken to the lexicographically smallest gram —
    deterministic across partitionings). One fold over the SORTED gram
    array carries (prev, run, best, best_gram); strict ``>`` keeps the
    first maximal run, which in sorted order IS the smallest gram."""
    grams = F.when(
        F.size(words) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(words) - n),
            lambda i: F.concat_ws(" ", F.slice(words, i + 1, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    acc0 = F.struct(
        F.lit("").alias("prev"),
        F.lit(0).alias("run"),
        F.lit(0).alias("best"),
        F.lit("").alias("bestg"),
    )
    folded = F.aggregate(
        F.array_sort(grams),
        acc0,
        lambda acc, g: F.struct(
            g.alias("prev"),
            F.when(g == acc["prev"], acc["run"] + 1)
            .otherwise(F.lit(1))
            .alias("run"),
            F.when(
                F.when(g == acc["prev"], acc["run"] + 1).otherwise(F.lit(1))
                > acc["best"],
                F.when(g == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)),
            )
            .otherwise(acc["best"])
            .alias("best"),
            F.when(
                F.when(g == acc["prev"], acc["run"] + 1).otherwise(F.lit(1))
                > acc["best"],
                g,
            )
            .otherwise(acc["bestg"])
            .alias("bestg"),
        ),
    )
    total_chars = F.aggregate(
        words, F.lit(0).cast("long"), lambda a, w: a + F.length(w)
    )
    # occurrences × gram chars (the DataTrove-style accounting: gram
    # overlaps are NOT deduped, so heavy loops can exceed 1.0 — the
    # gate compares ≤ threshold, unaffected); a gram seen ONCE is not
    # repetition, so best-run < 2 scores 0 (otherwise every short doc
    # fails on its own longest gram)
    return F.coalesce(
        F.when(
            folded["best"] >= 2,
            F.round(
                (folded["best"] * _word_chars(folded["bestg"]))
                / F.nullif(total_chars.cast("double"), F.lit(0.0)),
                6,
            ),
        ).otherwise(F.lit(0.0)),
        F.lit(0.0),
    )


def gopher_repetition(
    text: Column,
    *,
    max_dup_line_frac: float = 0.30,
    max_dup_line_char_frac: float = 0.20,
    max_top2gram_char_frac: float = 0.20,
    max_top3gram_char_frac: float = 0.18,
) -> Column:
    """The Gopher REPETITION filters (Rae et al. 2021 §A1.1, the other
    half of :func:`gopher_quality`): duplicate-line fraction, duplicate-
    line CHARACTER fraction, and the fraction of characters inside the
    most frequent word 2-/3-gram — all as Catalyst expressions (one
    ``aggregate`` fold per gram width; no Python, no explode).

    Definitions (pinned for the oracle replay): lines are non-empty
    ``\\n`` splits; a duplicate line is a 2nd+ occurrence of an exact
    line (sorted-predecessor trick); gram characters exclude the joining
    spaces; word space is the ''-filtered whitespace split of
    ``lower(text)``, same as every shingle operator here. Cross-doc /
    positional repetition is :func:`~donut_spark.operators.dedup.
    duplicated_passages`'s job — this struct is the cheap per-document
    gate. Returns measurements + per-rule gates + ``repetition_pass``.
    """
    lines = F.filter(
        F.split(text, r"\n"), lambda ln: F.trim(ln) != F.lit("")
    )
    n_lines = F.size(lines)
    marked = _dup_after_first(F.array_sort(lines))
    dups = F.filter(marked, lambda s: s["dup"])
    dup_line_frac = F.coalesce(
        F.round(
            F.size(dups) / F.nullif(n_lines.cast("double"), F.lit(0.0)), 6
        ),
        F.lit(0.0),
    )
    line_chars = F.aggregate(
        lines, F.lit(0).cast("long"), lambda a, ln: a + F.length(ln)
    )
    dup_line_chars = F.aggregate(
        dups, F.lit(0).cast("long"), lambda a, s: a + F.length(s["v"])
    )
    dup_line_char_frac = F.coalesce(
        F.round(
            dup_line_chars / F.nullif(line_chars.cast("double"), F.lit(0.0)),
            6,
        ),
        F.lit(0.0),
    )
    words = F.filter(
        F.split(F.lower(text), r"\s+"), lambda w: w != F.lit("")
    )
    top2 = _top_gram_char_frac(words, 2)
    top3 = _top_gram_char_frac(words, 3)
    ok_dup_lines = F.coalesce(
        dup_line_frac <= max_dup_line_frac, F.lit(True)
    )
    ok_dup_line_chars = F.coalesce(
        dup_line_char_frac <= max_dup_line_char_frac, F.lit(True)
    )
    ok_top2 = F.coalesce(top2 <= max_top2gram_char_frac, F.lit(True))
    ok_top3 = F.coalesce(top3 <= max_top3gram_char_frac, F.lit(True))
    return F.struct(
        dup_line_frac.alias("dup_line_frac"),
        dup_line_char_frac.alias("dup_line_char_frac"),
        top2.alias("top2gram_char_frac"),
        top3.alias("top3gram_char_frac"),
        ok_dup_lines.alias("ok_dup_lines"),
        ok_dup_line_chars.alias("ok_dup_line_chars"),
        ok_top2.alias("ok_top2gram"),
        ok_top3.alias("ok_top3gram"),
        (ok_dup_lines & ok_dup_line_chars & ok_top2 & ok_top3).alias(
            "repetition_pass"
        ),
    )


# terminal punctuation accepted by the C4 line rule (ASCII + the
# typographic close-quote real pages end lines with)
_C4_TERMINAL_RE = r'[.!?"”]\s*$'
_C4_JS_RE = r"(?i)javascript"

# planted corpus for the oracle gate (the synthetic test tables have no
# punctuation at all, so every rule would be constant on them)
C4_FIXTURE = [
    (
        "keeps",
        "This page has proper prose sentences. Every line ends well!\n"
        "Does it keep questions? Yes, and it keeps quotes too.\n"
        "A fifth sentence closes the page.",
    ),
    ("unterminated", "this line never ends\nneither does this one\nShort. Done. Yes. Good. Fine."),
    ("shortlines", "Ok.\nNo!\nWhy?\nThese three lines are too short to keep. "
                   "But this one line is long enough and ends correctly. "
                   "It even has several sentences. Four now. Five here."),
    ("javascript", "Please enable JavaScript to view this page.\n"
                   "Real content sentence one stays right here. And two. "
                   "Also three. Then four. Finally five."),
    ("lorem", "Lorem ipsum dolor sit amet, consectetur adipiscing elit. "
              "Second sentence. Third one. Fourth too. Fifth closes."),
    ("brace", "A config snippet { key: value } leaked into the page. "
              "Sentence two. Three. Four. Five."),
    ("toofew", "Only one kept sentence lives here."),
    ("empty", "   "),
]


def c4_clean(
    text: Column,
    *,
    min_words_per_line: int = 3,
    min_sentences: int = 5,
) -> Column:
    """The C4 cleaning rules (Raffel et al. 2019, §2.2) as Catalyst
    expressions: keep only lines that end in terminal punctuation and
    carry at least ``min_words_per_line`` words, drop lines mentioning
    javascript, and gate the whole page on ≥ ``min_sentences``
    sentences (approximated as terminal-punctuation count over the
    KEPT text — the paper uses a sentence splitter; the approximation
    is pinned by the oracle replay) and on the page-level lorem-ipsum /
    curly-brace tells.

    Struct fields: ``cleaned`` (kept lines, trimmed, ``\\n``-joined),
    ``n_lines``, ``n_lines_kept``, ``n_sentences``, ``has_lorem``,
    ``has_brace``, ``c4_keep``.
    """
    lines = F.filter(
        F.split(text, r"\n"), lambda ln: F.trim(ln) != F.lit("")
    )
    kept = F.transform(
        F.filter(
            lines,
            lambda ln: ln.rlike(_C4_TERMINAL_RE)
            & ~ln.rlike(_C4_JS_RE)
            & (
                F.size(
                    F.filter(
                        F.split(F.trim(ln), r"\s+"),
                        lambda w: w != F.lit(""),
                    )
                )
                >= min_words_per_line
            ),
        ),
        lambda ln: F.trim(ln),
    )
    cleaned = F.concat_ws("\n", kept)
    n_sentences = F.regexp_count(cleaned, F.lit(r"[.!?]"))
    has_lorem = F.lower(text).contains("lorem ipsum")
    has_brace = text.contains("{")
    keep = (
        (n_sentences >= min_sentences) & ~has_lorem & ~has_brace
    )
    return F.struct(
        cleaned.alias("cleaned"),
        F.size(lines).cast("long").alias("n_lines"),
        F.size(kept).cast("long").alias("n_lines_kept"),
        n_sentences.cast("long").alias("n_sentences"),
        has_lorem.alias("has_lorem"),
        has_brace.alias("has_brace"),
        keep.alias("c4_keep"),
    )
