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

__all__ = ["GOPHER_STOPWORDS", "gopher_quality"]

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
