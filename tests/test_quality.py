"""Gopher-rule quality gates (functions/quality.py).

Each published rule (Rae et al. 2021 §A1.1) gets a planted document
that fails it alone; the whole path must stay JVM-side (zero Python
eval nodes — it is the production 10^12-doc filter, unlike the
composite pandas-UDF scorer it complements).
"""

import pytest
from pyspark.sql import functions as F

from donut_spark.functions.quality import GOPHER_STOPWORDS, gopher_quality

GOOD = (
    "the quick brown fox jumps over that lazy dog with style and of "
    "course be have to " * 4
)


def _flags(spark, text, **kw):
    df = spark.createDataFrame([(text,)], ["text"])
    return df.select(gopher_quality(F.col("text"), **kw).alias("g")).first().g


def test_good_doc_passes(spark):
    g = _flags(spark, GOOD)
    assert g.gopher_pass and g.n_words == 68 and g.stop_hits >= 2


def test_each_rule_fails_alone(spark):
    stops = "the of and that have with be to "
    cases = {
        "ok_words": "too few words entirely",
        "ok_word_len": stops + "abcdefghijklmnopq " * 60,
        "ok_symbols": stops + "# # # w w " * 30,
        "ok_bullets": "\n".join(["- the item of that list we have"] * 30),
        "ok_ellipsis": "\n".join(
            [stops + "line that trails off..."] * 4 + ["the plain line"] * 6
        )
        + " "
        + "pad " * 45,
        "ok_alpha": stops + "123 456 " * 30,
        "ok_stops": "word " * 60,
    }
    for flag, text in cases.items():
        g = _flags(spark, text)
        assert not g.gopher_pass, flag
        assert not g[flag], (flag, g)


def test_empty_doc_fails_everything(spark):
    g = _flags(spark, "   ")
    assert g.n_words == 0 and not g.gopher_pass
    for f in (
        "ok_words",
        "ok_word_len",
        "ok_symbols",
        "ok_bullets",
        "ok_ellipsis",
        "ok_alpha",
        "ok_stops",
    ):
        assert g[f] is False, f


def test_thresholds_are_parameters(spark):
    short = "the of and that have with be to nine ten"
    assert not _flags(spark, short).gopher_pass  # 10 < default 50
    assert _flags(spark, short, min_words=5).gopher_pass


def test_stopword_set_is_the_published_one():
    assert GOPHER_STOPWORDS == (
        "the",
        "be",
        "to",
        "of",
        "and",
        "that",
        "have",
        "with",
    )


def test_gopher_path_is_jvm_only(spark):
    """The rule sweep must contain zero Python eval nodes — it is the
    whole-stage-codegen filter path for corpus curation."""
    df = spark.createDataFrame([(GOOD,)], ["text"])
    plan = (
        df.select(gopher_quality(F.col("text")).alias("g"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    for node in ("ArrowEvalPython", "BatchEvalPython", "MapInPandas"):
        assert node not in plan, plan


def test_gopher_gate_works_on_a_stream(spark, tmp_path):
    """Ingest-time quality gating: the rule struct is stateless JVM
    expressions, so the same gate runs UNCHANGED on a file stream and
    keeps exactly the rows the batch gate keeps (append mode, no
    state, no watermark — the right shape for a landing-zone filter)."""
    import os

    rows = [
        ("keep", GOOD),
        ("short", "too few words here"),
        ("nostops", "word " * 60),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    batch_kept = {
        r.doc_id
        for r in df.filter(
            gopher_quality(F.col("text"))["gopher_pass"]
        ).collect()
    }
    assert batch_kept == {"keep"}

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    os.makedirs(src)
    df.coalesce(1).write.parquet(os.path.join(src, "b1"))
    stream = spark.readStream.schema(df.schema).parquet(src + "/*")
    q = (
        stream.filter(gopher_quality(F.col("text"))["gopher_pass"])
        .select("doc_id")
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    streamed = {r.doc_id for r in spark.read.parquet(out).collect()}
    assert streamed == batch_kept


def test_repetition_rules_planted(spark):
    """Each repetition rule fires on its planted doc and stays quiet on
    clean text; a gram seen once is NOT repetition (short docs must not
    fail on their own longest gram)."""
    from donut_spark.functions.quality import gopher_repetition

    rows = [
        ("clean", "the quick brown fox jumps over that lazy dog today"),
        ("duplines", "\n".join(["same line here"] * 6 + ["one two three"])),
        ("loop2", "spam ham " * 30 + "other words appear once each"),
        ("loop3", "go stop wait " * 10 + "then regular content follows"),
        ("empty", "   "),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {
        r.doc_id: r.g
        for r in df.select(
            "doc_id", gopher_repetition(F.col("text")).alias("g")
        ).collect()
    }
    assert out["clean"].repetition_pass
    assert out["clean"].top3gram_char_frac == 0.0  # single occurrences
    d = out["duplines"]
    assert not d.repetition_pass and not d.ok_dup_lines
    assert d.dup_line_frac == pytest.approx(5 / 7, abs=1e-6)
    assert not out["loop2"].ok_top2gram
    assert not out["loop3"].ok_top3gram
    e = out["empty"]
    assert e.repetition_pass and e.dup_line_frac == 0.0


def test_repetition_thresholds_are_parameters(spark):
    from donut_spark.functions.quality import gopher_repetition

    text = "spam ham " * 30
    df = spark.createDataFrame([(text,)], ["text"])
    strict = df.select(
        gopher_repetition(F.col("text")).alias("g")
    ).first().g
    lax = df.select(
        gopher_repetition(
            F.col("text"), max_top2gram_char_frac=1.0
        ).alias("g")
    ).first().g
    assert not strict.ok_top2gram and lax.ok_top2gram


def test_repetition_path_is_jvm_only(spark):
    from donut_spark.functions.quality import gopher_repetition

    df = spark.createDataFrame([(GOOD,)], ["text"])
    plan = (
        df.select(gopher_repetition(F.col("text")).alias("g"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    for node in ("ArrowEvalPython", "BatchEvalPython", "MapInPandas"):
        assert node not in plan, plan


def test_redact_pii_cases(spark):
    """Typed placeholders, cascade counts, and non-matches pinned for
    every fixture row (the same rows the q13 oracle replays in RE2)."""
    from donut_spark.functions.redact import PII_FIXTURE, redact_pii

    df = spark.createDataFrame(PII_FIXTURE, ["k", "text"])
    out = {
        r.k: r.g
        for r in df.select("k", redact_pii(F.col("text")).alias("g")).collect()
    }
    assert out["plain"].n_total == 0
    assert out["email1"].redacted == "contact us at <EMAIL> for details"
    assert out["email2"].n_emails == 2
    assert out["ip"].n_ips == 2 and "<IP>" in out["ip"].redacted
    assert out["phone"].n_phones == 2
    m = out["mixed"]
    # root@10.0.0.1 is NOT an email (numeric TLD) — the IP inside it is
    # caught by the IPv4 pass instead
    assert (m.n_emails, m.n_ips, m.n_phones) == (0, 2, 1)
    assert m.redacted == "mail root@<IP> from <IP> phone <PHONE>"
    assert out["boundary"].n_total == 0
    # placeholders are digit-free: re-redacting is a fixpoint
    df2 = spark.createDataFrame(
        [(k, g.redacted) for k, g in out.items()], ["k", "text"]
    )
    again = {
        r.k: r.g
        for r in df2.select(
            "k", redact_pii(F.col("text")).alias("g")
        ).collect()
    }
    assert all(g.n_total == 0 for g in again.values())


def test_redact_pii_is_jvm_only(spark):
    from donut_spark.functions.redact import redact_pii

    df = spark.createDataFrame([("a@b.co 1.2.3.4",)], ["text"])
    plan = (
        df.select(redact_pii(F.col("text")).alias("g"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    for node in ("ArrowEvalPython", "BatchEvalPython", "MapInPandas"):
        assert node not in plan, plan


def test_c4_clean_cases(spark):
    """Every C4 rule pinned on its planted page: terminal-punctuation
    line keep, short-line drop, javascript-line drop, lorem/brace page
    gates, and the >=5-sentence page gate."""
    from donut_spark.functions.quality import C4_FIXTURE, c4_clean

    df = spark.createDataFrame(C4_FIXTURE, ["k", "text"])
    out = {
        r.k: r.g
        for r in df.select("k", c4_clean(F.col("text")).alias("g")).collect()
    }
    k = out["keeps"]
    assert k.c4_keep and k.n_lines_kept == 3 and k.n_sentences == 5
    assert out["unterminated"].n_lines_kept == 1  # two unterminated drop
    assert out["shortlines"].n_lines_kept == 1  # 'Ok.' 'No!' 'Why?' drop
    j = out["javascript"]
    assert j.n_lines_kept == 1 and "JavaScript" not in j.cleaned
    assert not out["lorem"].c4_keep and out["lorem"].has_lorem
    assert not out["brace"].c4_keep and out["brace"].has_brace
    assert not out["toofew"].c4_keep  # 1 sentence < 5
    e = out["empty"]
    assert not e.c4_keep and e.cleaned == "" and e.n_lines == 0


def test_c4_clean_is_jvm_only(spark):
    from donut_spark.functions.quality import c4_clean

    df = spark.createDataFrame([("A line. B line. C line.",)], ["text"])
    plan = (
        df.select(c4_clean(F.col("text")).alias("g"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    for node in ("ArrowEvalPython", "BatchEvalPython", "MapInPandas"):
        assert node not in plan, plan
