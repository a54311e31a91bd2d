"""The flagship extraction pipeline (SURVEY.md §3.1 restated, §7.6).

Lineage:  spans table → cheap relational pre-filters → skew decluster →
boilerplate-strip extraction (doc- or span-parallel) → invariant
evaluation (span-sequence equality, json2token/token2json round-trip,
nTED) → partitioned sink + per-partition lineage.

Two physical strategies for the extraction step, selected by ``mode``:

* ``doc``  — one Arrow batch row per document; zero extra shuffle; best
  when document sizes are bounded.
* ``span`` — ``explode`` to spans, extract each independently, reassemble
  with ``array_sort``/``flatten``/``transform`` (all JVM-side); one
  shuffle, but the media-heavy tail (a single 10k-span document) spreads
  over the whole cluster instead of pinning one Python worker. This is
  the 10^12-document plan (SURVEY.md §4.1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.udfs import (
    extract_pieces,
    json2token_udf,
    nted_udf,
    roundtrip_ok_udf,
    token2json_udf,
)
from ..plans.skew import decluster, salt_heavy
from ..sources.fixtures import build_spans_table

__all__ = [
    "extract_documents",
    "evaluate_extraction",
    "run_flagship",
    "run_flagship_with_quarantine",
]

_RENUMBER = (
    "transform(_flat, (p, i) -> named_struct("
    "'kind', p.kind, 'text', p.text, 'media_ref', p.media_ref, "
    "'offset', cast(i as int)))"
)


def extract_documents(
    spans_df: DataFrame, mode: str = "doc", decluster_input: bool = False
) -> DataFrame:
    """Add an ``extracted`` column of cleaned spans in reading order.

    Input must have (doc_id, spans). Non-empty-doc filtering happens
    here (F-family predicate, pushed to the scan by Catalyst since it
    precedes any UDF). Set ``decluster_input`` when the source is
    clustered by document weight (e.g. a crawl ordered by site) — it
    buys uniform UDF load for one extra shuffle; leave it off when the
    upstream already hash-distributed (e.g. fixture synthesis).
    """
    df = spans_df.filter(F.size("spans") > 0)

    if mode == "doc":
        from pyspark.sql.types import ArrayType

        from ..functions.udfs import _extract_spans_err
        from ..sources.fixtures import SPAN_SCHEMA

        if decluster_input:
            df = decluster(df)
        # error-channel variant of extract_spans: poison docs land in the
        # _error column (quarantine) instead of failing the task/stream
        return (
            df.withColumn("_ex", _extract_spans_err(F.to_json("spans")))
            .withColumn(
                "extracted",
                F.from_json(F.col("_ex.extracted_json"), ArrayType(SPAN_SCHEMA)),
            )
            .withColumn("_error", F.col("_ex._error"))
            .drop("_ex")
        )

    if mode != "span":
        raise ValueError(f"unknown mode: {mode}")

    # Pass-through columns (expected, gt_parse, spans, ...) ride the
    # SAME scan/shuffle as the exploded spans — exactly one copy per
    # document, attached to the pos==0 row and recovered with
    # first(ignorenulls) — instead of a second scan of the fact table
    # plus a join (at 100 TB the re-scan is the dominant cost; here it
    # would even re-run fixture synthesis).
    passthrough = [c for c in spans_df.columns if c not in ("doc_id", "spans")]
    exploded = df.select(
        "doc_id", "spans", *passthrough, F.posexplode("spans").alias("pos", "s")
    ).select(
        "doc_id",
        # span count rides along so salt_heavy can tell the media-heavy
        # tail apart per exploded row (evaluated pre-explode, zero cost)
        F.size("spans").alias("_w"),
        *[
            F.when(F.col("pos") == 0, F.col(c)).alias(c)
            for c in passthrough
        ],
        F.when(F.col("pos") == 0, F.col("spans")).alias("spans"),
        # NULL coercion + tie-break parity with doc mode: the fused
        # kernel reads span.get('offset') or 0 / .get('media_ref') or ''
        # and Python's stable sort keeps input order on equal offsets —
        # coalesce here and carry pos as the secondary sort key so both
        # physical modes produce identical extracted sequences on null
        # or duplicate offsets
        F.coalesce(F.col("s.offset"), F.lit(0)).alias("offset"),
        F.col("pos"),
        F.when(
            F.col("s.kind") == "media",
            F.array(
                F.struct(
                    F.lit("media").alias("kind"),
                    F.lit("").alias("text"),
                    F.coalesce(F.col("s.media_ref"), F.lit("")).alias(
                        "media_ref"
                    ),
                )
            ),
        )
        .otherwise(extract_pieces(F.col("s.text")))
        .alias("pieces"),
    )
    # Two-phase salted reassembly (plans/skew.salt_heavy): one
    # media-heavy document (a 10k-span doc is one groupBy key) would
    # otherwise merge on a single reducer. Heavy rows (>= 48 spans, the
    # fixture's media-heavy tail) fan out over 16 salt values; phase 1
    # collects partials per (doc_id, _salt), phase 2 concatenates the
    # few partial arrays per doc. Light docs all use _salt=0, so phase 1
    # is one group per doc and phase 2 moves already-aggregated rows.
    # Ordering is unaffected: array_sort runs on the flattened whole.
    salted = salt_heavy(exploded, "doc_id", "pos", F.col("_w"))
    firsts = lambda: [  # noqa: E731 — same agg list in both phases
        F.first("spans", ignorenulls=True).alias("spans"),
        *[F.first(c, ignorenulls=True).alias(c) for c in passthrough],
    ]
    reassembled = (
        salted.groupBy("doc_id", "_salt")
        .agg(
            F.collect_list(F.struct("offset", "pos", "pieces")).alias("_pp"),
            *firsts(),
        )
        .groupBy("doc_id")
        .agg(F.flatten(F.collect_list("_pp")).alias("_parts"), *firsts())
        .withColumn("_flat", F.expr("flatten(transform(array_sort(_parts), p -> p.pieces))"))
        .withColumn("extracted", F.expr(_RENUMBER))
        .drop("_parts", "_flat")
    )
    return reassembled.select("doc_id", "spans", *passthrough, "extracted")


def evaluate_extraction(df: DataFrame) -> DataFrame:
    """Per-row invariant columns: exact span-sequence match vs expected,
    round-trip validity, and nTED of the round-tripped gt_parse.

    ``exact_match`` compares (kind, text, media_ref, order) — offsets are
    dense on both sides, so array equality is exactly the reference's
    per-document span-sequence equality.
    """
    out = df
    if "expected" in df.columns:
        out = out.withColumn(
            "exact_match", (F.col("extracted") == F.col("expected")).cast("int")
        )
    if "gt_parse" in df.columns:
        out = (
            out.withColumn("token_seq", json2token_udf("gt_parse"))
            .withColumn("pred_parse", token2json_udf("token_seq"))
            .withColumn("roundtrip_ok", roundtrip_ok_udf("gt_parse").cast("int"))
            .withColumn("nted", nted_udf("pred_parse", "gt_parse"))
        )
    return out


def extract_and_evaluate(spans_df: DataFrame, decluster_input: bool = False) -> DataFrame:
    """Fused flagship path: extraction + round-trip + nTED in ONE
    pandas-UDF node (see ``_extract_eval_fused``), exact-match compare
    JVM-side. Semantically identical to ``evaluate_extraction(
    extract_documents(df, "doc"))`` but with half the Python workers and
    Arrow hops per task — the plan that survives wide parallelism.
    """
    from pyspark.sql.types import ArrayType

    from ..functions.udfs import _extract_eval_fused
    from ..sources.fixtures import SPAN_SCHEMA

    df = spans_df.filter(F.size("spans") > 0)
    if decluster_input:
        df = decluster(df)
    df = df.withColumn(
        "_ev", _extract_eval_fused(F.to_json("spans"), F.col("gt_parse"))
    ).withColumn(
        "extracted", F.from_json(F.col("_ev.extracted_json"), ArrayType(SPAN_SCHEMA))
    )
    out = df.select(
        *[c for c in spans_df.columns],
        "extracted",
        F.col("_ev.token_seq").alias("token_seq"),
        F.col("_ev.pred_parse").alias("pred_parse"),
        F.col("_ev.roundtrip_ok").alias("roundtrip_ok"),
        F.col("_ev.nted").alias("nted"),
        F.col("_ev._error").alias("_error"),
    )
    if "expected" in spans_df.columns:
        out = out.withColumn(
            "exact_match", (F.col("extracted") == F.col("expected")).cast("int")
        )
    return out


def run_flagship(
    spark: SparkSession,
    sf_dir: str,
    mode: str = "doc",
    limit: int | None = None,
) -> DataFrame:
    """End-to-end: synthesize spans table → extract → evaluate →
    quarantine errored docs (good rows only; see
    :func:`run_flagship_with_quarantine` for the error frame).

    ``mode="doc"`` uses the fused single-Python-node plan; ``"span"``
    the explode/reassemble plan. Aggregate with ``df.agg(
    avg("exact_match"), avg("roundtrip_ok"), avg("nted"))`` for the
    corpus-level metrics (A1/A2 analogues).
    """
    good, _bad = run_flagship_with_quarantine(spark, sf_dir, mode=mode, limit=limit)
    return good


def run_flagship_with_quarantine(
    spark: SparkSession,
    sf_dir: str,
    mode: str = "doc",
    limit: int | None = None,
):
    """Flagship with the S11 error side-channel: returns (good, quarantine).

    Reference parity: `test.py:147-152,187-189` — failed samples are
    captured and persisted, the run continues. The error column is
    produced INSIDE the fused UDF so one poison document can never fail
    a 10^12-row job.
    """
    from ..plans.lineage import quarantine_split

    spans = build_spans_table(spark, sf_dir, limit=limit)
    if mode == "doc":
        return quarantine_split(extract_and_evaluate(spans))
    extracted = extract_documents(spans, mode=mode)
    evaluated = evaluate_extraction(extracted)
    if "_error" not in evaluated.columns:
        evaluated = evaluated.withColumn("_error", F.lit(None).cast("string"))
    return quarantine_split(evaluated)
