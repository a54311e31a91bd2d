#!/usr/bin/env python
"""Production corpus-curation entrypoint — the composed quality pipeline
over the public rule sets this engine implements (PII redaction → C4
line cleaning → Gopher quality + repetition gates):

    spark-submit --master <cluster> \\
        --py-files dist/donut_spark.zip \\
        submit/run_curate.py \\
        --input  <documents table path> \\
        --output <output root> \\
        [--no-redact] [--no-c4] [--min-words 50]

Input: a table with (doc_id, text [, ...]). Output layout:
    clean/     surviving rows — text redacted + C4-line-cleaned, plus
               the quality measurements (n_words, stop_hits, …)
    rejected/  dropped rows with EVERY per-rule gate column, so a
               curation run is tunable rule-by-rule, not a black box
Summary line: kept/rejected counts + per-gate rejection counts.

The whole pass is map-only JVM expressions (regexp cascade, line
filters, HOF folds — zero Python workers) followed by two writes: the
shape that sweeps 10^12 documents at scan speed. Dedup/contamination
are separate jobs (run_dedup.py / run_contamination.py) because their
shuffles deserve their own cluster sizing.
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--key", default="doc_id")
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--no-redact", action="store_true")
    ap.add_argument("--no-c4", action="store_true")
    ap.add_argument("--min-words", type=int, default=50)
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from donut_spark.functions.quality import (
        c4_clean,
        gopher_quality,
        gopher_repetition,
    )
    from donut_spark.functions.redact import redact_pii
    from donut_spark.sources.session import ENGINE_CONF

    builder = SparkSession.builder.appName("donut_spark_curate")
    for key, value in ENGINE_CONF.items():
        builder = builder.config(key, value)
    spark = builder.getOrCreate()

    docs = spark.read.parquet(args.input)
    tc = args.text_col

    # 1. PII redaction (transform — text is replaced, counts kept)
    if not args.no_redact:
        r = redact_pii(F.col(tc))
        docs = docs.withColumn("_r", r).withColumn(
            tc, F.col("_r")["redacted"]
        ).withColumn("n_pii", F.col("_r")["n_total"]).drop("_r")
    else:
        docs = docs.withColumn("n_pii", F.lit(0).cast("long"))

    # 2. C4 line cleaning (transform + page gate)
    if not args.no_c4:
        c = c4_clean(F.col(tc))
        docs = docs.withColumn("_c", c).withColumn(
            tc, F.col("_c")["cleaned"]
        ).withColumn("c4_keep", F.col("_c")["c4_keep"]).drop("_c")
    else:
        docs = docs.withColumn("c4_keep", F.lit(True))

    # 3. Gopher quality + repetition gates on the cleaned text
    g = gopher_quality(F.col(tc), min_words=args.min_words)
    rep = gopher_repetition(F.col(tc))
    docs = docs.withColumn("_g", g).withColumn("_rep", rep)
    gate_cols = [
        "ok_words",
        "ok_word_len",
        "ok_symbols",
        "ok_bullets",
        "ok_ellipsis",
        "ok_alpha",
        "ok_stops",
    ]
    rep_cols = [
        "ok_dup_lines",
        "ok_dup_line_chars",
        "ok_top2gram",
        "ok_top3gram",
    ]
    for col in gate_cols + ["n_words", "stop_hits", "gopher_pass"]:
        docs = docs.withColumn(col, F.col("_g")[col])
    for col in rep_cols + ["repetition_pass"]:
        docs = docs.withColumn(col, F.col("_rep")[col])
    docs = docs.drop("_g", "_rep")
    keep = F.col("c4_keep") & F.col("gopher_pass") & F.col("repetition_pass")
    docs = docs.withColumn("_keep", keep).persist()

    out = args.output
    clean_cols = [args.key, tc, "n_pii", "n_words", "stop_hits"]
    docs.filter("_keep").select(*clean_cols).write.mode(
        "overwrite"
    ).parquet(f"{out}/clean")
    docs.filter(~F.col("_keep")).drop("_keep").write.mode(
        "overwrite"
    ).parquet(f"{out}/rejected")

    n_in = docs.count()
    n_clean = spark.read.parquet(f"{out}/clean").count()
    rej = spark.read.parquet(f"{out}/rejected")
    per_gate = {
        c: rej.filter(~F.col(c)).count()
        for c in ["c4_keep"] + gate_cols + rep_cols
    }
    docs.unpersist()
    print(
        "curate: "
        + json.dumps(
            {
                "rows_in": n_in,
                "kept": n_clean,
                "rejected": n_in - n_clean,
                "rejected_by_gate": per_gate,
            }
        )
    )


if __name__ == "__main__":
    main()
