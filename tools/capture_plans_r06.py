"""Capture `.explain("formatted")` for every query touched in the round-6
optimization pass, into plans/r06/<name>_{before,after}.txt.

Usage: python tools/capture_plans_r06.py before|after [sf_dir]
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, "/root/repo")

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r06")


def plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> None:
    tag = sys.argv[1]
    sf = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"

    import __spark_entry__ as e
    from donut_spark.operators.extract import (
        evaluate_extraction,
        extract_and_evaluate,
        extract_documents,
    )
    from donut_spark.operators.pdfparse import pdf_documents_from_table
    from donut_spark.sources.fixtures import (
        load_spans,
        materialize_pdf_table,
        materialize_skewed_spans,
    )
    from donut_spark.sources.session import get_spark

    spark = get_spark(cores=32)
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(OUT, exist_ok=True)

    queries = e.queries()
    for name in (
        "q15_exact_dup_clusters",
        "q26_jaccard_verify",
        "q52_contamination",
        "q42_embedding_neardup",
        "q24_minhash_dedup",
        "q25_simhash_dedup",
        "q55_pdf_extract",
        "q04_multi_join",
        "q07_window_first",
    ):
        df = queries[name](spark, sf)
        with open(os.path.join(OUT, f"{name}_{tag}.txt"), "w") as fh:
            fh.write(plan_of(df))
        # a query that persists an intermediate (q24/q26 banded frames)
        # would otherwise leave cache marks that rewrite LATER captures'
        # plans with InMemoryTableScan nodes they don't normally have
        spark.catalog.clearCache()
        print("captured", name)

    # non-registry bench legs
    flag = extract_and_evaluate(load_spans(spark, sf))
    with open(os.path.join(OUT, f"flagship_extract_{tag}.txt"), "w") as fh:
        fh.write(plan_of(flag))
    skew = spark.read.parquet(materialize_skewed_spans(spark, sf))
    span_mode = evaluate_extraction(extract_documents(skew, "span"))
    with open(os.path.join(OUT, f"skew_span_mode_{tag}.txt"), "w") as fh:
        fh.write(plan_of(span_mode))
    pdfs = spark.read.parquet(materialize_pdf_table(spark, sf))
    with open(os.path.join(OUT, f"pdf_parse_{tag}.txt"), "w") as fh:
        fh.write(plan_of(pdf_documents_from_table(pdfs)))
    print("captured flagship/skew/pdf legs")


if __name__ == "__main__":
    main()
