"""10x scale probe for the PDF layout-parse modality.

Stages the sf0.1 PDF table (5,000 real PDFs) and a 10x replica (50,000
docs, distinct doc_ids so every PDF is a distinct byte stream), then
times the full parse + reading-order reassembly at both sizes on the
same session. The plan is map-only (scan → mapInPandas → per-doc agg,
one exchange), so per-doc cost must stay flat with row count — the
10^12-doc argument for the modality, measured rather than asserted.

Usage: python tools/pdf_scale_probe.py   (records to stdout; paste the
JSON line into BENCH/BASELINE.md)
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

SF = "/root/testdata/sf0.1"
WORK = "/tmp/pdf_scale_probe"


def main() -> None:
    from pyspark.sql import functions as F

    from donut_spark.operators.pdfparse import (
        pdf_documents_from_table,
        synth_pdf_table,
    )
    from donut_spark.sources.fixtures import load_spans, materialize_pdf_table
    from donut_spark.sources.session import get_spark

    spark = get_spark(cores=32)
    spark.sparkContext.setLogLevel("ERROR")

    base_path = materialize_pdf_table(spark, SF)

    # 10x replica: numeric-suffixed doc_ids keep the synth's int(doc_id)
    # contract while making every replica a distinct PDF byte stream
    spans = load_spans(spark, SF).select("doc_id", "expected")
    reps = spark.range(10).select(F.col("id").alias("_rep"))
    big_spans = spans.crossJoin(reps).select(
        (F.col("doc_id").cast("long") + F.col("_rep") * 1_000_000)
        .cast("string")
        .alias("doc_id"),
        "expected",
    )
    big_path = f"{WORK}/pdf_10x"
    import os

    if not os.path.exists(f"{big_path}/_SUCCESS"):
        synth_pdf_table(spark, big_spans).repartition(64, "doc_id").write.mode(
            "overwrite"
        ).parquet(big_path)

    out = {}
    for name, path in (("1x", base_path), ("10x", big_path)):
        pdfs = spark.read.parquet(path)
        pdfs.count()  # warm footers
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            n = (
                pdf_documents_from_table(pdfs)
                .agg(
                    F.count("*").alias("docs"),
                    F.sum(F.size("extracted")).alias("spans"),
                )
                .collect()[0]
            )
            best = min(best, time.perf_counter() - t0)
        out[name] = {
            "docs": int(n["docs"]),
            "spans": int(n["spans"]),
            "wall_sec": round(best, 3),
            "docs_per_sec": round(n["docs"] / best, 1),
        }
    ratio = (out["10x"]["wall_sec"] / out["10x"]["docs"]) / (
        out["1x"]["wall_sec"] / out["1x"]["docs"]
    )
    out["per_doc_cost_ratio_10x_vs_1x"] = round(ratio, 3)
    import bench

    out["calibration"] = bench.calibrate()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
