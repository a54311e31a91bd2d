#!/usr/bin/env python
"""Production extraction entrypoint (the north-rule deployment shape):

    spark-submit --master <cluster> \\
        --py-files dist/donut_spark.zip \\
        submit/run_extract.py \\
        --input  <spans table path>  \\
        --output <output root>       \\
        [--resume --n-buckets 4096] [--mode doc|span]
        [--modality spans|pdf]

Input (``--modality spans``, default): a table of interleaved documents
``(doc_id string, spans array<struct<kind,text,media_ref,offset:int>>
[, expected, gt_parse])`` — parquet or (when the session has an Iceberg
catalog configured) an Iceberg table name.

Input (``--modality pdf``): a table of native documents ``(doc_id
string, content binary)`` holding real PDF bytes; the layout parser
(core/pdf.py via operators/pdfparse.py) recovers the interleaved span
sequence in reading order, and unparseable documents land in
quarantine/ with the reason — the job never dies on a poison PDF.

Output layout under ``--output``:
    data/        extracted documents (parquet; ``_bucket=`` partitions in
                 resume mode, written with dynamic partition overwrite)
    quarantine/  rows whose extraction errored (``_error`` column) —
                 the job never fails on a poison document; ``_bucket=``
                 partitioned in resume mode
    lineage/     audit rows: per-partition (n_docs, n_spans, checksum)
                 in plain mode; per-bucket (n_rows, checksum) written by
                 run_resumable in resume mode (order-insensitive XOR
                 checksums in both)
    _commits/    bucket commit log (resume mode)

All session tuning comes from ``donut_spark.sources.session.ENGINE_CONF``
defaults + whatever ``--conf`` the submitter passes (submitter wins).
"""

from __future__ import annotations

import argparse


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--mode", choices=("doc", "span"), default="doc")
    ap.add_argument(
        "--modality", choices=("spans", "pdf"), default="spans",
        help="input shape: interleaved span tables (default) or native "
             "PDF bytes parsed by the layout codec",
    )
    ap.add_argument("--resume", action="store_true",
                    help="bucket-checkpointed idempotent run (S10)")
    ap.add_argument("--n-buckets", type=int, default=256)
    args = ap.parse_args()

    # Imports AFTER argparse: on an executor-shipped zip this module is
    # driver-side, but failing fast on bad args shouldn't need the JVM.
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from donut_spark.operators.extract import extract_and_evaluate, extract_documents
    from donut_spark.plans.lineage import lineage_metrics, quarantine_split
    from donut_spark.sources.session import ENGINE_CONF

    builder = SparkSession.builder.appName("donut_spark_extract")
    for key, value in ENGINE_CONF.items():
        # submitter --conf wins: builder.config only fills unset keys when
        # the session doesn't exist yet; explicit precedence via getAll
        builder = builder.config(key, value)
    spark = builder.getOrCreate()

    spans = spark.read.parquet(args.input)

    def extract(df):
        if args.modality == "pdf":
            from donut_spark.operators.pdfparse import (
                pdf_documents_from_table,
            )

            return pdf_documents_from_table(df)
        if args.mode == "doc" and "gt_parse" in df.columns:
            return extract_and_evaluate(df)
        out = extract_documents(df, mode=args.mode)
        if "_error" not in out.columns:
            out = out.withColumn("_error", F.lit(None).cast("string"))
        return out

    if args.resume:
        from donut_spark.operators.checkpoint import run_resumable

        # extract() preserves every input column, so _bucket flows
        # through. run_resumable itself routes errored rows to a
        # bucket-partitioned quarantine/ BEFORE the data write (data/
        # holds only good rows, identical semantics to the non-resume
        # path) and writes the per-bucket lineage audit to lineage/ —
        # the flat partition-level lineage_metrics pass is skipped so
        # it can't clobber that per-bucket audit.
        done = run_resumable(
            spark, spans, extract, args.output, n_buckets=args.n_buckets
        )
        result = spark.read.parquet(f"{args.output}/data")
        print(f"resumable run: processed buckets {done}")
    else:
        from pyspark.storagelevel import StorageLevel

        # persist across the good/bad writes: the two quarantine_split
        # filters are views over the SAME lazy frame, and without the
        # persist the second write re-runs the whole extraction kernel
        # (the dominant cost) just to collect the errored rows
        evaluated = extract(spans).persist(StorageLevel.MEMORY_AND_DISK)
        result, bad = quarantine_split(evaluated)
        result.write.mode("overwrite").parquet(f"{args.output}/data")
        bad.write.mode("overwrite").parquet(f"{args.output}/quarantine")
        evaluated.unpersist()
        result = spark.read.parquet(f"{args.output}/data")
        lineage_metrics(result).write.mode("overwrite").parquet(
            f"{args.output}/lineage"
        )
    n = result.count()
    print(f"extracted {n} documents -> {args.output}/data")
    # leak audit: the evaluated frame was the only persist and was
    # released after its two consumers — repeated runs must stay flat
    from donut_spark.plans.cache import persistent_rdd_ids

    print(f"residual cached rdds: {len(persistent_rdd_ids(spark.sparkContext))}")


if __name__ == "__main__":
    main()
