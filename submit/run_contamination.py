#!/usr/bin/env python
"""Production benchmark-contamination sweep — the train/test leak check
every pretraining-corpus pipeline runs before a data release:

    spark-submit --master <cluster> \\
        --py-files dist/donut_spark.zip \\
        submit/run_contamination.py \\
        --corpus    <corpus table path (doc_id, text, ...)> \\
        --benchmark <held-out eval table path (doc_id, text, ...)> \\
        --output    <output root> \\
        [--n 13] [--min-hits 1] [--quarantine]

Scale shape (the only one that survives 10^12 corpus rows): the
benchmark side is small by definition, so its DISTINCT word-``n``-gram
shingle set is broadcast and the corpus scan streams through a
broadcast hash join — the corpus never shuffles. Long shingles
(default n=13 words, the common contamination-sweep setting; 8+ makes
chance collisions vanish) mean any hit is a verbatim excerpt.

Output layout:
    flagged/      (doc_id, n_hits, n_distinct_hits) — corpus docs
                  sharing >= --min-hits shingle OCCURRENCES with the
                  benchmark (n_hits counts occurrences: a doc quoting
                  the same benchmark sentence 3 times reports 3)
    clean/        (only with --quarantine) the corpus rows with every
                  flagged doc removed — the release-ready table
    summary printed as one JSON line (counts + parameters)

The same filter runs at ingest time as a stateless stream:
``donut_spark.streaming.stream.streaming_contamination`` (proven
hit-for-hit identical to this batch sweep).
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--corpus", required=True)
    ap.add_argument("--benchmark", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--key", default="doc_id")
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--n", type=int, default=13)
    ap.add_argument("--min-hits", type=int, default=1)
    ap.add_argument(
        "--quarantine",
        action="store_true",
        help="also write clean/ = corpus anti-joined on flagged docs",
    )
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from donut_spark.operators.dedup import contamination_overlap
    from donut_spark.plans.cache import persistent_rdd_ids
    from donut_spark.sources.session import ENGINE_CONF

    builder = SparkSession.builder.appName("donut_spark_contamination")
    for key, value in ENGINE_CONF.items():
        builder = builder.config(key, value)
    spark = builder.getOrCreate()

    corpus = spark.read.parquet(args.corpus)
    benchmark = spark.read.parquet(args.benchmark)

    flagged = contamination_overlap(
        corpus,
        benchmark,
        text_col=args.text_col,
        key=args.key,
        n=args.n,
        min_hits=args.min_hits,
    )
    flagged.write.mode("overwrite").parquet(f"{args.output}/flagged")
    flagged = spark.read.parquet(f"{args.output}/flagged")

    n_corpus = corpus.count()
    n_flagged = flagged.count()
    n_clean = None
    if args.quarantine:
        clean = corpus.join(
            flagged.select(args.key), args.key, "left_anti"
        )
        clean.write.mode("overwrite").parquet(f"{args.output}/clean")
        n_clean = spark.read.parquet(f"{args.output}/clean").count()

    print(
        json.dumps(
            {
                "corpus_docs": n_corpus,
                "flagged_docs": n_flagged,
                "clean_docs": n_clean,
                "n": args.n,
                "min_hits": args.min_hits,
                # leak audit — broadcast-only pipeline, must stay flat
                "residual_cached_rdds": len(
                    persistent_rdd_ids(spark.sparkContext)
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
