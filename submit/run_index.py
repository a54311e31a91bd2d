#!/usr/bin/env python
"""Production ANN index build — pay the signature/codebook pass ONCE so
every later probe is a pruned scan (the repeated-query regime over a
10^12-row embedding table):

    spark-submit --master <cluster> \\
        --py-files dist/donut_spark.zip \\
        submit/run_index.py \\
        --input  <embeddings table path> \\
        --output <index root> \\
        [--kind srp|ivf|ivfadc|all] [--n-bits 32] [--bands 8] [--seed 13] \\
        [--n-centroids 256] [--pq-m 16] [--pq-k 64]

Output layout under ``--output``:
    srp/postings/band=<b>/bval=<v>/   SRP posting lists (ids only) —
                                      a probe reads exactly ``bands``
                                      of these directories
    srp/_meta.json                    SRP parameters (probes refuse to
                                      mix parameters silently)
    ivf/cells/_cell=<c>/              the table re-written cell-
                                      partitioned (probe = n_probe dirs)
    ivf/_meta.json                    the codebook
    ivfadc/cells/_cell=<c>/           (id, residual PQ codes) — the
                                      billion-scale serving layout
                                      (Jégou 2011 §V); probes score
                                      compressed codes, rerank by id
    ivfadc/_meta.json                 coarse centroids + PQ codebooks
    pq/codes/                         (id, PQ codes) — plain PQ's
                                      compressed-full-scan layout
                                      (32-256x less I/O than raw
                                      vectors, pure-JVM ADC scoring)
    pq/_meta.json                     the PQ codebooks

Probe with ``donut_spark.operators.ann_index.probe_srp_index`` /
``probe_ivf_index`` / ``probe_ivfadc_index`` / ``probe_pq_index`` —
results proven identical to the online operators / exact brute force in
the exactness regime (tests/test_dedup_similarity.py).
"""

from __future__ import annotations

import argparse


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument(
        "--kind",
        choices=("srp", "ivf", "ivfadc", "pq", "both", "all"),
        default="both",
        help="'both' = srp+ivf (back-compat); 'all' adds ivfadc + pq",
    )
    ap.add_argument("--vec-col", default="embedding")
    ap.add_argument("--id-col", default="vec_id")
    ap.add_argument("--n-bits", type=int, default=32)
    ap.add_argument("--bands", type=int, default=8)
    ap.add_argument("--seed", type=int, default=13)
    ap.add_argument("--n-centroids", type=int, default=256)
    ap.add_argument("--pq-m", type=int, default=16)
    ap.add_argument("--pq-k", type=int, default=64)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from donut_spark.operators.ann_index import (
        write_ivf_index,
        write_ivfadc_index,
        write_pq_index,
        write_srp_index,
    )
    from donut_spark.sources.session import ENGINE_CONF

    builder = SparkSession.builder.appName("donut_spark_index")
    for key, value in ENGINE_CONF.items():
        builder = builder.config(key, value)
    spark = builder.getOrCreate()

    emb = spark.read.parquet(args.input)
    if args.kind in ("srp", "both", "all"):
        path = write_srp_index(
            emb,
            f"{args.output}/srp",
            vec_col=args.vec_col,
            id_col=args.id_col,
            n_bits=args.n_bits,
            bands=args.bands,
            seed=args.seed,
        )
        print(f"srp index -> {path}")
    if args.kind in ("ivf", "both", "all"):
        path = write_ivf_index(
            emb,
            f"{args.output}/ivf",
            vec_col=args.vec_col,
            id_col=args.id_col,
            n_centroids=args.n_centroids,
        )
        print(f"ivf index -> {path}")
    if args.kind in ("ivfadc", "all"):
        path = write_ivfadc_index(
            emb,
            f"{args.output}/ivfadc",
            vec_col=args.vec_col,
            id_col=args.id_col,
            n_centroids=args.n_centroids,
            m=args.pq_m,
            k=args.pq_k,
        )
        print(f"ivfadc index -> {path}")
    if args.kind in ("pq", "all"):
        path = write_pq_index(
            emb,
            f"{args.output}/pq",
            vec_col=args.vec_col,
            id_col=args.id_col,
            m=args.pq_m,
            k=args.pq_k,
        )
        print(f"pq index -> {path}")

    # leak audit: the builders persist nothing across their return — a
    # scheduler looping this job over table partitions must stay flat
    from donut_spark.plans.cache import persistent_rdd_ids

    print(f"residual cached rdds: {len(persistent_rdd_ids(spark.sparkContext))}")


if __name__ == "__main__":
    main()
