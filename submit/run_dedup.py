#!/usr/bin/env python
"""Production corpus-dedup entrypoint — the composed pipeline the
operators document (exact-dedup FIRST so identical mass never reaches
the LSH join, then banded MinHash discovery, exact n-gram Jaccard
verification, connected components, keeper election):

    spark-submit --master <cluster> \\
        --py-files dist/donut_spark.zip \\
        submit/run_dedup.py \\
        --input  <documents table path> \\
        --output <output root> \\
        [--threshold 0.8] [--num-perm 64] [--bands 16] \\
        [--max-bucket-size 1000] [--keep-all-columns]

Input: a table with (doc_id, text [, ...]). Output layout:
    deduped/      rows that survive BOTH exact and near-dup dedup
                  (cluster keepers + singletons)
    clusters/     (doc_id, cluster) near-dup component assignments
    pairs/        verified near-dup pairs (a, b, jaccard)
    exact_dups/   byte-identical clusters (fp, n_dups, keeper)
    passages/     sub-document duplicated passages AMONG THE SURVIVORS
                  (doc_id, start_tok, end_tok, …) — residual verbatim
                  boilerplate that doc-level dedup cannot remove (the
                  Lee et al. 2022 substring family); trim these spans
                  or weigh them at training time (--passages-ngram 0
                  disables)
    audit/hot_buckets/   LSH buckets the cap dropped (NEVER silent:
                  count these before trusting a capped run's coverage)

Every stage is deterministic (seeded hashes), so two cluster sizes —
or a failed-and-rerun job — produce identical output.
"""

from __future__ import annotations

import argparse


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--key", default="doc_id")
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--threshold", type=float, default=0.8)
    ap.add_argument("--num-perm", type=int, default=64)
    ap.add_argument("--bands", type=int, default=16)
    ap.add_argument("--max-bucket-size", type=int, default=1000)
    ap.add_argument(
        "--passages-ngram",
        type=int,
        default=8,
        help="shingle width for the survivor passage audit; 0 disables",
    )
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from donut_spark.operators.dedup import (
        connected_components,
        duplicated_passages,
        exact_dedup,
        exact_dup_clusters,
        hot_buckets,
        minhash_banded,
        minhash_lsh_pairs,
        ngram_jaccard_pairs,
    )
    from donut_spark.plans.cache import capture, persistent_rdd_ids
    from donut_spark.sources.session import ENGINE_CONF

    builder = SparkSession.builder.appName("donut_spark_dedup")
    for key, value in ENGINE_CONF.items():
        builder = builder.config(key, value)
    spark = builder.getOrCreate()

    docs = spark.read.parquet(args.input)
    out = args.output

    # 1. byte-identical clusters (audit) + exact dedup (composition rule:
    #    identical mass must never form a quadratic LSH bucket)
    exact_dup_clusters(
        docs, args.text_col, args.key, include_members=False
    ).write.mode("overwrite").parquet(f"{out}/exact_dups")
    uniq = exact_dedup(docs, args.text_col, args.key)

    # 2. banded MinHash discovery + hot-bucket audit (same banding frame).
    #    capture() moves the persisted-frame handles off the returned
    #    DataFrame into a PersistedResult, so any transformation of the
    #    result stays release-safe (plans/cache.py hand-off discipline)
    cands_res = capture(minhash_lsh_pairs(
        uniq,
        args.text_col,
        args.key,
        num_perm=args.num_perm,
        bands=args.bands,
        max_bucket_size=args.max_bucket_size,
    ))
    cands = cands_res.frame
    hot_buckets(
        minhash_banded(uniq, args.text_col, args.key, args.num_perm, args.bands),
        ["band", "band_hash"],
        args.max_bucket_size,
    ).write.mode("overwrite").parquet(f"{out}/audit/hot_buckets")

    # 3. exact Jaccard verify, candidate-driven (the only shape that
    #    survives corpus scale). ngram_jaccard_pairs persists the
    #    candidate frame across its plan references (round-6) — capture
    #    those handles too and release them with the banding frame once
    #    the pairs are on disk
    pairs_res = capture(
        ngram_jaccard_pairs(
            uniq,
            args.text_col,
            args.key,
            threshold=args.threshold,
            candidates=cands,
        )
    )
    pairs_res.frame.write.mode("overwrite").parquet(f"{out}/pairs")
    # the banded signature frame minhash_lsh_pairs persisted and the
    # candidate frame have now been fully consumed (pairs are on disk)
    # — release them, or a long-lived session accumulates one cached
    # frame per stage
    pairs_res.release()
    cands_res.release()
    pairs = spark.read.parquet(f"{out}/pairs")

    # 4. transitive closure → keeper election (min key per component).
    #    The keeper anti-join FILTERS the checkpoint-backed result before
    #    its final consumption — exactly the shape the attribute hand-off
    #    silently leaked on (the filtered frame drops the attribute);
    #    with PersistedResult the handles survive any derivation, and the
    #    release still happens strictly AFTER the last consumer (deduped
    #    write) because checkpointed plans have no lineage to recompute.
    clusters_res = capture(connected_components(pairs))
    clusters = clusters_res.frame
    clusters.write.mode("overwrite").parquet(f"{out}/clusters")

    drop = clusters.filter(F.col("v") != F.col("cluster")).select(
        F.col("v").alias(args.key)
    )
    deduped = uniq.join(drop, args.key, "left_anti")
    deduped.write.mode("overwrite").parquet(f"{out}/deduped")
    clusters_res.release()

    # 5. sub-document passage audit over the SURVIVORS: verbatim runs
    #    still shared across kept documents (boilerplate doc-level
    #    dedup can't remove). Reads the written table so the dedup
    #    join chain isn't recomputed; the persisted positions frame is
    #    released like every other stage cache.
    n_passages = 0
    if args.passages_ngram:
        survivors = spark.read.parquet(f"{out}/deduped")
        pass_res = capture(
            duplicated_passages(
                survivors,
                args.text_col,
                args.key,
                n=args.passages_ngram,
                persist=True,
            )
        )
        pass_res.frame.write.mode("overwrite").parquet(f"{out}/passages")
        pass_res.release()
        n_passages = spark.read.parquet(f"{out}/passages").count()

    n_in = docs.count()
    n_out = spark.read.parquet(f"{out}/deduped").count()
    n_hot = spark.read.parquet(f"{out}/audit/hot_buckets").count()
    # leak audit: every stage released its cached/checkpointed blocks —
    # a long-lived session running this job repeatedly stays flat
    n_leaked = len(persistent_rdd_ids(spark.sparkContext))
    print(
        f"dedup: {n_in} -> {n_out} rows "
        f"({n_in - n_out} removed); hot buckets dropped by cap: {n_hot}; "
        f"survivor passages flagged: {n_passages}; "
        f"residual cached rdds: {n_leaked}"
    )


if __name__ == "__main__":
    main()
