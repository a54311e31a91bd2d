"""Resumable, idempotent batch runs via a bucket commit log.

Spark restatement of the reference's checkpoint-resume
(`train.py:27-39,139`; S10 in SURVEY.md §2.1): instead of model
weights, the unit of durability is a *bucket* of documents
(``pmod(xxhash64(doc_id), n_buckets)``). A run

1. reads the commit log (marker files under ``<out>/_commits/``),
2. anti-filters already-committed buckets from the input,
3. processes and writes remaining buckets partitioned by bucket id
   (each bucket directory is written atomically by Spark's committer),
4. appends one marker per bucket that completed.

Any partition/bucket can therefore resume after a crash without
recomputing finished work, and re-runs are no-ops. On a cluster the
marker I/O goes through the Hadoop FS API; in this sandbox it's local
files (same atomicity: rename-on-commit by the parquet committer, then
marker create).
"""

from __future__ import annotations

import os
from typing import Callable, List

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["committed_buckets", "mark_committed", "run_resumable"]

_COMMITS = "_commits"


def committed_buckets(out_path: str) -> List[int]:
    commits_dir = os.path.join(out_path, _COMMITS)
    if not os.path.isdir(commits_dir):
        return []
    return sorted(
        int(name.split("-")[1])
        for name in os.listdir(commits_dir)
        if name.startswith("bucket-")
    )


def mark_committed(out_path: str, buckets: List[int]) -> None:
    commits_dir = os.path.join(out_path, _COMMITS)
    os.makedirs(commits_dir, exist_ok=True)
    for b in buckets:
        with open(os.path.join(commits_dir, f"bucket-{b}"), "w") as fh:
            fh.write("done\n")


def run_resumable(
    spark: SparkSession,
    input_df: DataFrame,
    transform: Callable[[DataFrame], DataFrame],
    out_path: str,
    key: str = "doc_id",
    n_buckets: int = 64,
) -> List[int]:
    """Run ``transform`` over all not-yet-committed buckets.

    Returns the list of buckets processed this invocation. Output lands
    under ``<out_path>/data/_bucket=<b>/``.
    """
    done = set(committed_buckets(out_path))
    bucketed = input_df.withColumn(
        "_bucket", F.pmod(F.xxhash64(F.col(key)), F.lit(n_buckets)).cast("int")
    )
    if done:
        bucketed = bucketed.filter(~F.col("_bucket").isin(*done))

    result = transform(bucketed)
    if "_bucket" not in result.columns:
        raise ValueError("transform must preserve the _bucket column")

    # Dynamic partition overwrite: only the _bucket= partitions present in
    # this run are replaced, committed partitions are untouched. This
    # closes the crash window between the parquet job committing and
    # mark_committed running — a re-run REPLACES the orphaned partitions
    # instead of appending duplicate rows (idempotence doesn't depend on
    # the marker write landing).
    # Remove UNCOMMITTED _bucket dirs before writing: an orphan left by a
    # crash whose bucket has no rows in this run's input would otherwise
    # survive and get certified as committed with stale data. Committed
    # dirs are never touched.
    data_dir = os.path.join(out_path, "data")
    if os.path.isdir(data_dir):
        import shutil

        for name in os.listdir(data_dir):
            if name.startswith("_bucket=") and int(name.split("=")[1]) not in done:
                shutil.rmtree(os.path.join(data_dir, name), ignore_errors=True)

    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        result.write.mode("overwrite").partitionBy("_bucket").parquet(data_dir)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)

    # Every non-committed bucket was processed this run (the anti-filter
    # leaves exactly those in the input), so ALL of them commit — a
    # bucket whose transform output is EMPTY is done too; deriving the
    # commit set from output directories would recompute it forever.
    processed = sorted(b for b in range(n_buckets) if b not in done)
    # buckets with files in this run's output (for the lineage audit)
    written = sorted(
        int(name.split("=")[1])
        for name in os.listdir(data_dir)
        if name.startswith("_bucket=") and int(name.split("=")[1]) not in done
    )

    # Per-bucket lineage ALONGSIDE the commit markers (north-rule: any
    # partition can resume idempotently AND prove what it holds): row
    # count + order-insensitive checksum per bucket, recomputed from the
    # files just written — auditing what's on disk, not the plan. Same
    # dynamic-overwrite discipline as the data, so a resumed bucket
    # replaces its lineage row.
    if written:
        fresh = spark.read.parquet(data_dir).filter(F.col("_bucket").isin(written))
        payload = [c for c in fresh.columns if c != "_bucket"]
        lineage = (
            fresh.withColumn(
                "_rowhash", F.xxhash64(F.to_json(F.struct(*payload)))
            )
            .groupBy("_bucket")
            .agg(
                F.count("*").alias("n_rows"),
                F.expr("bit_xor(_rowhash)").alias("checksum"),
            )
        )
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            lineage.write.mode("overwrite").partitionBy("_bucket").parquet(
                os.path.join(out_path, "lineage")
            )
        finally:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)

    mark_committed(out_path, processed)
    return processed
