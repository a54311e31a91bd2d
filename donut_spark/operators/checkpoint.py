"""Resumable, idempotent batch runs via a bucket commit log.

Spark restatement of the reference's checkpoint-resume
(`train.py:27-39,139`; S10 in SURVEY.md §2.1): instead of model
weights, the unit of durability is a *bucket* of documents
(``pmod(xxhash64(doc_id), n_buckets)``). A run

1. reads the commit log (marker files under ``<out>/_commits/``),
2. anti-filters already-committed buckets from the input,
3. processes and writes remaining buckets partitioned by bucket id
   (each bucket directory is written atomically by Spark's committer),
   routing rows with a non-null ``_error`` column to a bucket-
   partitioned ``quarantine/`` beside ``data/`` (S11: data/ holds only
   good rows, identically to the non-resume path),
4. appends one marker per bucket that completed.

Any partition/bucket can therefore resume after a crash without
recomputing finished work, and re-runs are no-ops. ALL marker and
directory I/O goes through the Hadoop FileSystem API (resolved from the
path's scheme), so the commit log, orphan cleanup, and bucket listing
behave identically on local files, HDFS, and S3A — the deployments the
submit/ entrypoints advertise.
"""

from __future__ import annotations

from typing import Callable, List

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

__all__ = ["committed_buckets", "mark_committed", "run_resumable"]

_COMMITS = "_commits"


def _fs_for(spark: SparkSession, path_str: str):
    """(FileSystem, Path) for a string path via the Hadoop FS API —
    scheme-aware, so file:/, hdfs:/ and s3a:/ all resolve correctly."""
    jvm = spark._jvm
    path = jvm.org.apache.hadoop.fs.Path(path_str)
    fs = path.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, path


def _active_spark(spark: SparkSession | None) -> SparkSession:
    spark = spark or SparkSession.getActiveSession()
    if spark is None:
        raise RuntimeError(
            "checkpoint I/O needs a SparkSession (Hadoop FS access)"
        )
    return spark


def _list_names(spark: SparkSession, dir_str: str) -> List[str]:
    fs, path = _fs_for(spark, dir_str)
    if not fs.exists(path):
        return []
    return [status.getPath().getName() for status in fs.listStatus(path)]


def committed_buckets(
    out_path: str, spark: SparkSession | None = None
) -> List[int]:
    spark = _active_spark(spark)
    return sorted(
        int(name.split("-")[1])
        for name in _list_names(spark, f"{out_path}/{_COMMITS}")
        if name.startswith("bucket-")
    )


def mark_committed(
    out_path: str, buckets: List[int], spark: SparkSession | None = None
) -> None:
    spark = _active_spark(spark)
    fs, commits_dir = _fs_for(spark, f"{out_path}/{_COMMITS}")
    fs.mkdirs(commits_dir)
    jvm_path = spark._jvm.org.apache.hadoop.fs.Path
    for b in buckets:
        # create(path, overwrite=True) then close: the marker's existence
        # is the commit bit; content is informational only
        out = fs.create(jvm_path(f"{out_path}/{_COMMITS}/bucket-{b}"), True)
        out.write(bytearray(b"done\n"))
        out.close()


def _bucket_dirs(spark: SparkSession, dir_str: str) -> dict[int, str]:
    """{bucket id: child path} of the ``_bucket=`` partition dirs."""
    return {
        int(name.split("=")[1]): f"{dir_str}/{name}"
        for name in _list_names(spark, dir_str)
        if name.startswith("_bucket=")
    }


def _remove_orphan_buckets(
    spark: SparkSession, dir_str: str, done: set
) -> None:
    """Remove UNCOMMITTED _bucket dirs before writing: an orphan left by
    a crash whose bucket has no rows in this run's input would otherwise
    survive and get certified as committed with stale data. Committed
    dirs are never touched."""
    fs, _ = _fs_for(spark, dir_str)
    jvm_path = spark._jvm.org.apache.hadoop.fs.Path
    for bucket, child in _bucket_dirs(spark, dir_str).items():
        if bucket not in done:
            fs.delete(jvm_path(child), True)


def run_resumable(
    spark: SparkSession,
    input_df: DataFrame,
    transform: Callable[[DataFrame], DataFrame],
    out_path: str,
    key: str = "doc_id",
    n_buckets: int = 64,
    error_col: str = "_error",
) -> List[int]:
    """Run ``transform`` over all not-yet-committed buckets.

    Returns the list of buckets processed this invocation. Output lands
    under ``<out_path>/data/_bucket=<b>/``. If the transform output has
    an ``error_col`` column, errored rows land under
    ``<out_path>/quarantine/_bucket=<b>/`` instead (and ``error_col``
    is dropped from data/, matching ``plans.lineage.quarantine_split``
    in the non-resume path); the transform output is persisted
    (spill-backed) across the two writes so the extraction kernel runs
    once, not twice.
    """
    done = set(committed_buckets(out_path, spark))
    bucketed = input_df.withColumn(
        "_bucket", F.pmod(F.xxhash64(F.col(key)), F.lit(n_buckets)).cast("int")
    )
    if done:
        bucketed = bucketed.filter(~F.col("_bucket").isin(*done))

    result = transform(bucketed)
    if "_bucket" not in result.columns:
        raise ValueError("transform must preserve the _bucket column")

    data_dir = f"{out_path}/data"
    quarantine_dir = f"{out_path}/quarantine"
    # Dynamic partition overwrite: only the _bucket= partitions present in
    # this run are replaced, committed partitions are untouched. This
    # closes the crash window between the parquet job committing and
    # mark_committed running — a re-run REPLACES the orphaned partitions
    # instead of appending duplicate rows (idempotence doesn't depend on
    # the marker write landing).
    _remove_orphan_buckets(spark, data_dir, done)
    _remove_orphan_buckets(spark, quarantine_dir, done)
    # lineage too: an orphaned lineage row would certify (n_rows,
    # checksum) for a bucket whose data/quarantine we just deleted —
    # the audit must never outlive the data it audits
    _remove_orphan_buckets(spark, f"{out_path}/lineage", done)

    split = error_col in result.columns
    if split:
        result = result.persist(StorageLevel.MEMORY_AND_DISK)
        bad = result.filter(F.col(error_col).isNotNull())
        good = result.filter(F.col(error_col).isNull()).drop(error_col)
    else:
        bad, good = None, result

    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        good.write.mode("overwrite").partitionBy("_bucket").parquet(data_dir)
        if split:
            bad.write.mode("overwrite").partitionBy("_bucket").parquet(
                quarantine_dir
            )
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
        if split:
            result.unpersist()

    # Every non-committed bucket was processed this run (the anti-filter
    # leaves exactly those in the input), so ALL of them commit — a
    # bucket whose transform output is EMPTY is done too; deriving the
    # commit set from output listings would recompute it forever.
    processed = sorted(b for b in range(n_buckets) if b not in done)
    # buckets with files in this run's output (for the lineage audit)
    written = sorted(
        b for b in _bucket_dirs(spark, data_dir) if b not in done
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
                f"{out_path}/lineage"
            )
        finally:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)

    mark_committed(out_path, processed, spark)
    return processed
