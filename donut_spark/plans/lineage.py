"""Per-partition lineage & metrics (SURVEY.md §4.3) — the reference's
jsonl results + pickled-error side channel (`test.py:136-152,187-189`)
generalized to a distributed, schema-stable audit table.

One row per output partition: ``(partition_id, n_docs, n_spans,
checksum)`` where checksum is an order-insensitive XOR of row hashes, so
two runs (or two cluster sizes) can be compared partition-free via the
global XOR.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["lineage_metrics", "quarantine_split"]


def lineage_metrics(df: DataFrame, spans_col: str = "extracted") -> DataFrame:
    """Compute per-partition lineage rows for an extraction output."""
    return (
        df.withColumn("_pid", F.spark_partition_id())
        .withColumn("_rowhash", F.xxhash64("doc_id", F.to_json(F.col(spans_col))))
        .groupBy("_pid")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.size(spans_col)).alias("n_spans"),
            # BIT_XOR is order-insensitive → stable across schedulers
            F.expr("bit_xor(_rowhash)").alias("checksum"),
        )
        .withColumnRenamed("_pid", "partition_id")
    )


def quarantine_split(df: DataFrame, error_col: str = "_error"):
    """S11: never fail the job — rows with a non-null error column go to
    a quarantine frame written beside the output."""
    good = df.filter(F.col(error_col).isNull()).drop(error_col)
    bad = df.filter(F.col(error_col).isNotNull())
    return good, bad
