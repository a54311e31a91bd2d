"""Format-agnostic table access (SURVEY.md §7 risk 6).

The production design point is Iceberg (`spark.read.format("iceberg")
.load(tbl)`) for snapshot isolation, partition pruning, and incremental
reads; this sandbox has plain parquet directories with the identical
layout, so `read_table` dispatches on what the path/catalog offers and
the pipeline code stays format-agnostic.
"""

from __future__ import annotations

import os
from typing import Optional

from pyspark.sql import DataFrame, SparkSession

__all__ = ["TABLES", "read_table", "read_documents_any", "write_table", "default_sf_dir"]

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def default_sf_dir() -> str:
    return os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def read_table(spark: SparkSession, name: str, sf_dir: Optional[str] = None) -> DataFrame:
    """Load a named table.

    Resolution order: Iceberg catalog table ``donut.<name>`` if an
    Iceberg catalog is configured on the session; else the SESSION
    catalog's ``donut`` database if it holds the table (managed tables —
    the catalog read path this sandbox can actually exercise, since no
    Iceberg runtime jar or pyiceberg is installable here; the dispatch
    and the table-resolution semantics are the same shape Iceberg's
    catalog serves); else ``<sf_dir>/<name>.parquet``.
    """
    if spark.conf.get("spark.sql.catalog.donut", None):
        return spark.read.format("iceberg").load(f"donut.{name}")
    if spark.catalog.tableExists(f"donut.{name}"):
        return spark.table(f"donut.{name}")
    base = sf_dir or default_sf_dir()
    return spark.read.parquet(f"{base}/{name}.parquet")


def write_table(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: Optional[list] = None,
) -> None:
    """Partitioned parquet/Iceberg sink (S6/S7 in SURVEY.md §2.1)."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_jsonl(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Results-jsonl sink (S6, `test.py:136-148`): one JSON object per
    row, all columns."""
    from pyspark.sql import functions as F

    df.select(F.to_json(F.struct(*df.columns)).alias("value")).write.mode(
        mode
    ).text(path)


def write_metadata_jsonl(
    df: DataFrame,
    path: str,
    file_name_col: str = "doc_id",
    gt_col: str = "gt_parse",
    mode: str = "overwrite",
) -> None:
    """metadata.jsonl sink (S7, `synthdog/template.py:110-117`): rows of
    ``{"file_name": ..., "ground_truth": "{\\"gt_parse\\": ...}"}`` with
    the ground truth double-encoded exactly as the reference consumes it
    (`donut/util.py:75-81`)."""
    from pyspark.sql import functions as F

    out = df.select(
        F.col(file_name_col).alias("file_name"),
        F.concat(F.lit('{"gt_parse": '), F.col(gt_col), F.lit("}")).alias(
            "ground_truth"
        ),
    )
    out.select(F.to_json(F.struct("file_name", "ground_truth")).alias("value")).write.mode(
        mode
    ).text(path)


def read_metadata_jsonl(spark: SparkSession, path: str) -> DataFrame:
    """Read a metadata.jsonl dataset back into (file_name, gt_candidates).

    Reference parity (`donut/util.py:75-82`): the double-encoded
    ``ground_truth`` envelope either carries ``gt_parses`` — a LIST of
    acceptable parses (e.g. DocVQA multi-annotator answers) — or a single
    ``gt_parse`` dict; the single form is normalized to a 1-element
    candidate list so every consumer scores best-of-candidates.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.types import StringType, StructField, StructType

    from ..functions.udfs import gt_candidates_udf

    envelope_schema = StructType(
        [
            StructField("file_name", StringType()),
            StructField("ground_truth", StringType()),
        ]
    )
    lines = spark.read.text(path)
    rows = lines.select(
        F.from_json(F.col("value"), envelope_schema).alias("r")
    ).select("r.file_name", "r.ground_truth")
    return rows.select(
        "file_name", gt_candidates_udf("ground_truth").alias("gt_candidates")
    )


def deterministic_split(
    df: DataFrame, weights: list, key: str = "doc_id", seed: int = 42
):
    """Train/val/test split (U3): the reference uses cumulative-ratio
    `np.random.rand()` (`synthdog/template.py:42-44,94-99`); ours is a
    deterministic hash split — stable across runs, cluster sizes, and
    re-partitioning, which `randomSplit` is not."""
    from pyspark.sql import functions as F

    total = sum(weights)
    n_buckets = 1000
    bucket = F.pmod(F.xxhash64(F.col(key), F.lit(seed)), F.lit(n_buckets))
    splits = []
    lo, cum = 0, 0.0
    for i, w in enumerate(weights):
        cum += w
        # CUMULATIVE boundaries, last pinned to n_buckets: per-weight
        # rounding (e.g. [1,1,1] → 333+333+333) would leave bucket 999
        # in NO split — silent row loss; cumulative rounding partitions
        # the bucket space exactly, every row lands in exactly one split
        hi = n_buckets if i == len(weights) - 1 else int(
            round(cum / total * n_buckets)
        )
        splits.append(df.filter((bucket >= lo) & (bucket < hi)))
        lo = hi
    return splits


def read_documents_any(
    spark: SparkSession, path: str, fmt: Optional[str] = None
) -> DataFrame:
    """Format-dispatching reader for a documents-shaped table
    ``(doc_id, text, ...)`` — crawl dumps arrive as JSONL or CSV as
    often as parquet. ``fmt`` overrides; otherwise the extension
    decides. JSONL uses Spark's native json source (schema inference
    bounded by samplingRatio at corpus scale is the caller's knob —
    pass an explicit schema table for 10^12 rows); CSV is read with
    header + escapes suitable for embedded newlines in text columns.
    """
    fmt = fmt or (
        "jsonl"
        if path.endswith((".jsonl", ".json", ".jsonl.gz", ".json.gz"))
        else "csv"
        if path.endswith((".csv", ".csv.gz"))
        else "parquet"
    )
    if fmt == "jsonl":
        return spark.read.json(path)
    if fmt == "csv":
        return (
            spark.read.option("header", "true")
            .option("multiLine", "true")
            .option("escape", '"')
            .option("inferSchema", "true")
            .csv(path)
        )
    return spark.read.parquet(path)
