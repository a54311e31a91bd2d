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

__all__ = ["TABLES", "read_table", "write_table", "default_sf_dir"]

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def default_sf_dir() -> str:
    return os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def read_table(spark: SparkSession, name: str, sf_dir: Optional[str] = None) -> DataFrame:
    """Load a named table.

    Resolution order: Iceberg catalog table ``donut.<name>`` if an
    Iceberg catalog is configured on the session; else
    ``<sf_dir>/<name>.parquet``.
    """
    if spark.conf.get("spark.sql.catalog.donut", None):
        return spark.read.format("iceberg").load(f"donut.{name}")
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
