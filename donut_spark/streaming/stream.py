"""Streaming extraction (SURVEY.md §2.10).

The reference is pure batch; the closest streaming analogue is its
infinite online synthesizer (`donut/util.py:453-502`). The per-document
pipeline is stateless projection + UDFs, so the streaming variant needs
no watermarks or stateful operators: any micro-batch source works with
the identical column pipeline. Provided for incremental ingest
(Iceberg incremental reads / file streams in production; a file stream
or rate source here).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.extract import extract_documents
from ..sources.fixtures import SPANS_TABLE_SCHEMA

__all__ = ["stream_extract_from_files", "windowed_event_counts"]


def stream_extract_from_files(
    spark: SparkSession, input_dir: str, max_files_per_trigger: int = 4
) -> DataFrame:
    """File-stream source of spans-table parquet → streaming extraction.

    Returns a streaming DataFrame; attach a sink with
    ``.writeStream.format("parquet").option("checkpointLocation", ...)``
    — the checkpoint gives exactly-once per micro-batch, the streaming
    twin of `operators/checkpoint.py`.
    """
    source = (
        spark.readStream.schema(SPANS_TABLE_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )
    return extract_documents(source, mode="doc")


def windowed_event_counts(
    events: DataFrame, window: str = "1 minute", watermark: str = "2 minutes"
) -> DataFrame:
    """Late-data-tolerant windowed aggregation over the events stream —
    the streaming analogue of the A1 grouped means."""
    from pyspark.sql import functions as F

    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window), F.col("event_type"))
        .agg(F.count("*").alias("n"), F.sum("value").alias("sum_value"))
    )
