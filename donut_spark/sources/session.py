"""SparkSession factory tuned for this engine.

Single place where execution-relevant settings live so that tests, the
driver contract (`__spark_entry__.py`), and `bench.py` all run the same
plan shape. The settings are chosen for the 100 TB design point and
scale down to local mode:

* AQE on — runtime coalescing + skew-join splitting replaces hand-tuned
  shuffle partition counts at every scale.
* Arrow enabled with a bounded batch size — our rows carry long HTML
  strings and span arrays; unbounded 10k-row Arrow batches would blow
  executor memory on the media-heavy tail (SURVEY.md §4).
* Explicit shuffle-partition default sized for local runs; a cluster
  deployment overrides via spark-submit conf, and AQE coalesces down.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

__all__ = ["get_spark", "ENGINE_CONF"]

ENGINE_CONF = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # long HTML strings / span arrays: bound Arrow batch memory
    "spark.sql.execution.arrow.maxRecordsPerBatch": "1024",
    # parquet scan granularity; 128 MiB is the large-cluster sweet spot
    "spark.sql.files.maxPartitionBytes": "134217728",
    "spark.sql.autoBroadcastJoinThreshold": "64m",
    "spark.sql.session.timeZone": "UTC",
    "spark.ui.enabled": "false",
    "spark.driver.memory": "8g",
}


def get_spark(cores: int | None = None, app_name: str = "donut_spark", **overrides) -> SparkSession:
    """Build (or reuse) a SparkSession.

    ``cores`` defaults to ``$SPARK_GRAFT_CPUS`` then all cores. Shuffle
    partitions default to the core count (right for local mode; clusters
    override and AQE coalesces).
    """
    if cores is None:
        cores = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or os.cpu_count() or 4
    builder = SparkSession.builder.master(f"local[{cores}]").appName(app_name)
    conf = dict(ENGINE_CONF)
    conf.setdefault("spark.sql.shuffle.partitions", str(max(cores, 8)))
    conf.update(overrides)
    for key, value in conf.items():
        builder = builder.config(key, value)
    return builder.getOrCreate()
