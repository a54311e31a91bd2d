#!/usr/bin/env python
"""Streaming rate bench (round-4 verdict item 7): sustained docs/s and
state size for the two ingest-path streaming operators —

* ``streaming_contamination`` — stateless broadcast-shingle leak flag
  (the 10^12-doc scale shape: corpus side never shuffles, no state);
* ``streaming_exact_dedup`` — ``dropDuplicatesWithinWatermark`` bounded
  state (the property that keeps a 10^12-doc ingest dedup alive: state
  is O(distinct fingerprints per watermark horizon), NOT O(history)).

Staging: the sf documents table is replicated ``copies`` times into one
file-stream directory; copy ``i`` carries event time base+``i`` minutes
and per-file mtimes are forced strictly increasing so the file source
consumes copies in event-time order — each micro-batch advances the
watermark, which is exactly what makes dedup state eviction observable
in a short run. Copies keep the SAME text, so every re-arrival inside
the watermark horizon is a true duplicate for the dedup leg.

Evidence recorded per leg: per-batch input rows, batch durations,
processed docs/s, and (dedup) ``stateOperators.numRowsTotal`` per
micro-batch. "Flat state" = the last 3 batches' state row counts stay
within 25% of each other while input keeps arriving — the signature
that eviction keeps pace with insertion.

Standalone: ``python bench_streaming.py [sf_dir]`` prints one JSON
line. ``bench.py`` embeds ``run(spark, sf_dir)`` under a ``streaming``
key (excluded from the battery total).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time


def stage_stream_input(
    spark, sf_dir: str, out_dir: str, copies: int = 6, files_per_copy: int = 4
) -> int:
    """Write ``copies`` time-staggered copies of the documents table as
    a file-stream source directory; returns total staged rows. Each
    copy's files get a strictly later mtime (the file source orders by
    modification time, and ties would let a late-event-time file jump
    ahead, advance the watermark, and spuriously drop earlier copies as
    late data)."""
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        F.col("doc_id").cast("string").alias("doc_id"), "text"
    )
    n = docs.count()
    base = int(time.time()) - copies * 2
    for i in range(copies):
        (
            docs.withColumn("copy", F.lit(i))
            .withColumn(
                "ts",
                F.to_timestamp(F.lit("2024-01-01 00:00:00"))
                + F.make_interval(mins=F.lit(i)),
            )
            .repartition(files_per_copy)
            .write.mode("append")
            .parquet(out_dir)
        )
        # force per-copy mtime ordering (second granularity is enough;
        # the writes above all land within the same second otherwise)
        for f in os.listdir(out_dir):
            p = os.path.join(out_dir, f)
            if f.endswith(".parquet") and os.path.getmtime(p) > base + i:
                os.utime(p, (base + i, base + i))
    return n * copies


def _drain(query) -> list:
    """Block until the bounded file source is fully consumed, capture
    progress, then stop (capture BEFORE stop — stopping mid-trigger can
    drop the trailing progress event); returns batches with input."""
    query.processAllAvailable()
    final = [json.loads(p.json) for p in query.recentProgress]
    query.stop()
    query.awaitTermination(30)
    return [p for p in final if p.get("numInputRows", 0) > 0]


def _leg_metrics(batches: list, distinct_per_horizon: int | None = None) -> dict:
    rows = sum(b["numInputRows"] for b in batches)
    busy_s = (
        sum(b["durationMs"].get("triggerExecution", 0) for b in batches) / 1000.0
    )
    out = {
        "batches": len(batches),
        "rows": rows,
        "busy_sec": round(busy_s, 3),
        "docs_per_sec": round(rows / busy_s, 2) if busy_s else None,
        "input_rows_per_batch": [b["numInputRows"] for b in batches],
    }
    states = [
        b["stateOperators"][0]["numRowsTotal"]
        for b in batches
        if b.get("stateOperators")
    ]
    if states:
        out["state_rows_per_batch"] = states
        if distinct_per_horizon:
            # the bounded-state claim: state never exceeds the distinct
            # fingerprints inside ONE watermark horizon (entries expire
            # arrival-ts + delay, so the series CYCLES — e.g.
            # 500,500,500,500,0,500 — rather than growing toward the
            # total staged row count, which is what an unbounded
            # dropDuplicates would do)
            out["state_bound_distinct"] = distinct_per_horizon
            out["state_max"] = max(states)
            out["state_bounded"] = max(states) <= 1.1 * distinct_per_horizon
    return out


def run(spark, sf_dir: str, copies: int = 6, max_files_per_trigger: int = 4) -> dict:
    from pyspark.sql.types import (
        IntegerType,
        StringType,
        StructField,
        StructType,
        TimestampType,
    )

    from donut_spark.operators.dedup import benchmark_shingle_set
    from donut_spark.streaming.stream import (
        streaming_contamination,
        streaming_exact_dedup,
    )

    work = tempfile.mkdtemp(prefix="stream_bench_")
    src = os.path.join(work, "src")
    staged = stage_stream_input(spark, sf_dir, src, copies=copies)
    distinct = staged // copies  # copies repeat the same texts
    schema = StructType(
        [
            StructField("doc_id", StringType()),
            StructField("text", StringType()),
            StructField("copy", IntegerType()),
            StructField("ts", TimestampType()),
        ]
    )
    # benchmark side of the contamination sweep: a small held-out slice
    # of the same corpus (the realistic shape — eval sets leak from the
    # same distribution they were drawn from)
    bench_docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("text")
        .limit(50)
    )
    shingles = benchmark_shingle_set(bench_docs, n=8)

    results: dict = {"staged_rows": staged, "copies": copies}
    try:
        for name, build in (
            ("contamination", lambda s: streaming_contamination(s, shingles)),
            ("exact_dedup", lambda s: streaming_exact_dedup(s, watermark="90 seconds")),
        ):
            stream = (
                spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", max_files_per_trigger)
                .parquet(src)
            )
            q = (
                build(stream)
                .writeStream.format("noop")
                .option("checkpointLocation", os.path.join(work, f"ckpt_{name}"))
                .trigger(processingTime="500 milliseconds")
                .start()
            )
            batches = _drain(q)
            results[name] = _leg_metrics(
                batches, distinct if name == "exact_dedup" else None
            )
    finally:
        shutil.rmtree(work, ignore_errors=True)
    return results


def main() -> None:
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from donut_spark.sources.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    spark = get_spark(cores=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    out = run(spark, sf_dir)
    out["sf_dir"] = sf_dir
    print(json.dumps(out))


if __name__ == "__main__":
    main()
