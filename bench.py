#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]; prints ONE JSON line.

The headline metric is flagship extraction throughput (docs/sec) — the
BASELINE.json target — plus per-query wall times for the operator
battery. Run with SPARK_GRAFT_CPUS=8 and =32 on the same input to
measure scaling efficiency (see BENCH/BASELINE.md and bench_scaling.py).
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import functions as F


HEADLINE = [
    # (name, builder) — builders imported lazily from __spark_entry__
    "q01_filter_project",
    "q02_group_agg",
    "q03_broadcast_join",
    "q04_multi_join",
    "q07_window_first",
    "q15_exact_dup_clusters",
    "q24_minhash_dedup",
    "q25_simhash_dedup",
    "q27_ann_topk",
    "q28_ann_lsh",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from donut_spark.sources.session import get_spark

    import __spark_entry__ as entry_mod

    spark = get_spark(cores=cpus, app_name="donut_spark_bench")
    spark.sparkContext.setLogLevel("ERROR")

    # warm the JVM + parquet footers once
    spark.read.parquet(f"{sf_dir}/documents.parquet").count()

    results: dict[str, float] = {}
    queries = entry_mod.queries()

    # flagship extraction throughput (the BASELINE.json metric);
    # min-of-2 because this host shows transient multi-x slowdown bursts
    # (BENCH/BASELINE.md) — the first run also warms the UDF worker pool
    from donut_spark.operators.extract import run_flagship

    flagship_sec = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        flag = run_flagship(spark, sf_dir, mode="doc")
        agg = flag.agg(
            F.count("*").alias("docs"),
            F.avg("exact_match").alias("em"),
            F.avg("roundtrip_ok").alias("rt"),
        ).collect()[0]
        flagship_sec = min(flagship_sec, time.perf_counter() - t0)
    results["flagship_extract"] = round(flagship_sec, 3)
    docs_per_sec = agg["docs"] / flagship_sec

    # min-of-2 for every battery query, same rationale as the flagship:
    # single-shot numbers on this host conflate plan cost with transient
    # multi-x VM slowdown bursts. The DataFrame is REBUILT each pass —
    # re-collecting the same object would reuse AQE-materialized shuffle
    # stages and under-report.
    for name in HEADLINE:
        q = queries[name]
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            df = q(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        results[name] = round(best, 3)

    total = sum(results.values())
    print(
        json.dumps(
            {
                "metric": "total wall time: flagship extraction + operator battery",
                "value": round(total, 3),
                "unit": "sec",
                "queries": results,
                "sf": sf_dir,
                "cpus": cpus,
                "docs": int(agg["docs"]),
                "docs_per_sec": round(docs_per_sec, 2),
                "exact_match_rate": float(agg["em"]),
                "roundtrip_rate": float(agg["rt"]),
            }
        )
    )


if __name__ == "__main__":
    main()
