"""10x scale probe for sub-document passage dedup.

Generates a synthetic corpus with a fixed duplication profile (uniform
draws over a small vocabulary + a 5% slice sharing one of 20 sixteen-
token boilerplate prefixes — so both the sparse-collision tail and
doc_freq≈125 hot shingles are present) at 5,000 and 50,000 docs, then
times ``duplicated_passages`` at both sizes on the same session.
Generation is deterministic (xxhash64 of doc_id) and fully JVM-side.

The plan is scan → shingle positions (evaluated on both sides) →
distinct/count → hash join → one window exchange, so per-doc cost
must stay near-flat with row count — the 10^12-doc argument for the
operator, measured rather than asserted.

Usage: python tools/passage_scale_probe.py   (paste the JSON line into
BENCH/BASELINE.md)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

WORK = "/tmp/passage_scale_probe"

VOCAB = (
    "key agg row scan slow fast table value part hash merge batch line "
    "sort window spark order data column join small customer query big "
    "vector group filter the a stream stage shuffle plan index cache "
    "disk node executor task"
).split()

_TEMPLATE_WORDS = (
    "copyright notice all material on this page remains property of the "
    "original publisher and may not be reproduced without permission "
    "terms conditions privacy cookie policy contact subscribe newsletter"
).split()


def _templates():
    # 20 overlapping 16-token windows over the template word pool —
    # distinct prefixes that still share sub-runs (realistic boilerplate)
    pool = _TEMPLATE_WORDS * 3
    return [" ".join(pool[i : i + 16]) for i in range(20)]


def synth_docs(spark, n: int):
    from pyspark.sql import functions as F

    v = F.array(*[F.lit(w) for w in VOCAB])
    t = F.array(*[F.lit(x) for x in _templates()])
    df = spark.range(n).select(F.col("id").cast("string").alias("doc_id"))
    length = F.lit(40) + F.pmod(F.xxhash64("doc_id"), F.lit(30))
    words = F.transform(
        F.sequence(F.lit(1), length),
        lambda j: F.element_at(
            v,
            (
                F.pmod(F.xxhash64(F.col("doc_id"), j), F.lit(len(VOCAB))) + 1
            ).cast("int"),
        ),
    )
    body = F.concat_ws(" ", words)
    prefix = F.element_at(
        t,
        (
            F.pmod(F.xxhash64(F.col("doc_id"), F.lit(7)), F.lit(20)) + 1
        ).cast("int"),
    )
    text = F.when(
        F.pmod(F.xxhash64(F.col("doc_id"), F.lit(13)), F.lit(20)) == 0,
        F.concat(prefix, F.lit(" "), body),
    ).otherwise(body)
    return df.select("doc_id", text.alias("text"))


def main() -> None:
    from pyspark.sql import functions as F

    from donut_spark.operators.dedup import duplicated_passages
    from donut_spark.sources.session import get_spark

    spark = get_spark(cores=32)
    spark.sparkContext.setLogLevel("ERROR")

    paths = {}
    for name, n in (("1x", 5_000), ("10x", 50_000)):
        path = f"{WORK}/docs_{name}"
        if not os.path.exists(f"{path}/_SUCCESS"):
            synth_docs(spark, n).repartition(64, "doc_id").write.mode(
                "overwrite"
            ).parquet(path)
        paths[name] = path

    out = {}
    for name, path in paths.items():
        docs = spark.read.parquet(path)
        docs.count()  # warm footers
        best = float("inf")
        rowstat = None
        for _ in range(2):
            t0 = time.perf_counter()
            rowstat = (
                duplicated_passages(docs, n=8)
                .agg(
                    F.count("*").alias("passages"),
                    F.sum("n_tokens").alias("dup_tokens"),
                    F.max("max_doc_freq").alias("hottest"),
                )
                .collect()[0]
            )
            best = min(best, time.perf_counter() - t0)
        n_docs = docs.count()
        out[name] = {
            "docs": n_docs,
            "passages": int(rowstat["passages"]),
            "dup_tokens": int(rowstat["dup_tokens"]),
            "hottest_doc_freq": int(rowstat["hottest"]),
            "wall_sec": round(best, 3),
            "docs_per_sec": round(n_docs / best, 1),
        }
    ratio = (out["10x"]["wall_sec"] / out["10x"]["docs"]) / (
        out["1x"]["wall_sec"] / out["1x"]["docs"]
    )
    out["per_doc_cost_ratio_10x_vs_1x"] = round(ratio, 3)
    import bench

    out["calibration"] = bench.calibrate()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
