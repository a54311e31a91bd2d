#!/usr/bin/env python
"""OOD recall measurement for the pruned ANN probes (BENCH/r4_sf1.md §2,
round-4 verdict item 5).

Near-isotropic synthetic embeddings are the adversarial case for any
pruned probe: affinity profiles are flat, so recall tracks row coverage.
This tool measures recall@k AND the row coverage that bought it, for the
IVF-ADC layout across probe/rerank disciplines:

    python tools/ood_recall.py [sf_dir] [n_centroids] [k]

Query set (deterministic): one anti-centroid direction per 4th centroid
(far from every cell core by construction) + 4 seeded random unit
vectors. Prints one JSON line per configuration:
{"config": ..., "min_recall": ..., "mean_recall": ..., "coverage": {...}}

Coverage = rows in probed cells / table rows (the fraction of the corpus
the probe's partition-pruned scan reads); the exact-rerank rows are
bounded separately by rerank × max_rerank_factor.
"""

import json
import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, "/root/repo")


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
    n_cent = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 20
    probe_override = int(sys.argv[4]) if len(sys.argv) > 4 else None

    from pyspark.sql import functions as F

    from donut_spark.operators.ann_index import (
        _read_meta,
        probe_ivfadc_index,
        write_ivfadc_index,
    )
    from donut_spark.operators.similarity import (
        _unit_rows,
        adaptive_probe_cells,
        cosine_topk,
    )
    from donut_spark.sources.session import get_spark

    spark = get_spark(cores=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    emb = spark.read.parquet(f"{sf}/embeddings.parquet")
    n_rows = emb.count()
    path = os.path.join(
        tempfile.gettempdir(), f"ood_ivfadc_{os.path.basename(sf)}_{n_cent}"
    )
    write_ivfadc_index(emb, path, n_centroids=n_cent, m=8, k=64)
    meta = _read_meta(spark, path)
    cents = np.asarray(meta["centroids"], dtype="float64")
    cn = _unit_rows(cents)
    cell_sizes = {
        r["_cell"]: r["n"]
        for r in spark.read.parquet(os.path.join(path, "cells"))
        .groupBy("_cell")
        .agg(F.count("*").alias("n"))
        .collect()
    }

    rng = np.random.default_rng(99)
    queries = [
        (-cents[c] / np.linalg.norm(cents[c])).tolist()
        for c in range(0, n_cent, max(1, n_cent // 8))
    ][:8]
    dim = cents.shape[1]
    queries += [
        (v / np.linalg.norm(v)).tolist() for v in rng.standard_normal((4, dim))
    ]
    brute = [
        {r.vec_id for r in cosine_topk(emb, q, k=k).collect()} for q in queries
    ]

    # base 25% of cells; adaptive widening caps at 2× → worst case 50%
    # row coverage on ~uniform cells (the verdict's coverage budget).
    # argv[4] overrides (e.g. 8 at 16 cells = BENCH/r4_sf1.md's regime).
    base_probe = probe_override or max(1, n_cent // 4)
    configs = [
        ("fixed", dict(n_probe=base_probe, rerank=100)),
        ("multiprobe", dict(n_probe=base_probe, rerank=100, multiprobe_margin=0.10)),
        ("rerank_esc", dict(n_probe=base_probe, rerank=100, rerank_margin=0.10)),
        (
            "multiprobe+rerank_esc",
            dict(
                n_probe=base_probe,
                rerank=100,
                multiprobe_margin=0.10,
                rerank_margin=0.10,
            ),
        ),
        # wider escalation cap: how much of the ceiling the margin rule
        # can buy before the coverage bound takes over
        (
            "rerank_esc_cap16",
            dict(
                n_probe=base_probe,
                rerank=100,
                rerank_margin=0.10,
                max_rerank_factor=16.0,
            ),
        ),
        # the coverage-limited CEILING: exact-rerank every probed row.
        # Whatever recall this loses is neighbor mass in UNPROBED cells
        # — unpurchasable by any rerank policy, only by coverage. The
        # gap between rerank_esc and this line is the ADC mis-ranking
        # loss the escalation is meant to recover.
        ("exact_ceiling", dict(n_probe=base_probe, rerank=n_rows)),
    ]
    for name, kw in configs:
        recalls, covers = [], []
        for q, truth in zip(queries, brute):
            got = {
                r.vec_id
                for r in probe_ivfadc_index(spark, path, emb, q, k=k, **kw).collect()
            }
            recalls.append(len(got & truth) / k)
            qn = np.asarray(q) / np.linalg.norm(q)
            if kw.get("multiprobe_margin") is None:
                order = np.argsort(-(cn @ qn), kind="stable")
                cells = [int(c) for c in order[: kw["n_probe"]]]
            else:
                cells = adaptive_probe_cells(
                    cn, qn, kw["n_probe"], kw["multiprobe_margin"]
                )
            covers.append(sum(cell_sizes.get(c, 0) for c in cells) / n_rows)
        print(
            json.dumps(
                {
                    "config": name,
                    "params": kw,
                    "n_centroids": n_cent,
                    "rows": n_rows,
                    "k": k,
                    "min_recall": min(recalls),
                    "mean_recall": round(sum(recalls) / len(recalls), 4),
                    "coverage_mean": round(sum(covers) / len(covers), 4),
                    "coverage_max": round(max(covers), 4),
                }
            )
        )


if __name__ == "__main__":
    main()
