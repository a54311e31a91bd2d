#!/usr/bin/env python
"""Stage an sf1-equivalent dataset: 10x the sf0.1 tables, synthesized
deterministically (no external data) for the scale-up bench
(BENCH/r3_sf1.md — VERDICT round-2 task 8).

Replication scheme (DuckDB, no JVM):

* fact tables get 10 copies with remapped primary keys;
* ``documents`` copies 1-9 get a deterministic ``' v<i>'`` text suffix —
  a verbatim 10x replication would plant a 10x exact-duplicate cluster
  under every doc and turn the dedup benchmarks into hot-bucket-cap
  stress tests instead of scale-up measurements;
* ``embeddings`` copies rotate the vector by ``i`` positions
  (norm-preserving, direction-changing) for the same reason;
* ``events`` keeps user_id so per-user windows deepen 10x (the realistic
  growth axis for q07);
* dimension tables (customer/supplier/part/nation/region) stay single —
  fact/dim fanout grows 10x, which is what a real scale-up does.
"""

import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
COPIES = 10
BIG = 100_000_000


def main() -> None:
    dst = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    series = f"generate_series(0, {COPIES - 1}) g(i)"

    def stage(name: str, select: str) -> None:
        out = f"{dst}/{name}.parquet"
        con.execute(f"COPY ({select}) TO '{out}' (FORMAT parquet)")
        n = con.execute(f"SELECT count(*) FROM read_parquet('{out}')").fetchone()[0]
        print(f"{name}: {n} rows")

    stage(
        "documents",
        f"""
        SELECT doc_id + i * 1000000 AS doc_id,
               CASE WHEN i = 0 THEN text ELSE text || ' v' || i END AS text,
               lang, source, n_chars
        FROM read_parquet('{SRC}/documents.parquet'), {series}
        """,
    )
    stage(
        "embeddings",
        f"""
        SELECT vec_id + i * 1000000 AS vec_id,
               list_concat(embedding[i + 1 :], embedding[1 : i]) AS embedding,
               label
        FROM read_parquet('{SRC}/embeddings.parquet'), {series}
        """,
    )
    stage(
        "lineitem",
        f"""
        SELECT * REPLACE (l_orderkey + i * {BIG} AS l_orderkey)
        FROM read_parquet('{SRC}/lineitem.parquet'), {series}
        """,
    )
    stage(
        "orders",
        f"""
        SELECT * REPLACE (o_orderkey + i * {BIG} AS o_orderkey)
        FROM read_parquet('{SRC}/orders.parquet'), {series}
        """,
    )
    stage(
        "events",
        f"""
        SELECT * REPLACE (event_id + i * {BIG} AS event_id)
        FROM read_parquet('{SRC}/events.parquet'), {series}
        """,
    )
    for dim in ("customer", "supplier", "part", "nation", "region"):
        stage(dim, f"SELECT * FROM read_parquet('{SRC}/{dim}.parquet')")
    print(f"staged sf1-equivalent at {dst}")


if __name__ == "__main__":
    main()
