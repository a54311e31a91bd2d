"""Local replica of the driver's correctness gate: run every Spark query
that has a DuckDB oracle twin, compare rows / schema / values exactly.

Usage: python tools/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys

import duckdb
import pandas as pd

sys.path.insert(0, "/root/repo")


def compare(name: str, sdf: pd.DataFrame, odf: pd.DataFrame) -> str:
    if len(sdf) != len(odf):
        return f"ROWS {len(sdf)} vs {len(odf)}"
    if sorted(sdf.columns) != sorted(odf.columns):
        return f"SCHEMA {sorted(sdf.columns)} vs {sorted(odf.columns)}"
    cols = sorted(sdf.columns)
    s = sdf[cols].sort_values(cols).reset_index(drop=True)
    o = odf[cols].sort_values(cols).reset_index(drop=True)
    try:
        pd.testing.assert_frame_equal(s, o, check_dtype=False, check_exact=True)
    except AssertionError as exc:
        diff = s.compare(o) if s.shape == o.shape else None
        return f"VALUES: {exc}\n{diff.head(5) if diff is not None else ''}"
    return "OK"


def main() -> int:
    import __spark_entry__ as e
    from donut_spark.sources.fixtures import (
        materialize_fingerprints,
        materialize_spans,
        materialize_srp_planes,
    )
    from donut_spark.sources.session import get_spark

    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark(cores=8)
    fx = materialize_spans(spark, sf)
    fp = materialize_fingerprints(sf)
    planes = materialize_srp_planes()

    con = duckdb.connect()
    for t in e.ORACLE_TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")

    oracles = e._oracle_sql_for(f"{fx}/*.parquet", fp=fp, planes=planes)
    queries = e.queries()
    unknown = only - set(oracles)
    if unknown:
        # a typo'd filter must not produce an all-green report of zero runs
        print(f"unknown query name(s): {sorted(unknown)}")
        return 2

    failed = []
    ran = 0
    for name, sql in oracles.items():
        if only and name not in only:
            continue
        ran += 1
        try:
            sdf = queries[name](spark, sf).toPandas()
            odf = con.execute(sql).df()
            verdict = compare(name, sdf, odf)
        except Exception as exc:  # noqa: BLE001
            verdict = f"ERROR {type(exc).__name__}: {exc}"
        status = "PASS" if verdict == "OK" else "FAIL"
        print(f"{status}  {name}: {verdict if verdict != 'OK' else ''}".rstrip())
        if status == "FAIL":
            failed.append(name)
    # report what RAN, never counting skipped queries as green
    print(f"\n{ran - len(failed)}/{ran} oracle-backed queries green"
          + (f" ({len(oracles) - ran} not run)" if ran < len(oracles) else ""))
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
