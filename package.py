#!/usr/bin/env python
"""Build the spark-submit shipping artifact: dist/donut_spark.zip.

The zip contains the pure-Python ``donut_spark`` package (no data, no
tests) and is what a cluster deployment passes via

    spark-submit --py-files dist/donut_spark.zip submit/run_extract.py ...

Executors zipimport the package; nothing else needs to be installed on
the cluster (pyspark/pyarrow/pandas/numpy are cluster-provided).
"""

from __future__ import annotations

import os
import zipfile

ROOT = os.path.dirname(os.path.abspath(__file__))


def build(out_path: str | None = None) -> str:
    out_path = out_path or os.path.join(ROOT, "dist", "donut_spark.zip")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    pkg = os.path.join(ROOT, "donut_spark")
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for dirpath, dirnames, filenames in os.walk(pkg):
            dirnames[:] = [d for d in dirnames if d != "__pycache__"]
            for name in sorted(filenames):
                if not name.endswith(".py"):
                    continue
                full = os.path.join(dirpath, name)
                rel = os.path.relpath(full, ROOT)
                zf.write(full, rel)
    return out_path


if __name__ == "__main__":
    print(build())
