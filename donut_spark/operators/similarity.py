"""Similarity search over embedding columns (``array<float>``).

Two paths:

* :func:`cosine_topk` — brute-force exact top-k against a query vector.
  The dot product / norms are pure JVM higher-order functions
  (``zip_with`` + ``aggregate``) inside whole-stage codegen — no Python
  in the hot path — followed by a top-k sort (Spark's ``orderBy.limit``
  lowers to TakeOrderedAndProject, a per-partition heap + driver merge,
  no full sort). This is the correctness baseline and is already the
  right plan for one-off queries at any scale.

* :func:`hyperplane_lsh_topk` — random-hyperplane (SRP) LSH: sign-bit
  signatures via one vectorized numpy matmul per Arrow batch, candidates
  = rows whose signature matches the query's in any band, exact rerank
  only on candidates. Sub-linear probe cost at 10^12 rows; recall is
  tunable via (n_bits, bands).

* :func:`embedding_near_dup_pairs` — cosine near-duplicate pairs over
  the whole table via the same SRP bucketing (self-join on band
  signature), exact cosine verify on candidates.
"""

from __future__ import annotations

from typing import List, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, IntegerType

__all__ = [
    "cosine_expr",
    "cosine_topk",
    "hyperplane_lsh_topk",
    "ivf_topk",
    "embedding_near_dup_pairs",
]


def _vec_lit(vec: Sequence[float]) -> Column:
    return F.array(*[F.lit(float(v)) for v in vec])


def cosine_expr(col: str, vec: Sequence[float]) -> Column:
    """JVM-side cosine similarity between an array<float> column and a
    literal query vector (zip_with dot product / aggregate norms)."""
    q = _vec_lit(vec)
    qnorm = float(np.linalg.norm(np.asarray(vec, dtype="float64")))
    dot = F.aggregate(
        F.zip_with(F.col(col), q, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    norm = F.sqrt(
        F.aggregate(F.col(col), F.lit(0.0), lambda acc, x: acc + x * x)
    )
    return dot / (norm * F.lit(qnorm))


def cosine_topk(
    df: DataFrame,
    query_vec: Sequence[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact brute-force cosine top-k (TakeOrderedAndProject plan)."""
    return (
        df.select(
            F.col(id_col),
            cosine_expr(vec_col, query_vec).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), F.col(id_col))
        .limit(k)
    )


def _srp_planes(dim: int, n_bits: int, seed: int) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.normal(size=(dim, n_bits)).astype("float64")


def _srp_sig_udf(dim: int, n_bits: int, bands: int, seed: int):
    planes = _srp_planes(dim, n_bits, seed)
    rows = n_bits // bands

    @F.pandas_udf(ArrayType(IntegerType()))
    def sig(vec: pd.Series) -> pd.Series:
        mat = np.stack(vec.to_numpy())  # (batch, dim) — one matmul per Arrow batch
        bits = (mat @ planes) > 0  # (batch, n_bits)
        weights = (1 << np.arange(rows)).astype("int64")
        out = []
        for row in bits:
            out.append(
                [int(row[b * rows : (b + 1) * rows] @ weights) for b in range(bands)]
            )
        return pd.Series(out)

    return sig


def hyperplane_lsh_topk(
    df: DataFrame,
    query_vec: Sequence[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_bits: int = 32,
    bands: int = 8,
    seed: int = 13,
) -> DataFrame:
    """Approximate top-k: SRP band match → exact cosine rerank.

    Candidates are rows sharing at least one band signature with the
    query; the final ordering is exact cosine on that reduced set.
    """
    if n_bits % bands:
        raise ValueError("bands must divide n_bits")
    dim = len(query_vec)
    sig_udf = _srp_sig_udf(dim, n_bits, bands, seed)

    q = np.asarray(query_vec, dtype="float64")
    planes = _srp_planes(dim, n_bits, seed)
    qbits = (q @ planes) > 0
    rows = n_bits // bands
    weights = (1 << np.arange(rows)).astype("int64")
    qsig = [int(qbits[b * rows : (b + 1) * rows] @ weights) for b in range(bands)]

    sigged = df.withColumn("_sig", sig_udf(F.col(vec_col)))
    candidates = sigged.filter(
        F.arrays_overlap(
            F.expr(f"transform(_sig, (s, i) -> struct(i as band, s as v))"),
            F.array(*[
                F.struct(F.lit(i).alias("band"), F.lit(v).alias("v"))
                for i, v in enumerate(qsig)
            ]),
        )
    )
    return cosine_topk(candidates, query_vec, k, vec_col, id_col)


def _ivf_centroids(
    df: DataFrame, n_centroids: int, vec_col: str, id_col: str, iters: int = 3
) -> np.ndarray:
    """Deterministic IVF codebook: seed centroids from an id-ordered
    sample, then a few Lloyd iterations on a bounded driver-side sample.

    At 10^12 rows the codebook is still tiny (k × dim floats) — training
    on a sample and broadcasting is the standard IVF recipe; assignment
    stays fully distributed."""
    sample = np.stack(
        [
            r[0]
            for r in df.select(vec_col)
            .orderBy(id_col)
            .limit(max(n_centroids * 40, 512))
            .collect()
        ]
    ).astype("float64")
    centroids = sample[:: max(len(sample) // n_centroids, 1)][:n_centroids]
    for _ in range(iters):
        # cosine assignment on normalized vectors
        sn = sample / np.linalg.norm(sample, axis=1, keepdims=True)
        cn = centroids / np.linalg.norm(centroids, axis=1, keepdims=True)
        assign = (sn @ cn.T).argmax(axis=1)
        for k in range(len(centroids)):
            members = sample[assign == k]
            if len(members):
                centroids[k] = members.mean(axis=0)
    return centroids


def ivf_topk(
    df: DataFrame,
    query_vec: Sequence[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_centroids: int = 16,
    n_probe: int = 4,
    seed_iters: int = 3,
) -> DataFrame:
    """IVF (inverted-file) ANN: coarse-quantize every vector to its
    nearest centroid (one vectorized matmul per Arrow batch), probe the
    ``n_probe`` centroids nearest the query, exact-rerank only those
    cells.

    The 10^12-row deployment partitions/buckets the table BY ``_cell``
    at write time so a probe prunes partitions at the scan (cell id is
    deterministic, so the layout is reproducible); here the cell filter
    expresses the same pruning."""
    centroids = _ivf_centroids(df, n_centroids, vec_col, id_col, seed_iters)
    cn = centroids / np.linalg.norm(centroids, axis=1, keepdims=True)

    @F.pandas_udf(IntegerType())
    def cell_of(vec: pd.Series) -> pd.Series:
        mat = np.stack(vec.to_numpy()).astype("float64")
        mat = mat / np.clip(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12, None)
        return pd.Series((mat @ cn.T).argmax(axis=1).astype("int32"))

    q = np.asarray(query_vec, dtype="float64")
    qn = q / max(np.linalg.norm(q), 1e-12)
    probe_cells = [int(c) for c in np.argsort(-(cn @ qn))[:n_probe]]

    candidates = df.withColumn("_cell", cell_of(F.col(vec_col))).filter(
        F.col("_cell").isin(probe_cells)
    )
    return cosine_topk(candidates, query_vec, k, vec_col, id_col)


def embedding_near_dup_pairs(
    df: DataFrame,
    threshold: float = 0.95,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_bits: int = 32,
    bands: int = 8,
    seed: int = 13,
    dim: int | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: SRP band self-join for
    candidates, exact cosine (JVM zip_with/aggregate) as the verdict."""
    if dim is None:
        dim = len(df.select(vec_col).first()[0])
    sig_udf = _srp_sig_udf(dim, n_bits, bands, seed)
    sigged = df.select(
        F.col(id_col).alias("k"), F.col(vec_col).alias("v"), sig_udf(F.col(vec_col)).alias("_sig")
    )
    banded = sigged.select(
        "k", "v", F.posexplode("_sig").alias("band", "bval")
    )
    pairs = (
        banded.alias("l")
        .join(
            banded.alias("r"),
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bval") == F.col("r.bval"))
            & (F.col("l.k") < F.col("r.k")),
        )
        .select(
            F.col("l.k").alias("a"),
            F.col("r.k").alias("b"),
            F.col("l.v").alias("va"),
            F.col("r.v").alias("vb"),
        )
        .dropDuplicates(["a", "b"])
    )
    dot = F.aggregate(
        F.zip_with(F.col("va"), F.col("vb"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    norm = lambda c: F.sqrt(  # noqa: E731
        F.aggregate(F.col(c), F.lit(0.0), lambda acc, x: acc + x * x)
    )
    return (
        pairs.withColumn("cosine", dot / (norm("va") * norm("vb")))
        .filter(F.col("cosine") >= threshold)
        .select("a", "b", "cosine")
    )
