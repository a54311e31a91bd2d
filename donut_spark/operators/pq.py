"""Product quantization for memory-bounded ANN (Jégou, Douze, Schmid,
"Product Quantization for Nearest Neighbor Search", TPAMI 2011).

At 10^12 rows the raw vectors (KBs each) don't fit an online serving
tier; PQ stores ``m`` one-byte-ish codes per vector (32-256x smaller)
and scores candidates with an asymmetric distance computation (ADC):
the query precomputes one ``m × k`` lookup table of subvector inner
products, and every row's approximate score is a pure table-lookup sum.

Spark mapping:

* codebooks train driver-side on a hash-uniform sample (same sampling
  discipline as ``similarity._ivf_centroids`` — deterministic, order-
  independent) and broadcast via closure: tiny (m·k·dim/m floats).
* encoding is one vectorized numpy argmin per Arrow batch.
* ADC scoring is JVM-SIDE Catalyst: the query's LUT becomes a literal
  array and the score is ``aggregate(transform(codes, lookup))`` inside
  whole-stage codegen — the 10^12-row scan never touches Python.
* :func:`pq_topk` reranks the top ``rerank`` ADC candidates with exact
  cosine over the raw vectors (fetch-by-id), the standard PQ + refine
  pipeline.
"""

from __future__ import annotations

from typing import List, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, IntegerType

from .similarity import cosine_topk

__all__ = [
    "train_pq_codebooks",
    "codebooks_from_sample",
    "pq_sample",
    "pq_encode",
    "pq_adc_scores",
    "pq_topk",
]


def pq_sample(
    df: DataFrame, n: int, vec_col: str = "embedding", id_col: str = "vec_id"
) -> np.ndarray:
    """Bounded hash-uniform driver-side sample (same discipline as
    ``similarity._ivf_centroids``): top-``n`` rows by ``xxhash64(id)`` —
    deterministic, order/partitioning-independent."""
    return np.stack(
        [
            r[0]
            for r in df.select(
                F.col(vec_col), F.xxhash64(F.col(id_col), F.lit(11)).alias("_h")
            )
            .orderBy("_h")
            .limit(n)
            .drop("_h")
            .collect()
        ]
    ).astype("float64")


def codebooks_from_sample(sample: np.ndarray, m: int, k: int, iters: int = 8) -> np.ndarray:
    """Per-subspace deterministic k-means (farthest-point seeding +
    Lloyd, L2) over a sample matrix — shared by plain PQ (raw vectors)
    and IVF-ADC (cell residuals). Returns (m, k, dim//m) float64."""
    dim = sample.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m} subspaces")
    d_sub = dim // m
    books = np.empty((m, k, d_sub))
    for s in range(m):
        sub = sample[:, s * d_sub : (s + 1) * d_sub]
        chosen = [0]
        d2 = ((sub - sub[0]) ** 2).sum(axis=1)
        for _ in range(1, min(k, len(sub))):
            nxt = int(np.argmax(d2))
            chosen.append(nxt)
            d2 = np.minimum(d2, ((sub - sub[nxt]) ** 2).sum(axis=1))
        cents = sub[chosen].copy()
        for _ in range(iters):
            dist = ((sub[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
            assign = dist.argmin(axis=1)
            for c in range(len(cents)):
                members = sub[assign == c]
                if len(members):
                    cents[c] = members.mean(axis=0)
        books[s, : len(cents)] = cents
        if len(cents) < k:  # tiny sample: pad with the first centroid
            books[s, len(cents) :] = cents[0]
    return books


def train_pq_codebooks(
    df: DataFrame,
    m: int = 8,
    k: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    iters: int = 8,
) -> np.ndarray:
    """Train ``m`` subspace codebooks of ``k`` centroids each on a
    hash-uniform driver-side sample. Returns (m, k, dim//m) float64 —
    deterministic across runs, partitionings, and cluster sizes."""
    sample = pq_sample(df, max(k * 40, 512), vec_col, id_col)
    return codebooks_from_sample(sample, m, k, iters)


def pq_encode(
    df: DataFrame,
    codebooks: np.ndarray,
    vec_col: str = "embedding",
    code_col: str = "_pq",
) -> DataFrame:
    """Add the ``m``-entry code column: per Arrow batch, one argmin
    matmul per subspace (``|x-c|² = |x|² - 2x·c + |c|²`` expansion, so
    the inner loop is a BLAS product)."""
    m, k, d_sub = codebooks.shape
    books = codebooks  # closure-broadcast

    @F.pandas_udf(ArrayType(IntegerType()))
    def encode(vec: pd.Series) -> pd.Series:
        mat = np.stack(vec.to_numpy()).astype("float64")  # (n, dim)
        n = mat.shape[0]
        codes = np.empty((n, m), dtype="int32")
        for s in range(m):
            sub = mat[:, s * d_sub : (s + 1) * d_sub]  # (n, d_sub)
            cb = books[s]  # (k, d_sub)
            d2 = (
                (sub**2).sum(axis=1, keepdims=True)
                - 2.0 * (sub @ cb.T)
                + (cb**2).sum(axis=1)[None, :]
            )
            codes[:, s] = d2.argmin(axis=1)
        return pd.Series(list(codes))

    return df.withColumn(code_col, encode(F.col(vec_col)))


def _adc_lut(codebooks: np.ndarray, query_vec: Sequence[float]) -> List[float]:
    """Flattened m·k lookup table of query-subvector · centroid inner
    products (ADC approximates the full inner product as their sum)."""
    m, k, d_sub = codebooks.shape
    q = np.asarray(query_vec, dtype="float64")
    lut = np.empty((m, k))
    for s in range(m):
        lut[s] = codebooks[s] @ q[s * d_sub : (s + 1) * d_sub]
    return [float(v) for v in lut.ravel()]


def pq_adc_scores(
    encoded: DataFrame,
    codebooks: np.ndarray,
    query_vec: Sequence[float],
    code_col: str = "_pq",
    score_col: str = "_adc",
) -> DataFrame:
    """JVM-side ADC: score = Σ_s lut[s·k + code_s] — a literal-array
    lookup sum inside whole-stage codegen, no Python on the scan."""
    m, k, _ = codebooks.shape
    lut = _adc_lut(codebooks, query_vec)
    lut_lit = F.array(*[F.lit(v) for v in lut])
    score = F.aggregate(
        F.zip_with(
            F.col(code_col),
            F.sequence(F.lit(0), F.lit(m - 1)),
            lambda c, s: F.element_at(lut_lit, (s * k + c + 1).cast("int")),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return encoded.withColumn(score_col, score)


def pq_topk(
    df: DataFrame,
    codebooks: np.ndarray,
    query_vec: Sequence[float],
    k: int = 10,
    rerank: int = 100,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    encoded: DataFrame | None = None,
) -> DataFrame:
    """PQ + refine: top-``rerank`` rows by ADC (approximate, compressed
    domain, JVM-only) → exact cosine rerank of just those rows. Pass a
    persisted ``encoded`` table (from :func:`pq_encode`) to skip
    re-encoding — the production shape stores codes beside the table and
    reads vectors only for the rerank set."""
    enc = encoded if encoded is not None else pq_encode(df, codebooks, vec_col)
    cand_ids = (
        pq_adc_scores(enc, codebooks, query_vec)
        .orderBy(F.desc("_adc"), F.col(id_col))
        .limit(rerank)
        .select(id_col)
    )
    candidates = df.join(cand_ids, id_col, "left_semi")
    return cosine_topk(candidates, query_vec, k, vec_col, id_col)
