"""Persisted, partition-pruned ANN indexes — the repeated-query regime.

:func:`hyperplane_lsh_topk` / :func:`ivf_topk` recompute signatures /
cell assignments per query: right for a one-off, wrong when the same
10^12-row table serves many probes. These writers pay the signature
scan ONCE and lay the result out so that a probe's scan is pruned to
the matching partitions at planning time — no signature recompute, no
full-table read, no shuffle on the probe path:

* :func:`write_srp_index` — SRP band postings (vec_id, band, bval)
  written ``partitionBy(band, bval)``: a probe touches exactly ``bands``
  of the ``bands × 2^rows`` leaf directories (Hive-style partition
  pruning, visible as PartitionFilters in the scan). Vectors are NOT
  duplicated into the postings — rerank joins the base table by id.
* :func:`write_ivf_index` — the base table itself re-written
  ``partitionBy(_cell)`` plus a JSON codebook sidecar; a probe reads
  only the ``n_probe`` nearest cells' directories. This makes the
  layout claim in :func:`donut_spark.operators.similarity.ivf_topk`
  ("partition BY _cell at write time so a probe prunes at the scan")
  a real artifact instead of a docstring.

Both writers are deterministic (seeded planes / seeded codebook sample),
so two cluster sizes — or a crashed-and-resumed build — produce the same
layout bit-for-bit.
"""

from __future__ import annotations

import json
import os
from typing import Sequence

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = [
    "write_srp_index",
    "probe_srp_index",
    "write_ivf_index",
    "probe_ivf_index",
    "train_ivfadc",
    "write_ivfadc_index",
    "probe_ivfadc_index",
    "write_pq_index",
    "probe_pq_index",
]


def _write_meta(spark, path: str, obj: dict) -> None:
    """Sidecar JSON via the Hadoop FS API — the parquet payloads already
    land through Spark's committer, so on the HDFS/S3A deployments
    submit/run_index.py advertises the sidecar must too (a local
    ``open()`` on an s3a:// URI fails on the driver).

    Published atomically (write ``_meta.json.tmp``, then rename): the
    probes — and the builders' existence-keyed idempotency checks — use
    this file as the index commit marker, so a crash mid-write must
    leave either no marker (rebuild happens) or a complete one, never a
    truncated JSON that both breaks probes and suppresses the rebuild.
    Rename is atomic on HDFS and local FS (same discipline as
    ``fixtures.materialize_*``'s tmp+os.replace publish).

    Republish (marker already present) goes through ``FileContext``'s
    single-call overwriting rename — the ``FileSystem`` API has no
    clobbering rename, and delete-then-rename leaves a no-marker window
    where a crash loses the PREVIOUS valid marker too (round-4 advice).
    Filesystems without an ``AbstractFileSystem`` binding (older s3a)
    fall back to delete+rename; :func:`_read_meta`'s missing-marker
    retry tolerates that window for concurrent readers."""
    from .checkpoint import _fs_for

    fs, tmp = _fs_for(spark, f"{path}/_meta.json.tmp")
    out = fs.create(tmp, True)
    out.write(bytearray(json.dumps(obj).encode()))
    out.close()
    _, final = _fs_for(spark, f"{path}/_meta.json")
    jvm = spark._jvm
    try:
        ctx = jvm.org.apache.hadoop.fs.FileContext.getFileContext(
            final.toUri(), spark.sparkContext._jsc.hadoopConfiguration()
        )
        gw = spark.sparkContext._gateway
        opts = gw.new_array(jvm.org.apache.hadoop.fs.Options.Rename, 1)
        opts[0] = jvm.org.apache.hadoop.fs.Options.Rename.OVERWRITE
        ctx.rename(tmp, final, opts)  # atomic overwrite, no gap
        return
    except Exception:  # no AbstractFileSystem binding for this scheme
        pass
    if fs.exists(final):  # HDFS rename won't clobber; local FS varies
        fs.delete(final, False)
    if not fs.rename(tmp, final):
        raise IOError(f"atomic publish of {path}/_meta.json failed")


def _read_meta(spark, path: str) -> dict:
    import time

    from .checkpoint import _fs_for

    fs, p = _fs_for(spark, f"{path}/_meta.json")
    stream = None
    for attempt in (0, 1):
        try:
            stream = fs.open(p)
            break
        except Exception as exc:  # py4j-wrapped FileNotFoundException
            # a writer on a non-FileContext filesystem republishing via
            # delete+rename has a brief no-marker window — one short
            # retry rides it out; anything else (or a second miss)
            # propagates so the builders' idempotency check sees it
            if attempt or "FileNotFoundException" not in str(exc):
                raise
            time.sleep(0.2)
    try:
        # IOUtils returns the byte[]; reading into a passed bytearray
        # would NOT work — py4j passes it by value, Java-side writes
        # never reach Python
        data = spark._jvm.org.apache.commons.io.IOUtils.toByteArray(stream)
    finally:
        stream.close()
    return json.loads(bytes(data).decode())


# single shared definitions with the online operators (similarity.py) so
# the probe tie-break and NaN-guard disciplines can't drift between the
# persisted-index and online paths
from .similarity import (  # noqa: E402
    _stable_probe_cells,
    _unit_rows,
    adaptive_probe_cells,
    adaptive_rerank_count,
)


def _probe_cells(cn, qn, n_probe, multiprobe_margin):
    """Shared probe-choice dispatch: fixed oracle-pinned discipline, or
    adaptive multi-probe widening for OOD queries when a margin is set."""
    if multiprobe_margin is None:
        return _stable_probe_cells(cn, qn, n_probe)
    return adaptive_probe_cells(cn, qn, n_probe, multiprobe_margin)


def _rerank_candidates(
    scored: DataFrame,
    base: DataFrame,
    rerank: int,
    rerank_margin: float | None,
    max_rerank_factor: float,
    id_col: str,
) -> DataFrame:
    """Shared ADC→exact-rerank hand-off for the compressed-code probes.

    ``rerank_margin=None`` keeps the committed fixed budget (semi-join of
    the top-``rerank`` ids — TakeOrderedAndProject, nothing on the
    driver). With a margin set, the top ``rerank × max_rerank_factor``
    ``(id, _adc)`` rows come to the driver (a BOUNDED fetch — a few
    hundred rows regardless of table size) and
    :func:`similarity.adaptive_rerank_count` picks the escalated count:
    a flat ADC profile (OOD query — quantized scores plateau around the
    budget boundary) widens the exact rerank toward the cap, a steep one
    stays at ``rerank``. The chosen ids push into the base scan as one
    ``IN``-set filter, so the raw-vector fetch stays proportional to the
    escalated count, never the table."""
    ordered = scored.orderBy(F.desc("_adc"), F.col("id"))
    if rerank_margin is None:
        cand_ids = ordered.limit(rerank).select(F.col("id").alias(id_col))
        return base.join(cand_ids, id_col, "left_semi")
    cap = max(int(rerank), int(round(rerank * max_rerank_factor)))
    top = ordered.select("id", "_adc").limit(cap).collect()
    p = adaptive_rerank_count([r["_adc"] for r in top], rerank, rerank_margin)
    ids = [r["id"] for r in top[:p]]
    return base.filter(F.col(id_col).isin(ids))


def write_srp_index(
    df: DataFrame,
    path: str,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_bits: int = 32,
    bands: int = 8,
    seed: int = 13,
    dim: int | None = None,
) -> str:
    """Build the SRP posting index under ``path``: one signature pass
    over the table, exploded to (id, band, bval) and written
    ``partitionBy(band, bval)`` so every (band=b/bval=v) bucket is its
    own directory. Metadata (params) goes to ``_meta.json`` so probes
    can't silently mix parameters."""
    from .similarity import srp_signatures

    if dim is None:
        dim = len(df.select(vec_col).first()[0])
    sigged = srp_signatures(df, vec_col, n_bits, bands, seed, dim)
    postings = sigged.select(
        F.col(id_col).alias("id"),
        F.posexplode_outer("_sig").alias("band", "bval"),
    )
    postings.write.mode("overwrite").partitionBy("band", "bval").parquet(
        os.path.join(path, "postings")
    )
    _write_meta(
        df.sparkSession,
        path,
        {"n_bits": n_bits, "bands": bands, "seed": seed, "dim": dim},
    )
    return path


def probe_srp_index(
    spark: SparkSession,
    path: str,
    base: DataFrame,
    query_vec: Sequence[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Top-k probe against a :func:`write_srp_index` layout: compute the
    query's band signature driver-side (a dim×n_bits matmul), read ONLY
    the matching (band, bval) partitions — partition pruning, no
    signature scan — then exact-rerank the candidate ids against the
    base table. Result is identical to :func:`hyperplane_lsh_topk` with
    the same parameters."""
    from .similarity import cosine_topk, query_band_sig

    meta = _read_meta(spark, path)
    qsig = query_band_sig(
        query_vec, meta["dim"], meta["n_bits"], meta["bands"], meta["seed"]
    )

    postings = spark.read.parquet(os.path.join(path, "postings"))
    match = F.lit(False)
    for b, v in enumerate(qsig):
        match = match | ((F.col("band") == b) & (F.col("bval") == v))
    cand_ids = postings.filter(match).select(F.col("id").alias(id_col)).distinct()
    candidates = base.join(cand_ids, id_col, "left_semi")
    return cosine_topk(candidates, query_vec, k, vec_col, id_col)


def write_ivf_index(
    df: DataFrame,
    path: str,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_centroids: int = 16,
    seed_iters: int = 3,
) -> str:
    """Re-write the table cell-partitioned: train the deterministic
    codebook (hash-uniform sample + Lloyd — see ``_ivf_centroids``),
    assign every row its nearest-centroid ``_cell`` (one vectorized
    matmul per Arrow batch), write ``partitionBy(_cell)``, store the
    codebook as a JSON sidecar."""
    from .similarity import _ivf_centroids, cell_assigner_udf

    centroids = _ivf_centroids(df, n_centroids, vec_col, id_col, seed_iters)
    cn = _unit_rows(centroids)
    cell_of = cell_assigner_udf(cn)

    df.withColumn("_cell", cell_of(F.col(vec_col))).write.mode(
        "overwrite"
    ).partitionBy("_cell").parquet(os.path.join(path, "cells"))
    _write_meta(df.sparkSession, path, {"centroids": centroids.tolist()})
    return path


def train_ivfadc(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_centroids: int = 16,
    seed_iters: int = 3,
    m: int = 8,
    k: int = 64,
    pq_iters: int = 8,
):
    """Train the IVF-ADC parameters: the coarse IVF codebook
    (hash-uniform sample + Lloyd) and the per-subspace PQ codebooks of
    the sample's CELL RESIDUALS (x − raw cell centroid — residuals are
    what PQ quantizes well). Returns ``(centroids, books)`` float64
    arrays of shape (n_centroids, dim) / (m, k, dim//m). Deterministic
    (seeded samples, argmax ties to the lowest cell), so the committed
    oracle fixture (``fixtures.materialize_ivfadc_codebooks``) and a
    fresh index build can be asserted bit-identical."""
    from .pq import codebooks_from_sample, pq_sample
    from .similarity import _ivf_centroids

    centroids = _ivf_centroids(df, n_centroids, vec_col, id_col, seed_iters)
    cn = _unit_rows(centroids)
    sample = pq_sample(df, max(k * 40, 512), vec_col, id_col)
    sn = sample / np.clip(np.linalg.norm(sample, axis=1, keepdims=True), 1e-12, None)
    residuals = sample - centroids[(sn @ cn.T).argmax(axis=1)]
    books = codebooks_from_sample(residuals, m, k, pq_iters)
    return centroids, books


def write_ivfadc_index(
    df: DataFrame,
    path: str,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_centroids: int = 16,
    seed_iters: int = 3,
    m: int = 8,
    k: int = 64,
    pq_iters: int = 8,
    centroids: np.ndarray | None = None,
    books: np.ndarray | None = None,
) -> str:
    """IVF-ADC (Jégou et al. 2011 §V) — the billion-scale serving
    layout: coarse cells for pruning + PQ codes OF THE RESIDUALS for
    compressed-domain scoring inside each cell.

    Build: train the IVF codebook (hash-uniform sample + Lloyd), train
    the PQ codebooks on the sample's residuals (x − raw cell centroid —
    residuals are what PQ quantizes well, and re-centering each cell is
    the OOD-recall fix for vectors far from any centroid), then one
    Arrow pass assigns every row its cell + residual codes and writes
    ``(id, _pq)`` ``partitionBy(_cell)``. Raw vectors are NOT duplicated
    into the index — the probe reranks by id against the base table.
    Sidecar JSON pins centroids + codebooks so probes can't mix
    parameters. Deterministic end-to-end (seeded samples), so two
    cluster sizes produce the same layout bit-for-bit.

    Pass pre-trained ``centroids``/``books`` (e.g. the committed oracle
    fixture's) to skip training — the frozen-parameter regime that makes
    the pruned probe exactly oracle-replayable (q54)."""
    from pyspark.sql.types import (
        ArrayType,
        IntegerType,
        StructField,
        StructType,
    )

    if centroids is None or books is None:
        centroids, books = train_ivfadc(
            df, vec_col, id_col, n_centroids, seed_iters, m, k, pq_iters
        )
    centroids = np.asarray(centroids, dtype="float64")
    books = np.asarray(books, dtype="float64")
    m = books.shape[0]
    cn = _unit_rows(centroids)
    d_sub = books.shape[2]

    # the index keeps the base table's native id type so the probe's
    # rerank semi-join needs no casts on the 10^12-row side
    out_schema = StructType(
        [
            StructField("id", df.schema[id_col].dataType),
            StructField("_pq", ArrayType(IntegerType())),
            StructField("_cell", IntegerType()),
        ]
    )

    def assign_encode(batches):
        import pandas as pd

        for pdf in batches:
            mat = np.stack(pdf[vec_col].to_numpy()).astype("float64")
            nm = mat / np.clip(
                np.linalg.norm(mat, axis=1, keepdims=True), 1e-12, None
            )
            cells = (nm @ cn.T).argmax(axis=1)
            res = mat - centroids[cells]
            codes = np.empty((len(mat), m), dtype="int32")
            for s in range(m):
                sub = res[:, s * d_sub : (s + 1) * d_sub]
                cb = books[s]
                d2 = (
                    (sub**2).sum(axis=1, keepdims=True)
                    - 2.0 * (sub @ cb.T)
                    + (cb**2).sum(axis=1)[None, :]
                )
                codes[:, s] = d2.argmin(axis=1)
            yield pd.DataFrame(
                {
                    "id": pdf[id_col],
                    "_pq": list(codes),
                    "_cell": cells.astype("int32"),
                }
            )

    df.select(id_col, vec_col).mapInPandas(assign_encode, out_schema).write.mode(
        "overwrite"
    ).partitionBy("_cell").parquet(os.path.join(path, "cells"))
    _write_meta(
        df.sparkSession,
        path,
        {"centroids": centroids.tolist(), "codebooks": books.tolist()},
    )
    return path


def probe_ivfadc_index(
    spark: SparkSession,
    path: str,
    base: DataFrame,
    query_vec: Sequence[float],
    k: int = 10,
    n_probe: int = 4,
    rerank: int = 100,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    multiprobe_margin: float | None = None,
    rerank_margin: float | None = None,
    max_rerank_factor: float = 4.0,
) -> DataFrame:
    """Top-k probe against a :func:`write_ivfadc_index` layout.
    ``multiprobe_margin`` enables adaptive probe widening for OOD
    queries (:func:`similarity.adaptive_probe_cells`); ``None`` keeps
    the fixed, oracle-pinned discipline. ``rerank_margin`` independently
    enables score-gap-triggered rerank escalation
    (:func:`similarity.adaptive_rerank_count`): when the ADC profile
    around the rerank boundary is flat — the OOD signature, where
    quantization noise dominates the ordering — the exact rerank grows
    toward ``rerank × max_rerank_factor`` so mis-ranked true neighbors
    still reach the exact pass; confident profiles pay nothing.

    The scan reads ONLY the probed cell directories (partition pruning
    on ``_cell``). Scoring is pure JVM: q·x ≈ q·centroid(cell) +
    Σ_s lut[s, code_s] — the inner product splits over the residual
    decomposition, so the residual LUT is CELL-INDEPENDENT (unlike the
    L2 formulation) and the cell term is one literal-array lookup. The
    top-``rerank`` ADC candidates are exact-cosine reranked against the
    base table (fetch-by-id semi-join) — compressed codes order the
    scan, raw vectors only touch ``rerank`` rows."""
    from .pq import _adc_lut
    from .similarity import cosine_topk

    meta = _read_meta(spark, path)
    centroids = np.asarray(meta["centroids"], dtype="float64")
    books = np.asarray(meta["codebooks"], dtype="float64")
    m, kk, _ = books.shape
    cn = _unit_rows(centroids)
    q = np.asarray(query_vec, dtype="float64")
    qn = q / max(np.linalg.norm(q), 1e-12)
    probe_cells = _probe_cells(cn, qn, n_probe, multiprobe_margin)

    cells = spark.read.parquet(os.path.join(path, "cells")).filter(
        F.col("_cell").isin(probe_cells)
    )
    cell_dots = F.array(*[F.lit(float(v)) for v in centroids @ q])
    lut_lit = F.array(*[F.lit(v) for v in _adc_lut(books, query_vec)])
    adc = F.aggregate(
        F.zip_with(
            F.col("_pq"),
            F.sequence(F.lit(0), F.lit(m - 1)),
            lambda c, s: F.element_at(lut_lit, (s * kk + c + 1).cast("int")),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    scored = cells.withColumn(
        "_adc", F.element_at(cell_dots, F.col("_cell") + 1) + adc
    )
    candidates = _rerank_candidates(
        scored, base, rerank, rerank_margin, max_rerank_factor, id_col
    )
    return cosine_topk(candidates, query_vec, k, vec_col, id_col)


def write_pq_index(
    df: DataFrame,
    path: str,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    m: int = 8,
    k: int = 64,
    pq_iters: int = 8,
    codebooks: np.ndarray | None = None,
) -> str:
    """Persist the plain-PQ serving layout: ``(id, _pq)`` codes for
    every row plus the codebooks in the ``_meta.json`` sidecar.

    Unlike the IVF layouts there is no partition pruning — plain PQ's
    scale story is the COMPRESSED full scan (m small ints per row
    instead of the raw vector, 32-256× less I/O and pure-JVM scoring),
    the memory-bounded regime of Jégou 2011 §IV. Codes are encoded once
    at write time (one argmin matmul per Arrow batch); a probe never
    touches raw vectors outside its rerank set. Deterministic (seeded
    codebook sample), so two cluster sizes produce identical codes."""
    from .pq import pq_encode, train_pq_codebooks

    if codebooks is None:
        codebooks = train_pq_codebooks(df, m, k, vec_col, id_col, pq_iters)
    codebooks = np.asarray(codebooks, dtype="float64")
    pq_encode(df.select(id_col, vec_col), codebooks, vec_col).select(
        F.col(id_col).alias("id"), "_pq"
    ).write.mode("overwrite").parquet(os.path.join(path, "codes"))
    _write_meta(df.sparkSession, path, {"codebooks": codebooks.tolist()})
    return path


def probe_pq_index(
    spark: SparkSession,
    path: str,
    base: DataFrame,
    query_vec: Sequence[float],
    k: int = 10,
    rerank: int = 100,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    rerank_margin: float | None = None,
    max_rerank_factor: float = 4.0,
) -> DataFrame:
    """Top-k probe against a :func:`write_pq_index` layout: scan the
    code table (compressed domain, literal-LUT ADC inside whole-stage
    codegen — zero Python), take the top-``rerank`` ids, exact-cosine
    rerank by id against the base table. Identical to
    :func:`donut_spark.operators.pq.pq_topk` with the same codebooks —
    minus the per-query encode scan. ``rerank_margin`` enables the same
    score-gap-triggered rerank escalation as
    :func:`probe_ivfadc_index`."""
    from .pq import pq_adc_scores
    from .similarity import cosine_topk

    books = np.asarray(_read_meta(spark, path)["codebooks"], dtype="float64")
    codes = spark.read.parquet(os.path.join(path, "codes"))
    candidates = _rerank_candidates(
        pq_adc_scores(codes, books, query_vec),
        base,
        rerank,
        rerank_margin,
        max_rerank_factor,
        id_col,
    )
    return cosine_topk(candidates, query_vec, k, vec_col, id_col)


def probe_ivf_index(
    spark: SparkSession,
    path: str,
    query_vec: Sequence[float],
    k: int = 10,
    n_probe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    multiprobe_margin: float | None = None,
) -> DataFrame:
    """Top-k probe against a :func:`write_ivf_index` layout: pick the
    ``n_probe`` nearest cells from the sidecar codebook driver-side,
    scan ONLY those cell directories (partition pruning on ``_cell``),
    exact-rerank. Identical to :func:`ivf_topk` with the same codebook
    parameters. ``multiprobe_margin`` enables adaptive OOD widening
    (:func:`similarity.adaptive_probe_cells`)."""
    from .similarity import cosine_topk

    centroids = np.asarray(_read_meta(spark, path)["centroids"], dtype="float64")
    cn = _unit_rows(centroids)
    q = np.asarray(query_vec, dtype="float64")
    qn = q / max(np.linalg.norm(q), 1e-12)
    probe_cells = _probe_cells(cn, qn, n_probe, multiprobe_margin)

    cells = spark.read.parquet(os.path.join(path, "cells"))
    candidates = cells.filter(F.col("_cell").isin(probe_cells))
    return cosine_topk(candidates, query_vec, k, vec_col, id_col)
