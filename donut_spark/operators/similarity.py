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
  signature), exact cosine verify on candidates. Right whenever the
  threshold is high enough that buckets are selective.

* :func:`cosine_pairs_blocked` — exact all-pairs cosine via blocked
  matrix products (cogrouped applyInPandas, one float64 matmul per
  block pair). The dense-regime verifier: when the threshold is low,
  SRP candidates degenerate to ~all pairs and the pair-explosion plan
  shuffles orders of magnitude more rows than the math needs.
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
    "srp_signatures",
    "hyperplane_lsh_topk",
    "ivf_topk",
    "adaptive_probe_cells",
    "adaptive_rerank_count",
    "embedding_near_dup_pairs",
    "srp_candidate_pairs",
    "cosine_pairs_blocked",
]


def _vec_lit(vec: Sequence[float]) -> Column:
    return F.array(*[F.lit(float(v)) for v in vec])


def cosine_expr(col: str, vec: Sequence[float]) -> Column:
    """JVM-side cosine similarity between an array<float> column and a
    literal query vector (zip_with dot product / aggregate norms).

    The column is widened to double FIRST: with float elements, the
    ``x*x`` / ``x*y`` products are float32 (only the accumulate is
    double), which drifts up to ~1.5e-9 from the all-double oracle
    arithmetic — enough to flip a round(·, 6) value sitting on a
    boundary. One cast keeps every product in double."""
    v = F.col(col).cast("array<double>")
    q = _vec_lit(vec)
    qnorm = float(np.linalg.norm(np.asarray(vec, dtype="float64")))
    dot = F.aggregate(
        F.zip_with(v, q, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    norm = F.sqrt(F.aggregate(v, F.lit(0.0), lambda acc, x: acc + x * x))
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


def _band_sig(bits: np.ndarray, bands: int) -> List[int]:
    """Pack a boolean bit row into per-band integer values — THE
    band-packing arithmetic; every signature producer (row UDF, query
    side, persisted-index probe) must share it bit-for-bit."""
    rows = len(bits) // bands
    weights = (1 << np.arange(rows)).astype("int64")
    return [int(bits[b * rows : (b + 1) * rows] @ weights) for b in range(bands)]


def query_band_sig(
    query_vec: Sequence[float], dim: int, n_bits: int, bands: int, seed: int
) -> List[int]:
    """The query's SRP band signature (driver-side dim×n_bits matmul)."""
    planes = _srp_planes(dim, n_bits, seed)
    qbits = (np.asarray(query_vec, dtype="float64") @ planes) > 0
    return _band_sig(qbits, bands)


def _unit_rows(mat: np.ndarray) -> np.ndarray:
    """Row-normalize with a clipped norm: a zero/padding centroid must
    not become a NaN row (NaN cosines make argmax assign every vector to
    the garbage cell). Single definition shared by the online ivf_topk
    and every ann_index writer/prober so the disciplines can't drift."""
    return mat / np.clip(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12, None)


def _stable_probe_cells(cn: np.ndarray, qn: np.ndarray, n_probe: int) -> list:
    """Top-``n_probe`` cells by query cosine, ties to the LOWEST cell —
    the discipline the q41 oracle pins (ORDER BY dot DESC, cell). A bare
    ``np.argsort`` uses an unstable quicksort, so an exact dot-product
    tie at the probe boundary could flip the probe set between runs.
    Single shared definition (see :func:`_unit_rows`)."""
    order = np.argsort(-(cn @ qn), kind="stable")
    return [int(c) for c in order[:n_probe]]


def adaptive_probe_cells(
    cn: np.ndarray,
    qn: np.ndarray,
    n_probe: int,
    margin: float = 0.15,
    max_factor: float = 2.0,
) -> list:
    """Multi-probe widening for out-of-distribution queries (the fix for
    the IVF OOD-recall backlog item): after taking the top-``n_probe``
    cells, keep probing any further cell whose affinity is within
    ``margin`` (as a fraction of the query's full affinity range) of the
    BOUNDARY cell's — cells statistically indistinguishable from the
    last chosen one are equally likely to hold true neighbors, which is
    exactly the failure mode of a flat affinity profile (an OOD query is
    far from every centroid, so its profile is flat and a fixed budget
    arbitrarily cuts through a plateau).

    On well-separated (clustered) queries the boundary sits on a steep
    drop, the cut excludes the tail, and the probe set stays at
    ``n_probe`` — no extra cost where the index works well. The widening
    is budget-capped at ``max_factor × n_probe`` so a pathological
    profile can't silently degrade to a full scan (measured at the
    sf1-equivalent scale in BENCH/r4_sf1.md: near-isotropic synthetic
    embeddings have NO cluster structure, so even full widening cannot
    reach recall 1 — the cap makes that trade explicit rather than
    unbounded). Ties ordered by the same stable discipline as
    :func:`_stable_probe_cells`."""
    scores = cn @ qn
    order = np.argsort(-scores, kind="stable")
    s = scores[order]
    base = min(n_probe, len(s))
    cap = min(len(s), max(base, int(round(n_probe * max_factor))))
    cut = s[base - 1] - margin * float(s[0] - s[-1])
    p = base
    while p < cap and s[p] >= cut:
        p += 1
    return [int(c) for c in order[:p]]


def adaptive_rerank_count(scores: Sequence[float], base: int, margin: float) -> int:
    """Score-gap-triggered rerank escalation — :func:`adaptive_probe_cells`'
    widening rule applied to the ADC candidate axis (round-4 verdict item
    5). ``scores`` are candidate ADC affinities sorted DESCENDING, already
    truncated to the caller's hard cap; ``base`` is the committed rerank
    budget. Returns how many candidates to exact-rerank: at least
    ``base``, widened past it while the next score is within ``margin``
    (as a fraction of the observed score range) of the BOUNDARY
    candidate's — quantized ADC scores on an OOD query form a plateau
    around the cut, and candidates statistically indistinguishable from
    the last kept one are equally likely to be true neighbors. A
    confident (steep) profile keeps exactly ``base``; a flat one grows
    toward the cap the caller truncated at, and the cap keeps the exact
    rerank bounded (never a full-table fetch)."""
    n = len(scores)
    p = min(base, n)
    if p == 0 or n == 1:
        return p
    cut = scores[p - 1] - margin * float(scores[0] - scores[-1])
    while p < n and scores[p] >= cut:
        p += 1
    return p


def cell_assigner_udf(cn: np.ndarray):
    """Pandas UDF assigning each vector its nearest-centroid cell over a
    broadcast normalized codebook — shared by the online ivf_topk and
    the persisted write_ivf_index so their layouts can never diverge."""

    @F.pandas_udf(IntegerType())
    def cell_of(vec: pd.Series) -> pd.Series:
        mat = np.stack(vec.to_numpy()).astype("float64")
        mat = mat / np.clip(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12, None)
        return pd.Series((mat @ cn.T).argmax(axis=1).astype("int32"))

    return cell_of


def _srp_sig_udf(dim: int, n_bits: int, bands: int, seed: int):
    if n_bits // bands > 30:
        raise ValueError(
            f"{n_bits // bands} bits per band overflows the int32 band "
            "value (max 30); use more bands or fewer bits"
        )
    planes = _srp_planes(dim, n_bits, seed)

    @F.pandas_udf(ArrayType(IntegerType()))
    def sig(vec: pd.Series) -> pd.Series:
        mat = np.stack(vec.to_numpy())  # (batch, dim) — one matmul per Arrow batch
        bits = (mat @ planes) > 0  # (batch, n_bits)
        return pd.Series([_band_sig(row, bands) for row in bits])

    return sig


def srp_signatures(
    df: DataFrame,
    vec_col: str = "embedding",
    n_bits: int = 32,
    bands: int = 8,
    seed: int = 13,
    dim: int | None = None,
) -> DataFrame:
    """Add the SRP band-signature column ``_sig`` (array<int>, one hash
    per band). This is the PERSISTED INDEX for the repeated-query regime:
    write it once beside the table (partitioned/bucketed by a band hash
    if probes dominate) and pass it to :func:`hyperplane_lsh_topk` via
    ``sig_df`` — queries then pay zero signature recompute over 10^12
    rows.

    Pass ``dim`` explicitly in pipelines (every internal caller does):
    the ``None`` default infers it with a ``first()`` — one extra
    driver action per call, convenient interactively, wasteful in a
    loop."""
    if n_bits % bands:
        raise ValueError("bands must divide n_bits")
    if dim is None:
        dim = len(df.select(vec_col).first()[0])
    sig_udf = _srp_sig_udf(dim, n_bits, bands, seed)  # guards band width
    return df.withColumn("_sig", sig_udf(F.col(vec_col)))


def hyperplane_lsh_topk(
    df: DataFrame,
    query_vec: Sequence[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_bits: int = 32,
    bands: int = 8,
    seed: int = 13,
    sig_df: DataFrame | None = None,
) -> DataFrame:
    """Approximate top-k: SRP band match → exact cosine rerank.

    Candidates are rows sharing at least one band signature with the
    query; the final ordering is exact cosine on that reduced set.
    Pass ``sig_df`` (a persisted :func:`srp_signatures` table, same
    n_bits/bands/seed) to skip recomputing signatures per query.
    """
    if n_bits % bands:
        raise ValueError("bands must divide n_bits")
    dim = len(query_vec)
    qsig = query_band_sig(query_vec, dim, n_bits, bands, seed)

    sigged = (
        sig_df
        if sig_df is not None
        else srp_signatures(df, vec_col, n_bits, bands, seed, dim)
    )
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
    df: DataFrame, n_centroids: int, vec_col: str, id_col: str, iters: int = 8
) -> np.ndarray:
    """Deterministic IVF codebook: Lloyd iterations on a bounded,
    HASH-UNIFORM driver-side sample.

    The sample is the top-N rows by ``xxhash64(id)`` — a seeded uniform
    draw that is (a) independent of id/crawl/shard order, so a corpus
    whose ids correlate with content can't bias the codebook (the failure
    mode of head-of-table sampling), (b) bit-deterministic across runs,
    partitionings, and cluster sizes, and (c) computed by
    TakeOrderedAndProject (per-partition heap + driver merge — no full
    sort/shuffle). At 10^12 rows the codebook is still tiny (k × dim
    floats) — train on the sample, broadcast, assign distributed."""
    sample = np.stack(
        [
            r[0]
            for r in df.select(
                F.col(vec_col), F.xxhash64(F.col(id_col), F.lit(7)).alias("_h")
            )
            .orderBy("_h")
            .limit(max(n_centroids * 40, 512))
            .drop("_h")
            .collect()
        ]
    ).astype("float64")
    # k-means++-style spread seeding (deterministic): start from the
    # first sample point, greedily take the point farthest (by cosine)
    # from the chosen set — avoids the co-located seeds of stride picks.
    sn = sample / np.clip(np.linalg.norm(sample, axis=1, keepdims=True), 1e-12, None)
    chosen = [0]
    sims = sn @ sn[0]
    for _ in range(1, min(n_centroids, len(sample))):
        nxt = int(np.argmin(sims))
        chosen.append(nxt)
        sims = np.maximum(sims, sn @ sn[nxt])
    centroids = sample[chosen].copy()
    for _ in range(iters):
        # cosine assignment on normalized vectors
        cn = centroids / np.clip(
            np.linalg.norm(centroids, axis=1, keepdims=True), 1e-12, None
        )
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
    centroids: "np.ndarray | None" = None,
    multiprobe_margin: float | None = None,
) -> DataFrame:
    """IVF (inverted-file) ANN: coarse-quantize every vector to its
    nearest centroid (one vectorized matmul per Arrow batch), probe the
    ``n_probe`` centroids nearest the query, exact-rerank only those
    cells. ``multiprobe_margin`` turns on adaptive probe widening for
    flat-affinity (OOD) queries — see :func:`adaptive_probe_cells`;
    ``None`` keeps the fixed, oracle-pinned probe discipline.

    ``centroids``, when given, is a PRE-NORMALIZED codebook used
    verbatim (e.g. the committed fixture of
    ``sources/fixtures.py::materialize_ivf_centroids`` — freezing it is
    what makes the pruned probe oracle-checkable, and a production
    deployment likewise trains once and reuses the codebook across
    queries rather than re-sampling per query). Otherwise the codebook
    is trained in-query from a bounded hash-uniform sample.

    The 10^12-row deployment partitions/buckets the table BY ``_cell``
    at write time so a probe prunes partitions at the scan (cell id is
    deterministic, so the layout is reproducible); here the cell filter
    expresses the same pruning."""
    if centroids is not None:
        cn = np.asarray(centroids, dtype="float64")
    else:
        trained = _ivf_centroids(df, n_centroids, vec_col, id_col, seed_iters)
        cn = _unit_rows(trained)
    cell_of = cell_assigner_udf(cn)

    q = np.asarray(query_vec, dtype="float64")
    qn = q / max(np.linalg.norm(q), 1e-12)
    if multiprobe_margin is None:
        probe_cells = _stable_probe_cells(cn, qn, n_probe)
    else:
        probe_cells = adaptive_probe_cells(cn, qn, n_probe, multiprobe_margin)

    candidates = df.withColumn("_cell", cell_of(F.col(vec_col))).filter(
        F.col("_cell").isin(probe_cells)
    )
    return cosine_topk(candidates, query_vec, k, vec_col, id_col)


def srp_candidate_pairs(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_bits: int = 32,
    bands: int = 8,
    seed: int = 13,
    dim: int | None = None,
) -> DataFrame:
    """Distinct SRP-band-collision id pairs (a < b) — ids only.

    The banded self-join never sees the vector column (plan-asserted in
    tests): its shuffle rows are (id, band, bval), so candidate discovery
    over 10^12 rows moves tens of bytes per row, not kilobytes.

    Release the internally persisted banded frame with
    ``plans.cache.release_persisted(result)`` after consuming the result.
    Pass ``dim`` explicitly in pipelines — the ``None`` default costs a
    ``first()`` driver action (see :func:`srp_signatures`).
    """
    if n_bits % bands:
        raise ValueError("bands must divide n_bits")
    if dim is None:
        dim = len(df.select(vec_col).first()[0])
    sig_udf = _srp_sig_udf(dim, n_bits, bands, seed)
    sigged = df.select(
        F.col(id_col).alias("k"), sig_udf(F.col(vec_col)).alias("_sig")
    )
    # posexplode_outer: plain posexplode pushes an implicit
    # size(_sig) > 0 predicate below the projection, which re-evaluates
    # the signature UDF a second time per row; signatures are never
    # empty, so outer is semantically identical and single-eval.
    banded = sigged.select("k", F.posexplode_outer("_sig").alias("band", "bval"))
    # one signature pass, not two: the self-join otherwise re-runs the
    # SRP UDF on both sides (same fix as dedup.minhash_lsh_pairs)
    from pyspark.storagelevel import StorageLevel

    from ..plans.cache import attach_persisted

    banded = banded.persist(StorageLevel.MEMORY_AND_DISK)
    pairs = (
        banded.alias("l")
        .join(
            banded.alias("r"),
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bval") == F.col("r.bval"))
            & (F.col("l.k") < F.col("r.k")),
        )
        .select(F.col("l.k").alias("a"), F.col("r.k").alias("b"))
        .distinct()
    )
    return attach_persisted(pairs, [banded])


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
    candidates, exact cosine (JVM zip_with/aggregate) as the verdict.

    Shuffle discipline for 10^12 rows × KB-scale vectors: the banded
    self-join carries ONLY (k, band, bval) — 20 bytes/row — never the
    vectors (which would be duplicated ``bands×`` through the explode and
    shuffled on both sides). Vectors are attached AFTER the pair-distinct
    by two narrow id joins, so each survives exactly one shuffle per side
    (mirrors the candidate-driven shape of
    ``dedup.ngram_jaccard_pairs(candidates=...)``). Release the internal
    banded cache with ``plans.cache.release_persisted(result)`` after
    consuming the result."""
    from ..plans.cache import attach_persisted

    pairs = srp_candidate_pairs(df, vec_col, id_col, n_bits, bands, seed, dim)
    inner_cached = list(getattr(pairs, "_donut_persisted", ()))
    # float32 element products lose ~1e-7 relative precision before the
    # double accumulate; widen once here so the verdict cosine is the
    # same double arithmetic as the exact baseline (cosine_topk / q20).
    vecs = df.select(
        F.col(id_col).alias("_vid"),
        F.col(vec_col).cast("array<double>").alias("_v"),
    )
    pairs = (
        pairs.join(vecs, pairs.a == vecs._vid)
        .select("a", "b", F.col("_v").alias("va"))
        .join(vecs, F.col("b") == vecs._vid)
        .select("a", "b", "va", F.col("_v").alias("vb"))
    )
    dot = F.aggregate(
        F.zip_with(F.col("va"), F.col("vb"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    norm = lambda c: F.sqrt(  # noqa: E731
        F.aggregate(F.col(c), F.lit(0.0), lambda acc, x: acc + x * x)
    )
    verified = (
        pairs.withColumn("cosine", dot / (norm("va") * norm("vb")))
        .filter(F.col("cosine") >= threshold)
        .select("a", "b", "cosine")
    )
    return attach_persisted(verified, inner_cached)


def cosine_pairs_blocked(
    df: DataFrame,
    threshold: float,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    block_size: int | None = None,
    n_rows: int | None = None,
) -> DataFrame:
    """Exact all-pairs cosine >= threshold via BLOCKED matrix products —
    the dense-regime twin of :func:`embedding_near_dup_pairs`.

    LSH banding only pays when buckets are selective; at a low cosine
    threshold (SRP collision probability for even UNRELATED pairs
    approaches 1) the candidate set degenerates to nearly all N²/2
    pairs, and shuffling those as SQL pair-rows (explode → self-join →
    distinct → two vector-attach joins) moves orders of magnitude more
    bytes than the underlying math needs. The right physical shape for
    an exact quadratic verify is a block-nested-loop of MATRIX products:

    * rows are hash-assigned to B = ceil(N / block_size) blocks;
    * the B·(B+1)/2 unordered block pairs form a tiny broadcast frame;
    * a cogrouped ``applyInPandas`` computes one numpy float64 matmul
      per block pair and emits only the surviving (a, b, cosine) rows.

    Shuffle volume is N·B vector rows (each block meets every other
    block once) versus the pair-explosion's O(N²) rows — and the per-
    task work is a BLAS matmul instead of per-pair codegen aggregates.
    Compute is still inherently quadratic: at corpus scale this is the
    verifier for bounded slices/buckets (it composes with the LSH path,
    which stays the discovery plan whenever the threshold makes buckets
    selective).

    Deterministic: block assignment is ``xxhash64(id)``-based, output
    pairs are canonicalized a < b. ``n_rows`` skips the sizing count
    when the caller already knows it.

    ``block_size=None`` (default) derives the grid from the cluster:
    shuffle volume is N·(B+1) vector rows, so FEWER, larger blocks
    shuffle less — the floor on B is having enough block-pair tasks to
    fill the cluster. B_target = ceil(sqrt(4·parallelism)) puts
    B·(B+1)/2 ≈ 2× parallelism tasks on the grid (measured at sf1.0 /
    local[32]: 20k rows, B 20 → 10 cut the leg 3.2 s → 2.5 s; per-task
    matmuls stay far below memory limits since a 4096² float64 block
    product is only 128 MiB). A 1024-row floor keeps tiny inputs from
    degenerating to per-row tasks; the 1024-block guard above is
    unchanged. An explicit ``block_size`` overrides (tests pin the
    grid with it).
    """
    from pyspark.sql.types import ByteType, IntegerType as _IntT, LongType, ShortType

    if not isinstance(
        df.schema[id_col].dataType, (ByteType, ShortType, _IntT, LongType)
    ):
        # the output schema is (a long, b long) and canonicalization uses
        # numeric min/max — fail at the call site, not inside a worker
        raise TypeError(
            f"cosine_pairs_blocked needs an integral id column; "
            f"{id_col} is {df.schema[id_col].dataType.simpleString()}"
        )
    if n_rows is None:
        n_rows = df.count()
    if block_size is None:
        import math

        par = df.sparkSession.sparkContext.defaultParallelism
        b_target = max(1, math.ceil(math.sqrt(4 * par)))
        block_size = max(1024, -(-n_rows // b_target))
    n_blocks = max(1, -(-n_rows // block_size))
    if n_blocks > 1024:
        # B(B+1)/2 block pairs is the plan's own fan-out; past ~10^6
        # tasks the quadratic compute is the wall no plan fixes — make
        # the caller choose (bigger blocks, a bounded slice, or the LSH
        # discovery path) instead of silently launching it.
        raise ValueError(
            f"{n_rows} rows / block_size {block_size} = {n_blocks} blocks "
            "(> 1024): exact all-pairs at this scale is infeasible — raise "
            "block_size, restrict to a slice/bucket, or use "
            "embedding_near_dup_pairs (LSH discovery) instead"
        )

    spark = df.sparkSession

    # left/right are built from INDEPENDENT plans (fresh select / fresh
    # createDataFrame) so the cogroup's two branches don't share
    # attribute ids — sharing them trips Spark's ambiguous-self-join
    # analyzer even though the branches never join each other.
    def mk_rows() -> DataFrame:
        return df.select(
            F.col(id_col).alias("_id"),
            F.col(vec_col).cast("array<double>").alias("_v"),
            F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_blocks)).alias("_blk"),
        )

    def mk_bp() -> DataFrame:
        return spark.createDataFrame(
            [
                (i * n_blocks + j, i, j)
                for i in range(n_blocks)
                for j in range(i, n_blocks)
            ],
            ["pid", "bi", "bj"],
        )

    left = (
        mk_rows()
        .join(F.broadcast(mk_bp()), F.col("_blk") == F.col("bi"))
        .select("pid", "bi", "bj", "_id", "_v")
    )
    right = (
        mk_rows()
        .join(F.broadcast(mk_bp()), F.col("_blk") == F.col("bj"))
        .select("pid", "_id", "_v")
    )

    def block_cosine(key, l: pd.DataFrame, r: pd.DataFrame) -> pd.DataFrame:
        if l.empty or r.empty:
            return pd.DataFrame({"a": [], "b": [], "cosine": []})
        same_block = bool(l["bi"].iloc[0] == l["bj"].iloc[0])
        A = np.stack(l["_v"].to_numpy()).astype("float64")
        Bm = np.stack(r["_v"].to_numpy()).astype("float64")
        # dot / (|a|·|b|) — the same formula (not pre-normalized rows)
        # as the JVM/oracle cosine, so values agree to float64 rounding
        na = np.linalg.norm(A, axis=1)
        nb = np.linalg.norm(Bm, axis=1)
        cos = (A @ Bm.T) / np.clip(np.outer(na, nb), 1e-300, None)
        ia, ib = np.nonzero(cos >= threshold)
        aid = l["_id"].to_numpy()[ia]
        bid = r["_id"].to_numpy()[ib]
        keep = aid < bid if same_block else aid != bid
        aid, bid, vals = aid[keep], bid[keep], cos[ia[keep], ib[keep]]
        lo, hi = np.minimum(aid, bid), np.maximum(aid, bid)
        return pd.DataFrame({"a": lo, "b": hi, "cosine": vals})

    return (
        left.groupBy("pid")
        .cogroup(right.groupBy("pid"))
        .applyInPandas(block_cosine, schema="a long, b long, cosine double")
    )
