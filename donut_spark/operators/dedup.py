"""Deduplication operators for web-scale corpora.

Five families, each with a distinct scale profile:

* :func:`exact_dup_clusters` / :func:`exact_dedup` — hash-groupBy on a
  normalized content fingerprint; one shuffle, map-side partial agg.
* :func:`minhash_lsh_pairs` — MinHash + banded LSH (Broder 1997; Leskovec
  et al., MMDS ch.3): signature via one Arrow UDF, band explosion and
  bucket self-join fully JVM-side. The self-join key is (band_index,
  band_hash) so only same-band collisions shuffle — the standard
  near-dup plan at 10^12 docs.
* :func:`simhash_pairs` — Charikar 2002: 64-bit simhash, 4×16-bit chunk
  index (pigeonhole: hamming ≤ 3 ⇒ some chunk equal), verify with
  ``bit_count(xor)`` in SQL.
* :func:`ngram_jaccard_pairs` — exact n-gram Jaccard via shingle explode
  + self-join; quadratic in cluster size, so it's the *verifier* for LSH
  candidates, not the discovery path (the ``candidates`` arg).
* :func:`duplicated_passages` — SUB-document dedup (the Lee et al. 2022
  "Deduplicating Training Data Makes Language Models Better" substring
  family, re-expressed over token shingles): maximal verbatim passages
  repeated across ≥ ``min_docs`` documents, merged from consecutive
  duplicated shingle positions. Never materializes document PAIRS —
  output is bounded by the corpus's own token positions, so it scales
  where pair-based plans explode.

All thresholds/seeds are explicit so two runs (or cluster sizes) agree
bit-for-bit.
"""

from __future__ import annotations

from typing import NamedTuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from ..functions.udfs import fingerprint_udf, minhash_udf, simhash_udf

__all__ = [
    "exact_dup_clusters",
    "exact_dedup",
    "minhash_lsh_pairs",
    "simhash_pairs",
    "ngram_jaccard_pairs",
    "duplicated_passages",
    "trim_duplicated_passages",
    "connected_components",
    "minhash_banded",
    "hot_buckets",
    "hot_shingles",
    "contamination_overlap",
    "benchmark_shingle_set",
    "BenchmarkShingles",
]


def _cap_hot_buckets(banded: DataFrame, keys: list, cap: int | None) -> DataFrame:
    """Drop LSH buckets with more than ``cap`` members before the
    self-join (a degenerate band value — empty docs, boilerplate-identical
    shards — makes one bucket quadratic at corpus scale).

    NOT silent: callers audit the dropped buckets with :func:`hot_buckets`
    (same keys/cap), and the documented composition is exact-dedup FIRST
    (`exact_dedup`) so byte-identical mass never reaches the LSH join —
    the cap then only fires on adversarial/degenerate residue."""
    if cap is None:
        return banded
    hot = (
        banded.groupBy(*keys)
        .agg(F.count("*").alias("_bn"))
        .filter(F.col("_bn") > cap)
        .select(*keys)
    )
    # hot is small by construction (few degenerate buckets) → broadcast anti-join
    return banded.join(F.broadcast(hot), keys, "left_anti")


def hot_buckets(banded: DataFrame, keys: list, cap: int) -> DataFrame:
    """Audit frame for the bucket cap: (keys..., n_members) of every
    bucket the cap would drop. Count/log it next to the pair output so a
    capped run is never mistaken for full coverage."""
    return (
        banded.groupBy(*keys)
        .agg(F.count("*").alias("n_members"))
        .filter(F.col("n_members") > cap)
    )


def exact_dup_clusters(
    df: DataFrame,
    text_col: str = "text",
    key: str = "doc_id",
    include_members: bool = True,
    max_members: int = 1000,
) -> DataFrame:
    """Groups of byte-identical (normalized) documents: one row per
    duplicated fingerprint with member count and the keeper (min key).

    ``members`` is a SAMPLE capped at ``max_members`` (the true size is
    always ``n_dups``), and the cap is enforced BEFORE the aggregation:
    a ``row_number()`` window over ``fp`` keeps only the ``max_members``
    smallest keys per fingerprint, so the ``collect_list`` buffer itself
    is bounded — a 10^9-row boilerplate cluster costs the window sort
    (disk-spillable) plus a ``max_members``-entry buffer, never a
    10^9-entry in-memory list. ``include_members=False`` skips the
    window entirely (count + keeper via plain map-side-combining agg);
    recover any cluster's full membership with a targeted ``fp`` filter.
    """
    fp_df = df.withColumn("fp", fingerprint_udf(F.col(text_col))).select("fp", key)
    if not include_members:
        return (
            fp_df.groupBy("fp")
            .agg(F.count("*").alias("n_dups"), F.min(key).alias("keeper"))
            .filter(F.col("n_dups") > 1)
        )
    from pyspark.sql import Window

    w = Window.partitionBy("fp")
    ranked = fp_df.select(
        "fp",
        key,
        F.row_number().over(w.orderBy(key)).alias("_rn"),
        F.count("*").over(w).alias("_n"),
    )
    # the groupBy reuses the window's hash(fp) partitioning — no second
    # exchange; members are the max_members smallest keys, sorted (the
    # same sample the old post-agg sort_array+slice produced)
    return (
        ranked.filter((F.col("_n") > 1) & (F.col("_rn") <= max_members))
        .groupBy("fp")
        .agg(
            F.max("_n").alias("n_dups"),
            F.min(key).alias("keeper"),
            F.sort_array(F.collect_list(key)).alias("members"),
        )
    )


def exact_dedup(df: DataFrame, text_col: str = "text", key: str = "doc_id") -> DataFrame:
    """Keep exactly one row (min key) per normalized fingerprint.

    Window-free plan: groupBy(fp).min(key) then semi-join back — two
    narrow shuffles on the same key, no sort, no skew from a global
    window."""
    keepers = (
        df.withColumn("fp", fingerprint_udf(F.col(text_col)))
        .groupBy("fp")
        .agg(F.min(key).alias(key))
        .select(key)
    )
    return df.join(keepers, key, "left_semi")


def minhash_banded(
    df: DataFrame,
    text_col: str = "text",
    key: str = "doc_id",
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
    seed: int = 1,
) -> DataFrame:
    """(k, band, band_hash) banding of the MinHash signatures — the
    shared input of the pair self-join and the :func:`hot_buckets` audit."""
    if num_perm % bands:
        raise ValueError("bands must divide num_perm")
    rows = num_perm // bands
    from ..plans.skew import maybe_decluster

    src = maybe_decluster(df.select(F.col(key).alias("k"), F.col(text_col)), "k")
    sig = src.select(
        "k",
        minhash_udf(num_perm, shingle_k, seed)(F.col(text_col)).alias("sig"),
    )
    # posexplode_outer: avoids the implicit size()>0 pushdown that would
    # re-evaluate the minhash UDF twice (the band array is never empty)
    return sig.select(
        "k",
        F.posexplode_outer(
            F.expr(
                f"transform(sequence(0, {bands - 1}), "
                f"b -> xxhash64(cast(b as string), "
                f"cast(slice(sig, b * {rows} + 1, {rows}) as string)))"
            )
        ).alias("band", "band_hash"),
    )


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    key: str = "doc_id",
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
    seed: int = 1,
    max_bucket_size: int | None = 1000,
) -> DataFrame:
    """Candidate near-duplicate pairs via banded MinHash LSH.

    rows = num_perm // bands hashes per band; two docs collide if any
    band's sub-signature matches exactly. Returns distinct (a, b) with
    a < b plus the number of colliding bands (a cheap similarity proxy;
    exact Jaccard verification belongs to :func:`ngram_jaccard_pairs`).

    ``max_bucket_size`` is the hot-bucket guard (see
    :func:`_cap_hot_buckets`): run :func:`exact_dedup` first so identical
    mass never forms a quadratic bucket, audit drops via
    :func:`hot_buckets`.

    The banded frame stays persisted until the caller releases it with
    ``plans.cache.release_persisted(result)`` (after consuming the
    result) — unpersisting inside this call would recompute the
    signature UDF on both self-join sides.
    """
    from ..plans.cache import attach_persisted

    banded = _cap_hot_buckets(
        minhash_banded(df, text_col, key, num_perm, bands, shingle_k, seed),
        ["band", "band_hash"],
        max_bucket_size,
    )
    # compute the signature matrix ONCE: the self-join otherwise rebuilds
    # the whole upstream (scan + signature UDF + explode) on BOTH sides —
    # measured 2 ArrowEvalPython nodes, 0 ReusedExchange, ~1.8x wall.
    # MEMORY_AND_DISK so a 10^12-row run spills instead of recomputing;
    # for repeated dedup over the same corpus, persist signatures to a
    # table instead (the fingerprint-index pattern of operators/ann_index).
    banded = banded.persist(StorageLevel.MEMORY_AND_DISK)
    pairs = (
        banded.alias("l")
        .join(
            banded.alias("r"),
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.band_hash") == F.col("r.band_hash"))
            & (F.col("l.k") < F.col("r.k")),
        )
        .groupBy(F.col("l.k").alias("a"), F.col("r.k").alias("b"))
        .agg(F.count("*").alias("n_bands"))
    )
    return attach_persisted(pairs, [banded])


def simhash_pairs(
    df: DataFrame,
    text_col: str = "text",
    key: str = "doc_id",
    max_hamming: int = 3,
    max_bucket_size: int | None = 1000,
) -> DataFrame:
    """Near-dup pairs by SimHash: 4×16-bit chunk blocking + exact
    hamming verify. With max_hamming ≤ 3, pigeonhole guarantees recall
    over the 4-chunk index.

    ``max_bucket_size`` guards degenerate chunk buckets exactly like
    :func:`minhash_lsh_pairs` (compose with :func:`exact_dedup` first;
    audit with :func:`hot_buckets` on (chunk, chunk_val)). Release the
    internal cache with ``plans.cache.release_persisted(result)`` after
    consuming the result."""
    from ..plans.cache import attach_persisted
    from ..plans.skew import maybe_decluster

    src = maybe_decluster(df.select(F.col(key).alias("k"), F.col(text_col)), "k")
    sig = src.select("k", simhash_udf(F.col(text_col)).alias("sh"))
    chunks = sig.select(
        "k",
        "sh",
        F.posexplode_outer(
            F.expr(
                "transform(sequence(0, 3), "
                "c -> cast(shiftright(sh, c * 16) & 65535 as int))"
            )
        ).alias("chunk", "chunk_val"),
    )
    chunks = _cap_hot_buckets(chunks, ["chunk", "chunk_val"], max_bucket_size)
    # single signature pass for the self-join (see minhash_lsh_pairs)
    chunks = chunks.persist(StorageLevel.MEMORY_AND_DISK)
    pairs = (
        chunks.alias("l")
        .join(
            chunks.alias("r"),
            (F.col("l.chunk") == F.col("r.chunk"))
            & (F.col("l.chunk_val") == F.col("r.chunk_val"))
            & (F.col("l.k") < F.col("r.k")),
        )
        .select(
            F.col("l.k").alias("a"),
            F.col("r.k").alias("b"),
            F.expr("bit_count(l.sh ^ r.sh)").alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )
    return attach_persisted(pairs, [chunks])


def connected_components(
    pairs: DataFrame,
    a_col: str = "a",
    b_col: str = "b",
    max_iter: int = 20,
) -> DataFrame:
    """Connected components of an undirected pair list → (v, cluster).

    Iterative min-label propagation (the standard Spark CC shape:
    alternate a neighbor-min join with a groupBy-min merge until no label
    changes; converges in O(diameter) rounds, and near-dup graphs are
    shallow). Each round is two shuffles on the vertex key;
    ``localCheckpoint`` cuts the lineage so round N's plan doesn't replay
    rounds 1..N-1 — the property that matters when the edge list is
    10^9+ rows. Labels are the MIN vertex id per component, giving the
    deterministic 'keeper' election for dedup
    (compose: exact_dedup → minhash_lsh_pairs → ngram_jaccard_pairs →
    connected_components → keep rows where v == cluster).

    Checkpoint-block hygiene: each round's ``localCheckpoint`` blocks
    are unpersisted as soon as the NEXT round has materialized (a
    long-lived session would otherwise hold every round's labels until
    context-cleaner GC); the FINAL round's blocks back the returned
    frame, so they ride out as a ``CheckpointBlocksHandle`` — call
    ``plans.cache.release_persisted(result)`` strictly AFTER writing/
    collecting the result (checkpointed plans have no lineage; early
    release errors instead of recomputing)."""
    from ..plans.cache import (
        CheckpointBlocksHandle,
        attach_persisted,
        persistent_rdd_ids,
    )

    sc = pairs.sparkSession.sparkContext
    prev_ckpt_ids: set = set()
    edges = pairs.select(F.col(a_col).alias("s"), F.col(b_col).alias("d"))
    sym = edges.union(edges.select(F.col("d").alias("s"), F.col("s").alias("d")))
    labels = sym.select(F.col("s").alias("v")).distinct().withColumn(
        "cluster", F.col("v")
    )
    for _ in range(max_iter):
        nbr = sym.join(labels, sym.d == labels.v).select(
            F.col("s").alias("v"), "cluster"
        )
        # pointer jumping: also adopt the label OF the current label
        # (label-of-label join) — propagation distance doubles each
        # round, so convergence is O(log diameter) instead of
        # O(diameter); a 10^6-long near-dup chain finishes in ~20
        # rounds instead of overflowing max_iter
        jump = (
            labels.alias("x")
            .join(labels.alias("y"), F.col("x.cluster") == F.col("y.v"))
            .select(F.col("x.v").alias("v"), F.col("y.cluster").alias("cluster"))
        )
        pre_ids = persistent_rdd_ids(sc)
        new_labels = (
            nbr.union(labels)
            .union(jump)
            .groupBy("v")
            .agg(F.min("cluster").alias("cluster"))
            .localCheckpoint(eager=True)
        )
        ckpt_ids = persistent_rdd_ids(sc) - pre_ids
        # localCheckpoint persists exactly ONE RDD, so the diff must be a
        # singleton. Any other cardinality means concurrent driver
        # activity (another thread persisting/checkpointing on the same
        # SparkContext) interleaved with the diff window — unpersisting a
        # foreign id would destroy another job's only copy (checkpoint
        # blocks have no lineage). Track nothing in that case and let the
        # context cleaner GC this round's blocks; the single-threaded
        # leak-audit tests would catch a systematic mis-count here.
        if len(ckpt_ids) != 1:
            ckpt_ids = set()
        changed = (
            new_labels.join(
                labels.withColumnRenamed("cluster", "_old"), "v"
            )
            .filter(F.col("cluster") != F.col("_old"))
            .count()
        )
        # the previous round's checkpoint blocks are consumed by both
        # the eager materialization above and the changed-count — free
        # them now instead of waiting for context-cleaner GC
        if prev_ckpt_ids:
            CheckpointBlocksHandle(sc, prev_ckpt_ids).unpersist()
        prev_ckpt_ids = ckpt_ids
        labels = new_labels
        if changed == 0:
            break
    else:
        # partially-propagated labels are silently WRONG clusters (a
        # >max_iter-diameter chain splits into several components) —
        # fail loudly; near-dup graphs this deep mean max_iter, not the
        # data, is miscalibrated
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} "
            f"iterations ({changed} labels still changing) — raise "
            "max_iter (component diameter exceeds it)"
        )
    result = labels.select(F.col("v"), F.col("cluster"))
    if prev_ckpt_ids:
        result = attach_persisted(
            result, [CheckpointBlocksHandle(sc, prev_ckpt_ids)]
        )
    return result


def _shingle_explode(
    df: DataFrame,
    text_col: str,
    key: str,
    n: int,
    distinct: bool = True,
    decluster: bool = True,
) -> DataFrame:
    """(k, sh) rows: word n-gram shingles per document, exploded
    JVM-side (regex split + transform + array_distinct — no Python).
    ``distinct=False`` keeps repeated shingles (one row per OCCURRENCE)
    — the contamination sweep's raw-hit count needs it; every similarity
    caller wants the default set semantics. Empty-string shingles
    (whitespace-only docs) are dropped in BOTH modes, matching the
    streaming twin's degenerate-case behavior.

    The word array is projected ONCE below the Generate: writing
    ``split(lower(text))`` inside the transform lambda re-evaluates it
    per shingle index (higher-order-function lambdas are not
    subexpression-eliminated against outer scope), making shingling
    O(words²) character work per document — a 2,000-word doc would
    re-split its full text 2,000 times. Catalyst keeps the non-cheap
    multi-referenced alias un-inlined; the plan shape is pinned by
    tests/test_dedup_similarity.py::test_shingle_plan_single_split."""
    # leading/trailing whitespace makes split() emit empty boundary
    # tokens; unfiltered they corrupt boundary shingles (concat_ws keeps
    # empties, so "a b " shingles as "a b " ≠ "a b") and give a
    # whitespace-ONLY doc a single-space shingle that would collide with
    # every other whitespace-only doc. Words are what shingle: drop ''.
    #
    # ``decluster``: the split/explode multiplies each input row into
    # ~n_tokens rows of derived work, so a narrow source (one small
    # parquet file → 1-2 scan splits) would run the whole shingle pass
    # on 1-2 cores (guide §2.5 input skew). maybe_decluster adds a
    # cheap pre-explode exchange ONLY when the scan is narrower than
    # the cluster; at corpus scale it is a no-op. Callers whose key is
    # constant (benchmark shingle sets) must pass False — hashing a
    # constant key would collapse to ONE partition.
    src = df.select(F.col(key).alias("k"), F.col(text_col))
    if decluster:
        from ..plans.skew import maybe_decluster

        src = maybe_decluster(src, "k")
    words = src.select(
        "k",
        F.filter(
            F.split(F.lower(F.col(text_col)), r"\s+"), lambda x: x != ""
        ).alias("_w"),
    )
    arr = F.expr(
        f"transform(sequence(0, greatest(size(_w) - {n}, 0)), "
        f"i -> concat_ws(' ', slice(_w, i + 1, {n})))"
    )
    if distinct:
        arr = F.array_distinct(arr)
    return words.select("k", F.explode(arr).alias("sh")).filter(F.col("sh") != "")


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    key: str = "doc_id",
    n: int = 3,
    threshold: float = 0.8,
    candidates: DataFrame | None = None,
    max_shingle_df: int | None = None,
) -> DataFrame:
    """Exact word-n-gram Jaccard similarity pairs.

    Plan: explode distinct shingles (JVM-side regex/split), self-join on
    shingle, count intersections, compute |A∪B| = |A|+|B|-|A∩B|. If
    ``candidates`` (columns a, b) is given — e.g. LSH output — the
    shingle join is semi-joined down to those pairs first, which is the
    only shape that survives 10^12 docs.

    ``max_shingle_df`` is the bare-mode hot-shingle guard (df-cut): a
    shingle appearing in more than that many documents is dropped from
    the INTERSECTION join (sizes keep the full sets), because one
    boilerplate shingle shared by k docs alone costs k² join rows.
    Dropping can only lower intersection counts, so scores of pairs
    touching hot shingles are UNDERestimates — an approximation, off by
    default (None = exact); audit what would drop with
    :func:`hot_shingles` before enabling.
    """
    from ..plans.cache import attach_persisted

    handles: list = []
    if candidates is not None and max_shingle_df is None:
        # Restrict the corpus to candidate ENDPOINT documents before a
        # single token is shingled: every downstream consumer (both
        # self-join sides and the |A|/|B| size aggregation) only ever
        # reads shingles of docs appearing in a candidate pair, and the
        # endpoint set is orders of magnitude smaller than the corpus
        # in the LSH-candidate regime this mode exists for. The old
        # shape applied the pair join AFTER a full-corpus explode, so
        # the explode (and the sizes agg) processed every document —
        # and the r-side join shuffled the full corpus shingle set.
        # (Skipped when a df-cut is requested: max_shingle_df counts
        # document frequency over the WHOLE corpus by contract.)
        #
        # The candidate frame is persisted first: it now has THREE plan
        # references (the endpoint broadcast + the pair probe) and is
        # typically an LSH discovery output whose banded self-join
        # would otherwise re-run per reference (measured: the q26
        # candidate agg re-evaluated 3-4x). Handle rides the result —
        # release with ``plans.cache.release_persisted(result)`` (any
        # handles already attached to ``candidates`` ride along too).
        handles.extend(getattr(candidates, "_donut_persisted", ()))
        candidates = candidates.persist(StorageLevel.MEMORY_AND_DISK)
        handles.append(candidates)
        ids = (
            candidates.select(F.explode(F.array("a", "b")).alias(key))
            .distinct()
        )
        df = df.join(F.broadcast(ids), key, "left_semi")
    shingled = _shingle_explode(df, text_col, key, n)
    sizes = shingled.groupBy("k").agg(F.count("*").alias("sz"))

    if max_shingle_df is not None:
        # df-cut AFTER sizes: |A| and |B| stay exact, only the join loses
        # the hot shingles (see docstring for the semantics)
        hot = (
            shingled.groupBy("sh")
            .agg(F.count("*").alias("_df"))
            .filter(F.col("_df") > max_shingle_df)
            .select("sh")
        )
        shingled = shingled.join(F.broadcast(hot), "sh", "left_anti")

    if candidates is not None:
        # scale shape: restrict BOTH shingle sides to candidate endpoints
        # BEFORE the self-join — the hot-shingle explosion never happens
        cands = candidates.select("a", "b")
        joined = (
            cands.join(
                shingled.alias("l"), F.col("a") == F.col("l.k"), "inner"
            )
            .join(
                shingled.alias("r"),
                (F.col("b") == F.col("r.k")) & (F.col("l.sh") == F.col("r.sh")),
                "inner",
            )
            .groupBy("a", "b")
            .agg(F.count("*").alias("inter"))
        )
    else:
        joined = (
            shingled.alias("l")
            .join(
                shingled.alias("r"),
                (F.col("l.sh") == F.col("r.sh")) & (F.col("l.k") < F.col("r.k")),
            )
            .groupBy(F.col("l.k").alias("a"), F.col("r.k").alias("b"))
            .agg(F.count("*").alias("inter"))
        )
    out = (
        joined.join(sizes.withColumnRenamed("k", "a").withColumnRenamed("sz", "sz_a"), "a")
        .join(sizes.withColumnRenamed("k", "b").withColumnRenamed("sz", "sz_b"), "b")
        .withColumn("jaccard", F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")))
        .filter(F.col("jaccard") >= threshold)
        .select("a", "b", "jaccard")
    )
    return attach_persisted(out, handles) if handles else out


def hot_shingles(
    df: DataFrame,
    text_col: str = "text",
    key: str = "doc_id",
    n: int = 3,
    max_shingle_df: int = 1000,
) -> DataFrame:
    """Audit frame for :func:`ngram_jaccard_pairs`'s df-cut: the
    (shingle, doc-frequency) rows a given ``max_shingle_df`` would drop
    from the intersection join. Log its count next to a capped run — a
    df-cut result must never be mistaken for the exact one."""
    shingled = _shingle_explode(df, text_col, key, n)
    return (
        shingled.groupBy("sh")
        .agg(F.count("*").alias("doc_freq"))
        .filter(F.col("doc_freq") > max_shingle_df)
    )


class BenchmarkShingles(NamedTuple):
    """A benchmark's distinct shingle set WITH the n-gram size it was
    built at: consumers (the streaming filter) take the whole pair, so
    a benchmark built at n=13 can never be silently probed with 8-gram
    corpus shingles and return zero hits — the same no-silent-parameter-
    mix discipline as the ANN index _meta.json sidecars."""

    n: int
    shingles: frozenset


def benchmark_shingle_set(
    benchmark: DataFrame, text_col: str = "text", n: int = 8
) -> BenchmarkShingles:
    """Driver-side distinct shingle set of an evaluation corpus — the
    broadcastable side of a contamination sweep (benchmark sets are
    small by definition; the corpus never is). Shingle semantics are
    IDENTICAL to :func:`_shingle_explode` (computed by it), so the
    streaming filter built on this set flags exactly the rows the batch
    :func:`contamination_overlap` would."""
    # the key column is projected away before distinct — a constant
    # stands in so no real key column is required of the benchmark
    rows = (
        _shingle_explode(
            benchmark.select(F.lit(0).alias("_k"), text_col),
            text_col,
            "_k",
            n,
            decluster=False,  # constant key would hash to ONE partition
        )
        .select("sh")
        .distinct()
        .collect()
    )
    return BenchmarkShingles(n, frozenset(r.sh for r in rows))


def contamination_overlap(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    key: str = "doc_id",
    n: int = 8,
    min_hits: int = 1,
) -> DataFrame:
    """Benchmark-contamination check: corpus documents sharing word
    ``n``-gram shingles with an evaluation set (the standard train/test
    leak sweep — long shingles, e.g. 8-13 grams, so chance collisions
    vanish and any hit is a verbatim excerpt).

    Scale shape: the benchmark side is orders of magnitude smaller than
    the corpus, so its DISTINCT shingle set is broadcast and the corpus
    shingles stream through a broadcast hash join — the 10^12-doc scan
    never shuffles. Returns (doc_id, n_hits, n_distinct_hits) for
    corpus docs with at least ``min_hits`` overlapping shingle
    OCCURRENCES: ``n_hits`` counts every corpus-side occurrence (a doc
    quoting the same benchmark sentence three times reports 3 —
    repetition is leak evidence), ``n_distinct_hits`` the distinct
    overlapping shingles.
    """
    c_sh = _shingle_explode(corpus, text_col, key, n, distinct=False)
    # benchmark side: orders of magnitude smaller, skip the decluster
    # probe/exchange (its distinct shuffle spreads the work anyway)
    b_sh = (
        _shingle_explode(benchmark, text_col, key, n, decluster=False)
        .select("sh")
        .distinct()
    )
    return (
        c_sh.join(F.broadcast(b_sh), "sh")
        .groupBy(F.col("k").alias(key))
        .agg(
            F.count("*").alias("n_hits"),
            F.count_distinct("sh").alias("n_distinct_hits"),
        )
        .filter(F.col("n_hits") >= min_hits)
    )


def duplicated_passages(
    df: DataFrame,
    text_col: str = "text",
    key: str = "doc_id",
    n: int = 8,
    min_docs: int = 2,
    max_doc_freq: int | None = None,
    persist: bool = False,
) -> DataFrame:
    """Maximal verbatim passages repeated across ≥ ``min_docs`` docs.

    Sub-document dedup (Lee et al. 2022's substring family over word
    ``n``-gram shingles): every shingle POSITION whose shingle occurs in
    at least ``min_docs`` distinct documents is a duplicated token run;
    consecutive duplicated positions merge into one maximal passage.
    Returns one row per ``(doc, passage)``: ``(key, start_tok, end_tok,
    n_tokens, n_shingles, max_doc_freq)`` — 0-based token indices into
    the ''-filtered whitespace split of ``lower(text_col)``, the same
    tokenization every shingle operator here uses. Trimming
    ``[start_tok, end_tok]`` from each doc is the Lee et al. dedup;
    the row set alone is a repetition audit.

    ``max_doc_freq`` EXCLUDES shingles above a document-frequency cap —
    stop-phrase boilerplate ("all rights reserved …") that would mark
    half the corpus duplicated; None keeps everything.

    Scale shape (the reason this is not a pair plan): document pairs
    are never formed. Four key-bounded exchanges — (a) distinct
    (shingle, doc) with map-side partial dedup, (b) count per shingle,
    (c) positions ⟕ duplicated-shingles equi-join on the 8-byte
    ``xxhash64`` shingle key (join OUTPUT ≤ position rows — no
    explosion; a hot shingle is an AQE skew-join case, not a blowup),
    (d) the per-doc run-merge window, bounded by each document's own
    length. Output rows ≤ input shingle positions at every scale.
    Shingle identity is xxhash64(64-bit): at 10^12 docs a collision can
    mark an isolated position duplicated — the same accepted trade
    minhash banding makes; the q15 oracle replays groups on the shingle
    STRINGS, so the small-scale gate would catch a broken hash.

    The positions frame feeds BOTH the doc-frequency aggregation and the
    join, so by default the corpus is scanned (and shingled) twice —
    map-only work, often cheaper than materializing one row per token.
    ``persist=True`` caches the positions frame instead (one evaluation,
    ~n_tokens rows of storage); the handle rides the result per
    ``plans.cache`` — release with ``release_persisted(result)`` after
    consuming.
    """
    from pyspark.sql import Window

    from ..plans.cache import attach_persisted
    from ..plans.skew import maybe_decluster

    # decluster the narrow-scan case (guide §2.5): the explode derives
    # ~n_tokens rows of work per document, so a 1-2-split local scan
    # would shingle the whole corpus on 1-2 cores; no-op at corpus
    # scale where the scan is already wide (see _shingle_explode).
    src = maybe_decluster(df.select(F.col(key).alias("k"), F.col(text_col)), "k")
    words = src.select(
        "k",
        F.filter(
            F.split(F.lower(F.col(text_col)), r"\s+"), lambda x: x != ""
        ).alias("_w"),
    )
    # (k, nw, pos, gh): one row per shingle POSITION (not distinct —
    # positions are the output), gh the 64-bit shingle key. Same
    # single-split discipline as _shingle_explode (O(words) not
    # O(words²)): _w is projected once below the Generate.
    pos = (
        words.select(
            "k",
            F.size("_w").alias("nw"),
            F.posexplode(
                F.expr(
                    f"transform(sequence(0, greatest(size(_w) - {n}, 0)), "
                    f"i -> concat_ws(' ', slice(_w, i + 1, {n})))"
                )
            ).alias("pos", "sh"),
        )
        .filter(F.col("sh") != "")
        .withColumn("gh", F.xxhash64("sh"))
        .drop("sh")
    )
    handles = []
    if persist:
        pos = pos.persist(StorageLevel.MEMORY_AND_DISK)
        handles.append(pos)
    dup = (
        pos.select("gh", "k")
        .distinct()  # map-side partial dedup before the shuffle
        .groupBy("gh")
        .agg(F.count("*").alias("doc_freq"))
        .filter(F.col("doc_freq") >= min_docs)
    )
    if max_doc_freq is not None:
        dup = dup.filter(F.col("doc_freq") <= max_doc_freq)
    marked = pos.join(dup, "gh")
    # gaps-and-islands: duplicated positions are strictly increasing
    # distinct ints per doc, so pos - row_number() is constant exactly
    # within a consecutive run — one window pass, no lag/sum chain
    w = Window.partitionBy("k").orderBy("pos")
    runs = marked.withColumn("_run", F.col("pos") - F.row_number().over(w))
    out = (
        runs.groupBy(F.col("k").alias(key), "_run")
        .agg(
            F.min("pos").cast("long").alias("start_tok"),
            # a shingle at pos covers tokens pos .. min(pos+n, nw)-1
            # (short docs produce one short shingle, same convention as
            # _shingle_explode)
            (F.least(F.max("pos") + n, F.max("nw")) - 1)
            .cast("long")
            .alias("end_tok"),
            F.count("*").cast("long").alias("n_shingles"),
            F.max("doc_freq").cast("long").alias("max_doc_freq"),
        )
        .withColumn(
            "n_tokens", (F.col("end_tok") - F.col("start_tok") + 1)
        )
        .drop("_run")
    )
    return attach_persisted(out, handles) if handles else out


def trim_duplicated_passages(
    df: DataFrame,
    passages: DataFrame,
    text_col: str = "text",
    key: str = "doc_id",
    keep_whole_doc: bool = True,
) -> DataFrame:
    """Remove flagged duplicated passages from each document's text —
    the apply half of the Lee et al. 2022 pipeline (detect with
    :func:`duplicated_passages`, trim here). Adds a
    ``<text_col>_trimmed`` column (lowercased, single-space joined —
    the detector's own token space).

    Token indices in ``passages`` (``start_tok``/``end_tok``) refer to
    the SAME ''-filtered whitespace split of ``lower(text)`` the
    detector used, so the two compose exactly. Lee et al. §4 removes
    every flagged span and keeps the surviving non-duplicated text;
    ``keep_whole_doc=True`` (default) additionally exempts passages
    covering a document's ENTIRE text, so exact whole-doc duplicates
    are left to document-level dedup instead of being silently
    annihilated to empty strings (set False for the strict behavior).

    Scale shape: one per-doc aggregation of the passage spans (output
    ≤ one row per doc) joined onto the corpus, then a single JVM
    projection (split → indexed filter via ``transform``+``exists`` →
    ``concat_ws``) — map-only after the join, no Python.
    """
    spans = passages.groupBy(F.col(key).alias("_k")).agg(
        F.collect_list(F.struct("start_tok", "end_tok")).alias("_spans")
    )
    joined = df.join(spans, df[key] == spans["_k"], "left").drop("_k")
    words = F.filter(
        F.split(F.lower(F.col(text_col)), r"\s+"), lambda x: x != ""
    )
    n_words = F.size(words)

    def _kept(ws):
        idx = F.transform(
            ws, lambda w, i: F.struct(w.alias("w"), i.alias("i"))
        )
        def flagged(s):
            def covers(p):
                hit = (s["i"] >= p["start_tok"]) & (s["i"] <= p["end_tok"])
                if keep_whole_doc:
                    # passages covering the whole doc are exempt
                    hit = hit & ~(
                        (p["start_tok"] == 0) & (p["end_tok"] == n_words - 1)
                    )
                return hit

            return F.exists(F.col("_spans"), covers)

        return F.filter(idx, lambda s: ~flagged(s))

    trimmed = F.when(
        F.col("_spans").isNull(), F.lower(F.col(text_col))
    ).otherwise(F.concat_ws(" ", F.transform(_kept(words), lambda s: s["w"])))
    return joined.withColumn(f"{text_col}_trimmed", trimmed).drop("_spans")
