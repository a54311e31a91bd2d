"""Dedup + similarity operator tests with planted ground truth."""

import pytest
from pyspark.sql import functions as F

from donut_spark.operators.dedup import (
    exact_dedup,
    exact_dup_clusters,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_pairs,
)
from donut_spark.operators.similarity import (
    cosine_topk,
    embedding_near_dup_pairs,
    hyperplane_lsh_topk,
)

BASE = (
    "the quick brown fox jumps over the lazy dog while the river flows "
    "quietly past the old mill and the miller watches the water wheel turn"
)


@pytest.fixture(scope="module")
def planted(spark):
    rows = [
        ("d1", BASE),
        ("d2", BASE),  # exact dup of d1
        ("d3", BASE.replace("lazy", "sleepy")),  # near dup of d1
        ("d4", "completely unrelated text about catalyst optimizer rules"),
        ("d5", "another disjoint document mentioning shuffle partitions"),
        ("d6", BASE + " extra trailing words here"),  # near dup
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_exact_dup_clusters(planted):
    clusters = exact_dup_clusters(planted).collect()
    assert len(clusters) == 1
    assert clusters[0].members == ["d1", "d2"]
    assert clusters[0].keeper == "d1"


def test_exact_dedup_keeps_one(planted):
    kept = set(r.doc_id for r in exact_dedup(planted).collect())
    assert kept == {"d1", "d3", "d4", "d5", "d6"}


def test_minhash_lsh_finds_near_dups(planted):
    pairs = {(r.a, r.b) for r in minhash_lsh_pairs(planted, bands=32, num_perm=128).collect()}
    assert ("d1", "d2") in pairs
    assert ("d1", "d3") in pairs or ("d1", "d6") in pairs
    assert ("d4", "d5") not in pairs


def test_simhash_finds_near_dups(planted):
    pairs = {(r.a, r.b) for r in simhash_pairs(planted, max_hamming=10).collect()}
    assert ("d1", "d2") in pairs
    assert ("d4", "d5") not in pairs


def test_ngram_jaccard_exact_values(planted):
    out = {
        (r.a, r.b): r.jaccard
        for r in ngram_jaccard_pairs(planted, threshold=0.1).collect()
    }
    assert out[("d1", "d2")] == 1.0
    assert 0.1 < out[("d1", "d3")] < 1.0


def test_ngram_jaccard_with_candidates(planted):
    cands = minhash_lsh_pairs(planted, bands=32, num_perm=128)
    out = ngram_jaccard_pairs(planted, threshold=0.1, candidates=cands)
    pairs = {(r.a, r.b) for r in out.collect()}
    assert ("d1", "d2") in pairs


@pytest.fixture(scope="module")
def embeddings(spark):
    import math

    rows = []
    for i in range(100):
        # three clusters around axis directions + noise-free determinism
        base = i % 3
        vec = [0.0] * 8
        vec[base] = 1.0
        vec[(base + 3) % 8] = 0.3 * math.sin(i)
        rows.append((i, [float(v) for v in vec]))
    return spark.createDataFrame(rows, ["vec_id", "embedding"])


def test_cosine_topk_exact(embeddings):
    q = [1.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0]
    top = cosine_topk(embeddings, q, k=5).collect()
    assert len(top) == 5
    # all top hits are cluster-0 members (vec_id % 3 == 0)
    assert all(r.vec_id % 3 == 0 for r in top)
    assert top[0].cosine >= top[-1].cosine


def test_lsh_topk_recall_vs_brute(embeddings):
    q = [1.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0]
    brute = [r.vec_id for r in cosine_topk(embeddings, q, k=10).collect()]
    approx = [r.vec_id for r in hyperplane_lsh_topk(embeddings, q, k=10, n_bits=16, bands=8).collect()]
    recall = len(set(brute) & set(approx)) / 10
    assert recall >= 0.7


def test_ivf_topk_recall_vs_brute(embeddings):
    from donut_spark.operators.similarity import ivf_topk

    q = [1.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0]
    brute = [r.vec_id for r in cosine_topk(embeddings, q, k=10).collect()]
    ivf = [
        r.vec_id
        for r in ivf_topk(embeddings, q, k=10, n_centroids=6, n_probe=3).collect()
    ]
    recall = len(set(brute) & set(ivf)) / 10
    assert recall >= 0.7
    # determinism: same codebook, same result
    ivf2 = [
        r.vec_id
        for r in ivf_topk(embeddings, q, k=10, n_centroids=6, n_probe=3).collect()
    ]
    assert ivf == ivf2


def test_embedding_near_dup_pairs(spark):
    rows = [
        (1, [1.0, 0.0, 0.0, 0.0]),
        (2, [0.999, 0.01, 0.0, 0.0]),   # near-dup of 1
        (3, [0.0, 1.0, 0.0, 0.0]),      # orthogonal
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    pairs = embedding_near_dup_pairs(df, threshold=0.99, n_bits=16, bands=8).collect()
    found = {(r.a, r.b) for r in pairs}
    assert (1, 2) in found
    assert (1, 3) not in found and (2, 3) not in found
