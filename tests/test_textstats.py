"""Unit tests for the text-analysis kernels."""

import numpy as np

from donut_spark.core.textstats import (
    char_ngrams,
    count_tokens,
    detect_lang,
    fingerprint64,
    hamming64,
    jaccard,
    minhash_signature,
    simhash64,
    word_shingles,
)


def test_detect_lang_cjk():
    assert detect_lang("안녕하세요 세계 여러분") == "ko"
    assert detect_lang("これはテストです") == "ja"
    assert detect_lang("这是一个测试文档") == "zh"


def test_detect_lang_latin():
    assert detect_lang("the quick brown fox is on the hill and it was there") == "en"
    assert detect_lang("el perro y el gato en la casa de su madre no era para") == "es"
    assert detect_lang("xyzzy qwerty plugh") == "und"
    assert detect_lang("") == "und"


def test_count_tokens():
    assert count_tokens("a b  c") == 3
    assert count_tokens("") == 0
    assert count_tokens("don't stop", "bpe") >= 3  # don / 't / stop
    assert count_tokens("abc123 def", "bpe") == 3


def test_fingerprint_normalization():
    assert fingerprint64("Hello,  World!") == fingerprint64("hello world")
    assert fingerprint64("a") != fingerprint64("b")


def test_shingles():
    assert word_shingles("a b c d", 3) == ["a b c", "b c d"]
    assert word_shingles("a b", 3) == ["a b"]
    assert word_shingles("", 3) == []
    assert char_ngrams("abcd", 3) == ["abc", "bcd"]


def test_minhash_similar_docs_agree_more():
    a = "the quick brown fox jumps over the lazy dog near the river bank today"
    b = a.replace("lazy", "sleepy")
    c = "completely different content about spark partitions and shuffles"
    sa = minhash_signature(word_shingles(a), 128)
    sb = minhash_signature(word_shingles(b), 128)
    sc = minhash_signature(word_shingles(c), 128)
    sim_ab = np.mean(sa == sb)
    sim_ac = np.mean(sa == sc)
    assert sim_ab > sim_ac
    assert sim_ab > 0.4
    # determinism
    assert np.array_equal(sa, minhash_signature(word_shingles(a), 128))


def test_minhash_empty():
    sig = minhash_signature([], 16)
    assert len(sig) == 16
    assert len(set(sig.tolist())) == 1


def test_simhash_locality():
    a = "the quick brown fox jumps over the lazy dog near the river bank"
    b = a + " okay"
    c = "orthogonal subject matter entirely unrelated to anything above xyz"
    assert hamming64(simhash64(a), simhash64(b)) < hamming64(
        simhash64(a), simhash64(c)
    )
    assert simhash64(a) == simhash64(a)


def test_jaccard():
    assert jaccard(["a", "b"], ["a", "b"]) == 1.0
    assert jaccard(["a"], ["b"]) == 0.0
    assert jaccard([], []) == 1.0


def test_mulmod_exact_property():
    """The limb-arithmetic universal hash must equal Python big-int math
    for arbitrary (a, b, x) — the uint64-wrap bug class this replaces."""
    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from donut_spark.core.textstats import _MERSENNE, _mulmod_p, _reduce_p

    @settings(max_examples=300, deadline=None)
    @given(
        a=st.integers(min_value=1, max_value=_MERSENNE - 1),
        b=st.integers(min_value=0, max_value=_MERSENNE - 1),
        x=st.integers(min_value=0, max_value=2**32 - 1),
    )
    def check(a, b, x):
        av = np.array([a], dtype=np.uint64)
        xv = np.array([x], dtype=np.uint64)
        got = int(_reduce_p(_mulmod_p(av, xv) + np.uint64(b))[0])
        assert got == (a * x + b) % _MERSENNE

    check()


def test_simhash_pigeonhole_blocking_is_exact_property():
    """The invariant the q25 oracle rests on: for hamming <= 3 over a
    64-bit simhash, the 4x16-bit chunk index has recall 1 (pigeonhole:
    <=3 differing bits can't touch all 4 chunks), so blocked pairs ==
    brute-force pairs — on arbitrary corpora, not just the fixtures."""
    import itertools

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from donut_spark.core.textstats import hamming64, simhash64

    words = st.sampled_from(
        "alpha beta gamma delta epsilon zeta eta theta iota kappa".split()
    )
    texts = st.lists(
        st.lists(words, min_size=3, max_size=30).map(" ".join),
        min_size=2,
        max_size=12,
    )

    @settings(max_examples=60, deadline=None)
    @given(texts)
    def check(docs):
        hashes = [simhash64(t) for t in docs]
        brute = {
            (i, j)
            for i, j in itertools.combinations(range(len(docs)), 2)
            if hamming64(hashes[i], hashes[j]) <= 3
        }

        def chunks(h):
            return [(c, (h >> (c * 16)) & 0xFFFF) for c in range(4)]

        blocked = {
            (i, j)
            for i, j in itertools.combinations(range(len(docs)), 2)
            if set(chunks(hashes[i])) & set(chunks(hashes[j]))
            and hamming64(hashes[i], hashes[j]) <= 3
        }
        assert blocked == brute

    check()


def test_minhash_udf_batched_matches_kernel(spark):
    """Round-6 pin: minhash_udf must stay bit-identical to the per-doc
    textstats.minhash_signature kernel, including empty/whitespace
    docs at batch boundaries (guards any future re-vectorization of
    the signature path)."""
    from pyspark.sql import functions as F

    from donut_spark.core import textstats
    from donut_spark.functions.udfs import minhash_udf

    texts = [
        "the quick brown fox jumps over the lazy dog",
        "",
        "   ",
        "one two",
        "a b c d e f g h i j",
        None,
        "the quick brown fox",
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], ["i", "t"])
    got = {
        r["i"]: r["sig"]
        for r in df.select("i", minhash_udf(64, 3, 1)(F.col("t")).alias("sig")).collect()
    }
    for i, t in enumerate(texts):
        want = [
            int(v)
            for v in textstats.minhash_signature(
                textstats.word_shingles(t or "", 3), 64, 1
            )
        ]
        assert got[i] == want, f"doc {i}"
