"""Text-analysis kernels for large-scale training-data pipelines.

These extend the reference's text handling (charset classifiers
`synth_table.py:20-31`, corpus cleanup `convert_synthtiger_data_to_
corpus.py:15-77`) with the standard web-corpus operators a 100 TB
pipeline needs: language identification, heuristic quality scoring
(C4/Gopher-style rules), tokenization, document fingerprinting, and the
MinHash/SimHash primitives behind near-duplicate detection (Broder 1997;
Charikar 2002).

Pure Python/numpy — wrapped into Arrow-batched pandas UDFs by
`donut_spark.functions.udfs` and driven at scale by
`donut_spark.operators.dedup`.
"""

from __future__ import annotations

import hashlib
import re
import zlib
from typing import Dict, List, Sequence

import numpy as np

__all__ = [
    "detect_lang",
    "quality_score",
    "count_tokens",
    "fingerprint64",
    "word_shingles",
    "char_ngrams",
    "minhash_signature",
    "simhash64",
    "hamming64",
    "jaccard",
    "STOPWORDS",
]

# Small deterministic stopword inventories for latin-script languages.
STOPWORDS: Dict[str, frozenset] = {
    "en": frozenset(
        "the of and to in a is that it for on with as are was at by an be "
        "this have from or had not but what all were when we there can".split()
    ),
    "es": frozenset(
        "el la de que y a en un ser se no haber por con su para como estar "
        "tener le lo todo pero más hacer o poder decir este ir otro".split()
    ),
    "fr": frozenset(
        "le de un être et à il avoir ne je son que se qui ce dans en du elle "
        "au pour pas que vous par sur faire plus dire me on mon".split()
    ),
    "de": frozenset(
        "der die und in den von zu das mit sich des auf für ist im dem nicht "
        "ein eine als auch es an werden aus er hat dass sie nach".split()
    ),
}

_CJK_RANGES = (
    ("ko", re.compile(r"[가-힣ᄀ-ᇿㄱ-㆏]")),
    ("ja", re.compile(r"[぀-ゟ゠-ヿㇰ-ㇿ]")),
    ("zh", re.compile(r"[一-鿿㐀-䶿]")),
)

_WORD_RE = re.compile(r"\w+", re.UNICODE)
# BPE-ish pre-tokenizer: contractions, letter runs, digit runs, other
# non-space glyph runs (the public GPT-2 pre-tokenization shape).
_BPE_RE = re.compile(
    r"'(?:s|t|re|ve|m|ll|d)| ?[^\W\d_]+| ?\d+| ?[^\s\w]+|\s+(?!\S)|\s+"
)
_PUNCT_RE = re.compile(r"[^\w\s]", re.UNICODE)
_NORM_RE = re.compile(r"[^\w]+", re.UNICODE)


def detect_lang(text: str) -> str:
    """Deterministic heuristic language ID.

    CJK scripts are decided by unicode ranges; latin-script text by
    stopword hit-rate over a small per-language inventory; ``und`` when
    nothing is confident.
    """
    if not text:
        return "und"
    for code, pattern in _CJK_RANGES:
        if len(pattern.findall(text)) >= 3:
            return code
    words = [w.lower() for w in _WORD_RE.findall(text)]
    if not words:
        return "und"
    best, best_hits = "und", 0
    for code, stop in STOPWORDS.items():
        hits = sum(1 for w in words if w in stop)
        if hits > best_hits:
            best, best_hits = code, hits
    if best_hits * 20 < len(words):  # <5% stopwords → unknown
        return "und"
    return best


def quality_score(text: str) -> float:
    """Composite heuristic quality score in [0, 1] (C4/Gopher-style).

    Components: length band, mean word length band, stopword presence,
    punctuation ratio, digit ratio, max single-word repetition share.
    """
    if not text:
        return 0.0
    words = _WORD_RE.findall(text)
    n = len(words)
    if n == 0:
        return 0.0
    score = 1.0
    # length band: very short or absurdly long docs are low quality
    if n < 5:
        score *= 0.2
    elif n < 20:
        score *= 0.7
    mean_len = sum(len(w) for w in words) / n
    if mean_len < 2.0 or mean_len > 12.0:
        score *= 0.5
    lowered = [w.lower() for w in words]
    stop_hits = sum(1 for w in lowered if w in STOPWORDS["en"])
    if stop_hits == 0 and detect_lang(text) in ("en", "und"):
        score *= 0.7
    punct_ratio = len(_PUNCT_RE.findall(text)) / max(len(text), 1)
    if punct_ratio > 0.25:
        score *= 0.5
    digit_ratio = sum(c.isdigit() for c in text) / max(len(text), 1)
    if digit_ratio > 0.4:
        score *= 0.5
    counts: Dict[str, int] = {}
    for w in lowered:
        counts[w] = counts.get(w, 0) + 1
    if max(counts.values()) / n > 0.2 and n >= 10:
        score *= 0.6  # dominated by one repeated token
    return round(score, 6)


def count_tokens(text: str, mode: str = "whitespace") -> int:
    """Token count: ``whitespace`` split or ``bpe``-ish regex pieces."""
    if not text:
        return 0
    if mode == "whitespace":
        return len(text.split())
    if mode == "bpe":
        return sum(1 for m in _BPE_RE.finditer(text) if m.group().strip())
    raise ValueError(f"unknown token mode: {mode}")


def _normalize_for_hash(text: str) -> str:
    return _NORM_RE.sub(" ", text).strip().lower()


def signed64(v: int) -> int:
    """Two's-complement view of an unsigned 64-bit value (the BIGINT
    representation both the Spark UDFs and the committed fingerprint
    fixtures must share — oracle parity depends on one definition)."""
    return v - (1 << 64) if v >= (1 << 63) else v


def fingerprint64(text: str) -> int:
    """Deterministic 64-bit content fingerprint of normalized text
    (blake2b-64 over the normalized byte stream — C-speed, stable
    across processes and platforms)."""
    digest = hashlib.blake2b(
        _normalize_for_hash(text).encode("utf-8"), digest_size=8
    ).digest()
    return int.from_bytes(digest, "big")


def word_shingles(text: str, k: int = 3) -> List[str]:
    """Word k-gram shingles of normalized text (k-shingling, Broder 1997)."""
    words = _normalize_for_hash(text).split()
    if len(words) < k:
        return [" ".join(words)] if words else []
    return [" ".join(words[i : i + k]) for i in range(len(words) - k + 1)]


def char_ngrams(text: str, n: int = 5) -> List[str]:
    """Character n-grams of normalized text."""
    s = _normalize_for_hash(text)
    if len(s) < n:
        return [s] if s else []
    return [s[i : i + n] for i in range(len(s) - n + 1)]


_MERSENNE = (1 << 61) - 1
_PERM_CACHE: Dict[tuple, tuple] = {}


def _perm_params(num_perm: int, seed: int):
    key = (num_perm, seed)
    if key not in _PERM_CACHE:
        rng = np.random.RandomState(seed)
        a = rng.randint(1, _MERSENNE, size=num_perm, dtype=np.uint64)
        b = rng.randint(0, _MERSENNE, size=num_perm, dtype=np.uint64)
        _PERM_CACHE[key] = (a, b)
    return _PERM_CACHE[key]


_U32 = np.uint64(0xFFFFFFFF)
_LOW29 = np.uint64((1 << 29) - 1)


def _reduce_p(y: np.ndarray) -> np.ndarray:
    """y mod (2^61-1) for y < 2^64, vectorized (fold high bits, one
    conditional subtract)."""
    p = np.uint64(_MERSENNE)
    r = (y >> np.uint64(61)) + (y & p)
    return np.where(r >= p, r - p, r)


def _mulmod_p(a: np.ndarray, x: np.ndarray) -> np.ndarray:
    """(a * x) mod (2^61-1), EXACT, in uint64 limb arithmetic.

    Requires a < 2^61, x < 2^32 (crc32 base hashes). Split a into 32-bit
    limbs: a*x = a_hi*x*2^32 + a_lo*x; each partial fits in uint64, and
    multiplying by 2^32 mod the Mersenne prime is a 29/32-bit rotate.
    """
    a_hi = a >> np.uint64(32)  # < 2^29
    a_lo = a & _U32
    t1 = _reduce_p(a_hi * x)  # a_hi*x < 2^61, no wrap
    # t1 * 2^32 mod p: t1 = h*2^29 + l  ⇒  t1*2^32 ≡ h + l*2^32 (mod p)
    rot = _reduce_p(((t1 & _LOW29) << np.uint64(32)) + (t1 >> np.uint64(29)))
    t0 = _reduce_p(a_lo * x)  # a_lo*x < 2^64, no wrap
    return _reduce_p(rot + t0)


def minhash_signature(
    shingles: Sequence[str], num_perm: int = 64, seed: int = 1
) -> np.ndarray:
    """MinHash signature via universal hashing h_i(x) = (a_i*x+b_i) mod p,
    computed EXACTLY (limb arithmetic — no silent uint64 wrap before the
    Mersenne mod, see :func:`_mulmod_p`), p = 2^61-1.

    Empty input yields the max-value signature (never collides with real
    docs). Returns uint64[num_perm].
    """
    a, b = _perm_params(num_perm, seed)
    if not shingles:
        return np.full(num_perm, np.uint64(_MERSENNE), dtype=np.uint64)
    base = np.array(
        [zlib.crc32(s.encode("utf-8")) for s in shingles], dtype=np.uint64
    )
    # (n_shingles, num_perm) — exact (a*x + b) mod p, numpy broadcasts
    prods = _reduce_p(_mulmod_p(a[None, :], base[:, None]) + b[None, :])
    return prods.min(axis=0)


def simhash64(text: str, ngram: int = 3) -> int:
    """64-bit SimHash over word n-gram features (Charikar 2002).

    Vectorized: one blake2b digest per feature (C speed), then a single
    ``np.unpackbits`` + column sum over the (n_features, 64) bit matrix.
    """
    feats = word_shingles(text, ngram)
    if not feats:
        return 0
    digests = b"".join(
        hashlib.blake2b(f.encode("utf-8"), digest_size=8).digest() for f in feats
    )
    bit_matrix = np.unpackbits(
        np.frombuffer(digests, dtype=np.uint8).reshape(-1, 8), axis=1
    )
    votes = bit_matrix.sum(axis=0, dtype=np.int64) * 2 - len(feats)
    out_bits = (votes > 0).astype(np.uint8)
    return int.from_bytes(np.packbits(out_bits).tobytes(), "big")


def hamming64(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


def jaccard(a: Sequence, b: Sequence) -> float:
    sa, sb = set(a), set(b)
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / len(sa | sb)
