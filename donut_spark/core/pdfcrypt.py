"""From-scratch crypto for PDF standard-security-handler documents.

Encrypted PDFs are everywhere in real corpora — most carry an EMPTY
user password (the owner password only restricts printing/editing), so
a 100 TB extraction pass that quarantines every ``/Encrypt`` document
throws away readable text. This module implements, from the public
specs alone, exactly what decrypting (and synthesizing) those files
needs:

* RC4 (the stream cipher named by ISO 32000-1 §7.6.2 for V1/V2 and
  crypt filter ``/CFM /V2``),
* AES-128 / AES-256 in CBC mode (FIPS-197 block cipher; crypt filters
  ``/AESV2`` and ``/AESV3``, ISO 32000-1 §7.6.2 / ISO 32000-2 §7.6.3)
  — byte-level cipher with precomputed GF(2^8) multiplication tables,
  known-answer-tested against the FIPS-197 appendix C vectors,
* the standard security handler's key algorithms: file-key derivation
  (Algorithm 2), owner-key /O (Algorithm 3), user-validation /U
  (Algorithms 4/5), per-object keys (Algorithm 1) for R2/R3/R4, and
  the SHA-2 hardened Algorithm 2.B + /U //UE validation for R6
  (AES-256, ISO 32000-2 §7.6.4.3.4 / §7.6.4.4.10).

The reference repo has no document-decryption path at all (it consumes
pre-rendered page images, donut/util.py:113); this is part of the
engine's native-PDF modality (core/pdf.py), same discipline as the
other codecs: real algorithms, poison-row ``ValueError`` outside the
supported envelope (wrong password, unsupported revision).

Only MD5/SHA-2 digests come from the stdlib ``hashlib`` (they are
hash functions, not PDF logic); both ciphers and every key-derivation
step are implemented here.
"""

from __future__ import annotations

import hashlib
from functools import lru_cache
from typing import List

__all__ = [
    "rc4",
    "aes_cbc_encrypt",
    "aes_cbc_decrypt",
    "aes_cbc_nopad_encrypt",
    "aes_cbc_nopad_decrypt",
    "PAD",
    "std_file_key",
    "std_compute_o",
    "std_compute_u",
    "std_object_key",
    "hash_2b",
    "r6_verify_user",
    "r6_file_key",
]


# ---------------------------------------------------------------------------
# RC4
# ---------------------------------------------------------------------------


def rc4(key: bytes, data: bytes) -> bytes:
    """RC4 stream cipher (encrypt == decrypt)."""
    if not key:
        raise ValueError("rc4: empty key")
    s = list(range(256))
    j = 0
    for i in range(256):
        j = (j + s[i] + key[i % len(key)]) & 0xFF
        s[i], s[j] = s[j], s[i]
    out = bytearray(len(data))
    i = j = 0
    for k, c in enumerate(data):
        i = (i + 1) & 0xFF
        j = (j + s[i]) & 0xFF
        s[i], s[j] = s[j], s[i]
        out[k] = c ^ s[(s[i] + s[j]) & 0xFF]
    return bytes(out)


# ---------------------------------------------------------------------------
# AES (FIPS-197), byte-level with precomputed GF(2^8) multiply tables
# ---------------------------------------------------------------------------


def _build_tables():
    # GF(2^8) exp/log over generator 3 (x * 3 = x ^ xtime(x))
    exp = [0] * 256
    log = [0] * 256
    x = 1
    for i in range(255):
        exp[i] = x
        log[x] = i
        x ^= ((x << 1) ^ (0x1B if x & 0x80 else 0)) & 0xFF
    exp[255] = exp[0]

    sbox = [0] * 256
    for a in range(256):
        b = exp[255 - log[a]] if a else 0  # multiplicative inverse
        s = b
        for k in range(1, 5):  # affine transform
            s ^= ((b << k) | (b >> (8 - k))) & 0xFF
        sbox[a] = s ^ 0x63
    inv_sbox = [0] * 256
    for a, s in enumerate(sbox):
        inv_sbox[s] = a

    def gmul(a, c):
        return exp[(log[a] + log[c]) % 255] if a else 0

    # word-oriented round tables (the Rijndael reference formulation):
    # TeR[a] packs SubBytes+MixColumns for an input byte landing in
    # row R; TdR packs InvSubBytes+InvMixColumns likewise
    te = [[0] * 256 for _ in range(4)]
    td = [[0] * 256 for _ in range(4)]
    # first COLUMN of the (Inv)MixColumns circulant matrix: the
    # coefficient of input row r in output row i is col[(i - r) % 4]
    mix = (2, 1, 1, 3)
    inv_mix = (14, 9, 13, 11)
    for a in range(256):
        s, u = sbox[a], inv_sbox[a]
        for r in range(4):
            # contribution of row-r byte s to output rows 0..3
            te[r][a] = (
                (gmul(s, mix[(0 - r) % 4]) << 24)
                | (gmul(s, mix[(1 - r) % 4]) << 16)
                | (gmul(s, mix[(2 - r) % 4]) << 8)
                | gmul(s, mix[(3 - r) % 4])
            )
            td[r][a] = (
                (gmul(u, inv_mix[(0 - r) % 4]) << 24)
                | (gmul(u, inv_mix[(1 - r) % 4]) << 16)
                | (gmul(u, inv_mix[(2 - r) % 4]) << 8)
                | gmul(u, inv_mix[(3 - r) % 4])
            )
    return sbox, inv_sbox, te, td


_SBOX, _INV_SBOX, _TE, _TD = _build_tables()
_TE0, _TE1, _TE2, _TE3 = _TE
_TD0, _TD1, _TD2, _TD3 = _TD
_RCON = [0x01, 0x02, 0x04, 0x08, 0x10, 0x20, 0x40, 0x80, 0x1B, 0x36]


def _expand_key(key: bytes) -> List[int]:
    """Key schedule → list of 4-byte words (FIPS-197 §5.2)."""
    nk = len(key) // 4
    if len(key) not in (16, 32):
        raise ValueError("aes: key must be 16 or 32 bytes")
    nr = nk + 6
    w = [int.from_bytes(key[4 * i : 4 * i + 4], "big") for i in range(nk)]
    for i in range(nk, 4 * (nr + 1)):
        t = w[i - 1]
        if i % nk == 0:
            t = ((t << 8) | (t >> 24)) & 0xFFFFFFFF  # RotWord
            t = (
                (_SBOX[(t >> 24) & 0xFF] << 24)
                | (_SBOX[(t >> 16) & 0xFF] << 16)
                | (_SBOX[(t >> 8) & 0xFF] << 8)
                | _SBOX[t & 0xFF]
            )
            t ^= _RCON[i // nk - 1] << 24
        elif nk > 6 and i % nk == 4:
            t = (
                (_SBOX[(t >> 24) & 0xFF] << 24)
                | (_SBOX[(t >> 16) & 0xFF] << 16)
                | (_SBOX[(t >> 8) & 0xFF] << 8)
                | _SBOX[t & 0xFF]
            )
        w.append(w[i - nk] ^ t)
    return w


# state: four 32-bit words s0..s3, one per COLUMN, big-endian bytes —
# exactly the order input bytes arrive in (FIPS-197 §3.4), so
# conversion is int.from_bytes per 4-byte slice


def _encrypt_block(block: bytes, w: List[int], nr: int) -> bytes:
    s0 = int.from_bytes(block[0:4], "big") ^ w[0]
    s1 = int.from_bytes(block[4:8], "big") ^ w[1]
    s2 = int.from_bytes(block[8:12], "big") ^ w[2]
    s3 = int.from_bytes(block[12:16], "big") ^ w[3]
    for rnd in range(1, nr):
        o = 4 * rnd
        # ShiftRows: output column j takes its row-r byte from column j+r
        t0 = (
            _TE0[s0 >> 24]
            ^ _TE1[(s1 >> 16) & 0xFF]
            ^ _TE2[(s2 >> 8) & 0xFF]
            ^ _TE3[s3 & 0xFF]
            ^ w[o]
        )
        t1 = (
            _TE0[s1 >> 24]
            ^ _TE1[(s2 >> 16) & 0xFF]
            ^ _TE2[(s3 >> 8) & 0xFF]
            ^ _TE3[s0 & 0xFF]
            ^ w[o + 1]
        )
        t2 = (
            _TE0[s2 >> 24]
            ^ _TE1[(s3 >> 16) & 0xFF]
            ^ _TE2[(s0 >> 8) & 0xFF]
            ^ _TE3[s1 & 0xFF]
            ^ w[o + 2]
        )
        t3 = (
            _TE0[s3 >> 24]
            ^ _TE1[(s0 >> 16) & 0xFF]
            ^ _TE2[(s1 >> 8) & 0xFF]
            ^ _TE3[s2 & 0xFF]
            ^ w[o + 3]
        )
        s0, s1, s2, s3 = t0, t1, t2, t3
    o = 4 * nr
    b = _SBOX
    t0 = (
        (b[s0 >> 24] << 24)
        | (b[(s1 >> 16) & 0xFF] << 16)
        | (b[(s2 >> 8) & 0xFF] << 8)
        | b[s3 & 0xFF]
    ) ^ w[o]
    t1 = (
        (b[s1 >> 24] << 24)
        | (b[(s2 >> 16) & 0xFF] << 16)
        | (b[(s3 >> 8) & 0xFF] << 8)
        | b[s0 & 0xFF]
    ) ^ w[o + 1]
    t2 = (
        (b[s2 >> 24] << 24)
        | (b[(s3 >> 16) & 0xFF] << 16)
        | (b[(s0 >> 8) & 0xFF] << 8)
        | b[s1 & 0xFF]
    ) ^ w[o + 2]
    t3 = (
        (b[s3 >> 24] << 24)
        | (b[(s0 >> 16) & 0xFF] << 16)
        | (b[(s1 >> 8) & 0xFF] << 8)
        | b[s2 & 0xFF]
    ) ^ w[o + 3]
    return (
        t0.to_bytes(4, "big")
        + t1.to_bytes(4, "big")
        + t2.to_bytes(4, "big")
        + t3.to_bytes(4, "big")
    )


def _inv_key_schedule(w: List[int], nr: int) -> List[int]:
    """Round keys for the equivalent inverse cipher: reverse round
    order, InvMixColumns applied to the middle rounds' words."""
    dk: List[int] = []
    for rnd in range(nr, -1, -1):
        for c in range(4):
            word = w[4 * rnd + c]
            if 0 < rnd < nr:
                # InvMixColumns(word); Td tables expect INV_SBOX input,
                # so feed each byte through SBOX first
                word = (
                    _TD0[_SBOX[word >> 24]]
                    ^ _TD1[_SBOX[(word >> 16) & 0xFF]]
                    ^ _TD2[_SBOX[(word >> 8) & 0xFF]]
                    ^ _TD3[_SBOX[word & 0xFF]]
                )
            dk.append(word)
    return dk


def _decrypt_block(block: bytes, dk: List[int], nr: int) -> bytes:
    s0 = int.from_bytes(block[0:4], "big") ^ dk[0]
    s1 = int.from_bytes(block[4:8], "big") ^ dk[1]
    s2 = int.from_bytes(block[8:12], "big") ^ dk[2]
    s3 = int.from_bytes(block[12:16], "big") ^ dk[3]
    for rnd in range(1, nr):
        o = 4 * rnd
        # InvShiftRows: output column j takes row r from column j-r
        t0 = (
            _TD0[s0 >> 24]
            ^ _TD1[(s3 >> 16) & 0xFF]
            ^ _TD2[(s2 >> 8) & 0xFF]
            ^ _TD3[s1 & 0xFF]
            ^ dk[o]
        )
        t1 = (
            _TD0[s1 >> 24]
            ^ _TD1[(s0 >> 16) & 0xFF]
            ^ _TD2[(s3 >> 8) & 0xFF]
            ^ _TD3[s2 & 0xFF]
            ^ dk[o + 1]
        )
        t2 = (
            _TD0[s2 >> 24]
            ^ _TD1[(s1 >> 16) & 0xFF]
            ^ _TD2[(s0 >> 8) & 0xFF]
            ^ _TD3[s3 & 0xFF]
            ^ dk[o + 2]
        )
        t3 = (
            _TD0[s3 >> 24]
            ^ _TD1[(s2 >> 16) & 0xFF]
            ^ _TD2[(s1 >> 8) & 0xFF]
            ^ _TD3[s0 & 0xFF]
            ^ dk[o + 3]
        )
        s0, s1, s2, s3 = t0, t1, t2, t3
    o = 4 * nr
    b = _INV_SBOX
    t0 = (
        (b[s0 >> 24] << 24)
        | (b[(s3 >> 16) & 0xFF] << 16)
        | (b[(s2 >> 8) & 0xFF] << 8)
        | b[s1 & 0xFF]
    ) ^ dk[o]
    t1 = (
        (b[s1 >> 24] << 24)
        | (b[(s0 >> 16) & 0xFF] << 16)
        | (b[(s3 >> 8) & 0xFF] << 8)
        | b[s2 & 0xFF]
    ) ^ dk[o + 1]
    t2 = (
        (b[s2 >> 24] << 24)
        | (b[(s1 >> 16) & 0xFF] << 16)
        | (b[(s0 >> 8) & 0xFF] << 8)
        | b[s3 & 0xFF]
    ) ^ dk[o + 2]
    t3 = (
        (b[s3 >> 24] << 24)
        | (b[(s2 >> 16) & 0xFF] << 16)
        | (b[(s1 >> 8) & 0xFF] << 8)
        | b[s0 & 0xFF]
    ) ^ dk[o + 3]
    return (
        t0.to_bytes(4, "big")
        + t1.to_bytes(4, "big")
        + t2.to_bytes(4, "big")
        + t3.to_bytes(4, "big")
    )


def aes_encrypt_block(key: bytes, block: bytes) -> bytes:
    """Single-block ECB encrypt (used by /Perms, ISO 32000-2 §7.6.4.4.12)."""
    if len(block) != 16:
        raise ValueError("aes: block must be 16 bytes")
    w = _expand_key(key)
    return _encrypt_block(block, w, len(key) // 4 + 6)


def aes_cbc_nopad_encrypt(key: bytes, iv: bytes, data: bytes) -> bytes:
    """CBC without padding (R6 key wrapping and Algorithm 2.B use this)."""
    if len(iv) != 16 or len(data) % 16:
        raise ValueError("aes-cbc: bad iv or non-block-multiple data")
    w = _expand_key(key)
    nr = len(key) // 4 + 6
    out = bytearray()
    prev = iv
    for i in range(0, len(data), 16):
        blk = bytes(x ^ y for x, y in zip(data[i : i + 16], prev))
        prev = _encrypt_block(blk, w, nr)
        out += prev
    return bytes(out)


def aes_cbc_nopad_decrypt(key: bytes, iv: bytes, data: bytes) -> bytes:
    if len(iv) != 16 or len(data) % 16:
        raise ValueError("aes-cbc: bad iv or non-block-multiple data")
    nr = len(key) // 4 + 6
    dk = _inv_key_schedule(_expand_key(key), nr)
    out = bytearray()
    prev = iv
    for i in range(0, len(data), 16):
        blk = data[i : i + 16]
        out += bytes(x ^ y for x, y in zip(_decrypt_block(blk, dk, nr), prev))
        prev = blk
    return bytes(out)


def aes_cbc_encrypt(key: bytes, iv: bytes, data: bytes) -> bytes:
    """PDF stream/string form: IV-prefixed CBC with PKCS#7 padding
    (ISO 32000-1 §7.6.2: 'a 16-byte block size and... the block cipher
    padding described in RFC 2898')."""
    padlen = 16 - len(data) % 16
    return iv + aes_cbc_nopad_encrypt(
        key, iv, data + bytes([padlen]) * padlen
    )


def aes_cbc_decrypt(key: bytes, data: bytes) -> bytes:
    """Inverse of :func:`aes_cbc_encrypt`; raises on malformed input."""
    if len(data) < 32 or len(data) % 16:
        raise ValueError("aes-cbc: ciphertext too short or misaligned")
    plain = aes_cbc_nopad_decrypt(key, data[:16], data[16:])
    padlen = plain[-1]
    if not 1 <= padlen <= 16 or plain[-padlen:] != bytes([padlen]) * padlen:
        raise ValueError("aes-cbc: bad padding")
    return plain[:-padlen]


# ---------------------------------------------------------------------------
# Standard security handler, R2/R3/R4 (ISO 32000-1 §7.6.3)
# ---------------------------------------------------------------------------

# the 32-byte password pad (ISO 32000-1 Table 21 note / Algorithm 2 step a)
PAD = bytes(
    [
        0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41,
        0x64, 0x00, 0x4E, 0x56, 0xFF, 0xFA, 0x01, 0x08,
        0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
        0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A,
    ]
)


def _padded(pw: bytes) -> bytes:
    return (pw + PAD)[:32]


def std_file_key(
    user_pw: bytes,
    o: bytes,
    p: int,
    id0: bytes,
    r: int,
    n: int,
    encrypt_metadata: bool = True,
) -> bytes:
    """Algorithm 2: the n-byte file encryption key."""
    h = hashlib.md5()
    h.update(_padded(user_pw))
    h.update(o[:32])
    h.update((p & 0xFFFFFFFF).to_bytes(4, "little"))
    h.update(id0)
    if r >= 4 and not encrypt_metadata:
        h.update(b"\xff\xff\xff\xff")
    key = h.digest()
    if r >= 3:
        for _ in range(50):
            key = hashlib.md5(key[:n]).digest()
    return key[:n]


def std_compute_o(owner_pw: bytes, user_pw: bytes, r: int, n: int) -> bytes:
    """Algorithm 3: the /O entry (owner_pw defaults to user_pw upstream)."""
    h = hashlib.md5(_padded(owner_pw)).digest()
    if r >= 3:
        for _ in range(50):
            h = hashlib.md5(h).digest()
    rc4_key = h[:n]
    o = rc4(rc4_key, _padded(user_pw))
    if r >= 3:
        for i in range(1, 20):
            o = rc4(bytes(b ^ i for b in rc4_key), o)
    return o


def std_compute_u(key: bytes, id0: bytes, r: int) -> bytes:
    """Algorithms 4 (R2) / 5 (R3+): the 32-byte /U entry."""
    if r == 2:
        return rc4(key, PAD)
    u = rc4(key, hashlib.md5(PAD + id0).digest())
    for i in range(1, 20):
        u = rc4(bytes(b ^ i for b in key), u)
    return u + b"\x00" * 16  # padding bytes are arbitrary; compare 16


def std_object_key(key: bytes, num: int, gen: int, aes: bool) -> bytes:
    """Algorithm 1: the per-object RC4/AES key."""
    h = hashlib.md5()
    h.update(key)
    h.update(num.to_bytes(3, "little"))
    h.update(gen.to_bytes(2, "little"))
    if aes:
        h.update(b"sAlT")  # the AESV2 salt (ISO 32000-1 §7.6.2 step b)
    return h.digest()[: min(len(key) + 5, 16)]


# ---------------------------------------------------------------------------
# Standard security handler, R6 / AES-256 (ISO 32000-2 §7.6.4)
# ---------------------------------------------------------------------------


@lru_cache(maxsize=256)
def hash_2b(password: bytes, salt: bytes, udata: bytes = b"") -> bytes:
    """Algorithm 2.B: the SHA-2 hardened password hash (R6).

    Deliberately expensive (64+ rounds of AES-CBC over a 2 KiB buffer —
    that is the spec's anti-brute-force design), hence the memo cache:
    a corpus produced by one writer shares its salts, so each executor
    process pays the derivation once, not once per document."""
    k = hashlib.sha256(password + salt + udata).digest()
    i = 0
    while True:
        k1 = (password + k + udata) * 64
        e = aes_cbc_nopad_encrypt(k[:16], k[16:32], k1)
        mod = sum(e[:16]) % 3
        k = (hashlib.sha256, hashlib.sha384, hashlib.sha512)[mod](e).digest()
        i += 1
        if i >= 64 and e[-1] <= i - 32:
            return k[:32]


def r6_verify_user(password: bytes, u: bytes) -> bool:
    """Algorithm 11: does the password match the 48-byte /U entry?"""
    if len(u) < 48:
        raise ValueError("pdf: R6 /U entry too short")
    return hash_2b(password, u[32:40]) == u[:32]


def r6_file_key(password: bytes, u: bytes, ue: bytes) -> bytes:
    """Algorithm 8 (reader half): the 32-byte file key from /U + /UE."""
    if len(u) < 48 or len(ue) < 32:
        raise ValueError("pdf: R6 /U or /UE entry too short")
    ikey = hash_2b(password, u[40:48])
    return aes_cbc_nopad_decrypt(ikey, b"\x00" * 16, ue[:32])
