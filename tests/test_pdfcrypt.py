"""Encrypted-PDF tests: ciphers, key algorithms, end-to-end round trips.

The cipher layer is pinned to published known-answer vectors (FIPS-197
appendix C for AES-128/AES-256, the classic RC4 vectors), the standard
security handler to writer↔reader self-consistency across every
revision it supports (R2/R3/R4/R6), and the document layer to full
span round-trips through `encode_pdf(encrypt=...)` — including the
poison-row contract for everything outside the supported envelope
(non-empty passwords, unknown handlers/revisions, missing /ID).
"""

import itertools

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from donut_spark.core.pdf import PdfDocument, encode_pdf, parse_pdf_spans
from donut_spark.core.pdfcrypt import (
    PAD,
    aes_cbc_decrypt,
    aes_cbc_encrypt,
    aes_cbc_nopad_decrypt,
    aes_cbc_nopad_encrypt,
    aes_encrypt_block,
    hash_2b,
    r6_file_key,
    r6_verify_user,
    rc4,
    std_compute_o,
    std_compute_u,
    std_file_key,
    std_object_key,
)

PAGES = [
    [
        ("text", 72.0, 720.0, 12.0, "secret (line) one"),
        ("media", 312.0, 720.0, 0.0, "img_0"),
        ("text", 72.0, 684.0, 11.0, "Ünïcödé row ≠ ascii"),
    ],
    [("text", 72.0, 720.0, 10.0, "page two")],
]

MODES = ["rc4-40", "rc4-128", "aesv2", "aes256"]


# ---------------------------------------------------------------------------
# cipher known-answer vectors
# ---------------------------------------------------------------------------


def test_aes128_fips197_c1():
    key = bytes.fromhex("000102030405060708090a0b0c0d0e0f")
    pt = bytes.fromhex("00112233445566778899aabbccddeeff")
    assert aes_encrypt_block(key, pt) == bytes.fromhex(
        "69c4e0d86a7b0430d8cdb78070b4c55a"
    )


def test_aes256_fips197_c3():
    key = bytes(range(32))
    pt = bytes.fromhex("00112233445566778899aabbccddeeff")
    # CBC with a zero IV over one block == raw ECB of that block
    assert aes_cbc_nopad_encrypt(key, b"\x00" * 16, pt) == bytes.fromhex(
        "8ea2b7ca516745bfeafc49904b496089"
    )


def test_rc4_published_vectors():
    assert rc4(b"Key", b"Plaintext") == bytes.fromhex("bbf316e8d940af0ad3")
    assert rc4(b"Wiki", b"pedia") == bytes.fromhex("1021bf0420")
    assert rc4(b"Secret", b"Attack at dawn") == bytes.fromhex(
        "45a01f645fc35b383552544b9bf5"
    )
    # involution: encrypt == decrypt
    assert rc4(b"k", rc4(b"k", b"payload")) == b"payload"


@given(
    st.binary(min_size=0, max_size=200),
    st.sampled_from([16, 32]),
    st.integers(min_value=0, max_value=2**63),
)
@settings(max_examples=60, deadline=None)
def test_aes_cbc_roundtrip_fuzz(data, klen, seed):
    import random as _r

    rng = _r.Random(seed)
    key = bytes(rng.randrange(256) for _ in range(klen))
    iv = bytes(rng.randrange(256) for _ in range(16))
    assert aes_cbc_decrypt(key, aes_cbc_encrypt(key, iv, data)) == data
    aligned = data[: len(data) // 16 * 16]
    assert (
        aes_cbc_nopad_decrypt(key, iv, aes_cbc_nopad_encrypt(key, iv, aligned))
        == aligned
    )


def test_aes_cbc_rejects_malformed():
    key = bytes(16)
    with pytest.raises(ValueError):
        aes_cbc_decrypt(key, b"short")
    with pytest.raises(ValueError):
        aes_cbc_decrypt(key, bytes(33))
    with pytest.raises(ValueError):
        aes_cbc_nopad_encrypt(key, bytes(15), bytes(16))
    with pytest.raises(ValueError):
        aes_encrypt_block(bytes(24), bytes(16))  # AES-192 out of subset
    # bad padding after decrypt must raise, not silently truncate
    ct = aes_cbc_encrypt(key, bytes(16), b"x" * 20)
    tampered = ct[:-1] + bytes([ct[-1] ^ 0xFF])
    with pytest.raises(ValueError):
        aes_cbc_decrypt(key, tampered)


# ---------------------------------------------------------------------------
# standard security handler algorithms
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("r,n", [(2, 5), (3, 16), (4, 16)])
def test_legacy_handler_self_consistency(r, n):
    """Writer-side O/U derive and re-verify through the reader-side
    algorithms for every legacy revision."""
    id0 = bytes(range(16))
    o = std_compute_o(b"", b"", r, n)
    key = std_file_key(b"", o, -4, id0, r, n)
    u = std_compute_u(key, id0, r)
    # a different password must NOT validate
    key_bad = std_file_key(b"wrong", o, -4, id0, r, n)
    u_bad = std_compute_u(key_bad, id0, r)
    cmp_len = 32 if r == 2 else 16
    assert u[:cmp_len] != u_bad[:cmp_len]
    # object keys: length law and AES salt effect
    ok = std_object_key(key, 7, 0, aes=False)
    assert len(ok) == min(n + 5, 16)
    if n == 16:
        assert std_object_key(key, 7, 0, aes=True) != ok
    assert std_object_key(key, 8, 0, aes=False) != ok


def test_r2_key_is_40_bit():
    o = std_compute_o(b"", b"", 2, 5)
    assert len(std_file_key(b"", o, -4, bytes(16), 2, 5)) == 5


def test_encrypt_metadata_false_changes_key():
    o = std_compute_o(b"", b"", 4, 16)
    k1 = std_file_key(b"", o, -4, bytes(16), 4, 16, encrypt_metadata=True)
    k2 = std_file_key(b"", o, -4, bytes(16), 4, 16, encrypt_metadata=False)
    assert k1 != k2


def test_pad_constant_is_spec_exact():
    assert len(PAD) == 32 and PAD[:4] == b"\x28\xbf\x4e\x5e"
    assert PAD[-4:] == b"\x64\x53\x69\x7a"


def test_r6_verify_and_unwrap():
    vsalt, ksalt = b"12345678", b"abcdefgh"
    u = hash_2b(b"", vsalt) + vsalt + ksalt
    key = bytes(range(32))
    ue = aes_cbc_nopad_encrypt(hash_2b(b"", ksalt), b"\x00" * 16, key)
    assert r6_verify_user(b"", u)
    assert not r6_verify_user(b"owner-only", u)
    assert r6_file_key(b"", u, ue) == key
    with pytest.raises(ValueError):
        r6_verify_user(b"", u[:40])


def test_hash_2b_password_sensitivity():
    assert hash_2b(b"", b"s" * 8) != hash_2b(b"x", b"s" * 8)
    assert hash_2b(b"", b"s" * 8) != hash_2b(b"", b"t" * 8)
    assert hash_2b(b"", b"s" * 8, b"u") != hash_2b(b"", b"s" * 8)


# ---------------------------------------------------------------------------
# end-to-end encrypted documents
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("mode", MODES)
def test_encrypted_roundtrip_all_shapes(mode):
    for xs, cid, filt in itertools.product(
        [False, True], [False, True], [None, "flate"]
    ):
        b = encode_pdf(
            PAGES,
            seed=11,
            variant=1,  # two-stream /Contents: several encrypted streams
            xref_stream=xs,
            cid_font=cid,
            stream_filter=filt,
            encrypt=mode,
        )
        assert parse_pdf_spans(b) == PAGES, (mode, xs, cid, filt)


@pytest.mark.parametrize("mode", MODES)
def test_encrypted_string_path_via_info(mode):
    doc = PdfDocument(encode_pdf(PAGES, seed=3, encrypt=mode))
    info = doc.resolve(doc.trailer["Info"])
    assert doc.resolve(info["Title"]) == b"donut synth corpus"


def test_encrypted_rotated_pages():
    for rot in (90, 180, 270):
        b = encode_pdf(PAGES, seed=8, rotate=rot, encrypt="aes256")
        assert parse_pdf_spans(b) == PAGES


def test_encrypted_deterministic_and_ciphertext_present():
    a = encode_pdf(PAGES, seed=9, encrypt="aesv2")
    assert a == encode_pdf(PAGES, seed=9, encrypt="aesv2")
    assert a != encode_pdf(PAGES, seed=10, encrypt="aesv2")
    # the plaintext of the content must not appear in the file
    assert b"secret" not in a
    assert b"secret" in encode_pdf(PAGES, seed=9)


def test_nonempty_user_password_is_poison():
    """A doc whose /U does not validate against the empty password
    (i.e. a real user password) must take the poison-row path."""
    b = encode_pdf(PAGES, seed=5, encrypt="rc4-128")
    # forge a different /U in place (same length, hex-encoded in body)
    import re

    m = re.search(rb"/U <([0-9a-f]{64})>", b)
    assert m
    forged = b.replace(m.group(1), m.group(1)[::-1], 1)
    with pytest.raises(ValueError, match="password-protected"):
        parse_pdf_spans(forged)
    # same for the R6 shape
    b6 = encode_pdf(PAGES, seed=5, encrypt="aes256")
    m6 = re.search(rb"/U <([0-9a-f]{96})>", b6)
    assert m6
    forged6 = b6.replace(m6.group(1), m6.group(1)[::-1], 1)
    with pytest.raises(ValueError, match="password-protected"):
        parse_pdf_spans(forged6)


def test_unsupported_encryption_shapes_are_poison():
    b = encode_pdf(PAGES, seed=5, encrypt="rc4-128")
    with pytest.raises(ValueError, match="V3 unsupported"):
        parse_pdf_spans(b.replace(b"/V 2 /R 3", b"/V 3 /R 3", 1))
    with pytest.raises(ValueError, match="unsupported"):
        parse_pdf_spans(b.replace(b"/V 2 /R 3", b"/V 2 /R 5", 1))
    with pytest.raises(ValueError, match="handler"):
        # same-length name: classic xref offsets are byte-exact
        parse_pdf_spans(b.replace(b"/Filter /Standard", b"/Filter /Nonstdrd", 1))
    with pytest.raises(ValueError, match="/ID"):
        parse_pdf_spans(b.replace(b" /ID [", b" /XD [", 1))
    b5 = encode_pdf(PAGES, seed=5, encrypt="aes256")
    with pytest.raises(ValueError, match="V5/R5"):
        parse_pdf_spans(b5.replace(b"/V 5 /R 6", b"/V 5 /R 5", 1))
    with pytest.raises(ValueError):
        encode_pdf(PAGES, seed=5, encrypt="des")


def test_unencrypted_docs_unaffected():
    """No /Encrypt → no /ID, no /Info, byte-identical to the pre-crypto
    writer output shape, and the decryptor stays disengaged."""
    b = encode_pdf(PAGES, seed=7)
    assert b"/Encrypt" not in b
    doc = PdfDocument(b)
    assert doc._dec is None
    assert parse_pdf_spans(b) == PAGES
