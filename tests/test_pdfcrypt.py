"""PDF standard security handler (operators/pdfcrypt.py, r10): vendored
RC4/AES-128 pinned to the ``cryptography`` package, handler algorithms
round-tripped through real documents, quarantine contract, fuzz."""

from __future__ import annotations

import os

import numpy as np
import pytest

from hive_udf_spark.operators import pdfcrypt as pc
from hive_udf_spark.operators.pdfcodec import encode_pdf, extract_pdf_pages

try:
    from cryptography.hazmat.decrepit.ciphers.algorithms import ARC4
    from cryptography.hazmat.primitives.ciphers import Cipher, algorithms, modes

    HAVE_CRYPTOGRAPHY = True
except ImportError:  # pragma: no cover - env-dependent
    HAVE_CRYPTOGRAPHY = False

needs_crypto = pytest.mark.skipif(
    not HAVE_CRYPTOGRAPHY, reason="cryptography package absent"
)


@needs_crypto
def test_vendored_aes_matches_cryptography():
    """Both directions, every padding length — the vendored FIPS-197
    implementation (computed S-box, native=False forces it) against an
    independent one, and the native dispatch agrees with both."""
    rng = np.random.RandomState(1)
    for trial in range(24):
        key = bytes(rng.randint(0, 256, 16, dtype=np.uint8))
        iv = bytes(rng.randint(0, 256, 16, dtype=np.uint8))
        pt = bytes(rng.randint(0, 256, 1 + 7 * trial, dtype=np.uint8))
        mine = pc.aes128_cbc_encrypt(key, pt, iv, native=False)
        pad = 16 - len(pt) % 16
        ref = Cipher(algorithms.AES(key), modes.CBC(iv)).encryptor()
        want = iv + ref.update(pt + bytes([pad]) * pad) + ref.finalize()
        assert mine == want
        assert pc.aes128_cbc_encrypt(key, pt, iv, native=True) == want
        assert pc.aes128_cbc_decrypt(key, mine, native=False) == pt
        assert pc.aes128_cbc_decrypt(key, mine, native=True) == pt


@needs_crypto
def test_vendored_rc4_matches_cryptography():
    rng = np.random.RandomState(2)
    for klen in (5, 7, 16):
        key = bytes(rng.randint(0, 256, klen, dtype=np.uint8))
        data = bytes(rng.randint(0, 256, 500, dtype=np.uint8))
        ref = Cipher(ARC4(key), mode=None).encryptor()
        want = ref.update(data)
        assert pc.rc4(key, data, native=False) == want
        assert pc.rc4(key, data, native=True) == want


def test_aes_padding_and_shape_errors():
    key = b"k" * 16
    with pytest.raises(ValueError, match="IV"):
        pc.aes128_cbc_encrypt(key, b"x", b"short")
    with pytest.raises(ValueError, match="whole number"):
        pc.aes128_cbc_decrypt(key, b"x" * 33)
    good = pc.aes128_cbc_encrypt(key, b"hello", b"i" * 16)
    with pytest.raises(ValueError, match="padding"):
        pc.aes128_cbc_decrypt(b"wrongkey" + b"k" * 8, good)


def test_encrypted_pdf_roundtrip_all_modes():
    pages = ["first half of the page", "second half here"]
    for mode in ("rc4-40", "rc4-128", "aes-128", "aes-256"):
        for flate in (False, True):
            blob = encode_pdf(pages, flate=flate, encrypt=mode)
            assert b"/Encrypt" in blob
            assert extract_pdf_pages(blob) == pages, (mode, flate)


def test_password_protected_quarantines_whole_doc():
    for mode in ("rc4-128", "aes-128", "aes-256"):
        blob = encode_pdf(["a", "b"], encrypt=mode, user_pw=b"secret")
        with pytest.raises(ValueError, match="password-protected"):
            extract_pdf_pages(blob)


def test_v5_hash_2b_vendored_matches_native():
    """Algorithm 2.B cross-check: the vendored AES path must produce
    the identical iterated hash as the ``cryptography``-backed one
    (including a 48-byte udata, the owner-password form)."""
    for pw, salt, udata in ((b"", b"salt-ab!", b""),
                            (b"pw", b"12345678", b"u" * 48)):
        assert pc.hash_2b(pw, salt, udata, native=True) == pc.hash_2b(
            pw, salt, udata, native=False)


def test_v5_aes256_vendored_matches_native():
    key, iv, data = bytes(range(32)), bytes(range(16)), b"block-aligned..!" * 4
    assert pc.aes_cbc_raw_encrypt(key, iv, data, native=False) == \
        pc.aes_cbc_raw_encrypt(key, iv, data, native=True)
    ct = pc.aes_cbc_raw_encrypt(key, iv, data)
    assert pc.aes_cbc_raw_decrypt(key, iv, ct, native=False) == data
    assert pc.aes_ecb_block(key, iv, True, native=False) == \
        pc.aes_ecb_block(key, iv, True, native=True)


def test_v5_perms_validation_rejects_wrong_key():
    fid = b"\x07" * 16
    body, h = pc.build_encryption("aes-256", fid)
    enc = {
        "/Filter": "/Standard", "/V": 5, "/R": 6, "/Length": 256, "/P": -44,
        "/O": h.o, "/U": h.u,
        # UE wrapping a DIFFERENT key than /Perms was built with
        "/UE": pc.aes_cbc_raw_encrypt(
            pc.hash_2b(b"", h.u[40:48]), b"\x00" * 16, b"\xee" * 32),
        "/Perms": pc.aes_ecb_block(h.key, b"\x00" * 16, True),
    }
    with pytest.raises(ValueError, match="Perms validation"):
        pc.StdSecurityHandler(enc, fid)


def test_v5_file_key_is_used_directly_per_object():
    """/V 5 has no per-object key derivation — the same ciphertext
    must decrypt under any (num, gen)."""
    body, h = pc.build_encryption("aes-256", b"\x09" * 16)
    ct = h.encrypt(b"shared-key payload", 3, 0)
    assert h.decrypt(ct, 3, 0) == h.decrypt(ct, 42, 7) == b"shared-key payload"


def test_unsupported_revision_quarantines():
    blob = bytearray(encode_pdf(["a", "b"], encrypt="aes-128"))
    i = blob.index(b"/V 4")
    blob[i : i + 4] = b"/V 5"
    with pytest.raises(ValueError, match="not supported|/V"):
        extract_pdf_pages(bytes(blob))


def test_ciphertext_never_leaks_plaintext():
    """The content bytes of an encrypted fixture must not contain the
    page text (i.e. encryption actually happened)."""
    blob = encode_pdf(["supercalifragilistic page text"], encrypt="rc4-128")
    assert b"supercalifragilistic" not in blob


def test_encrypted_pdf_byte_flip_fuzz():
    """Flipped bytes anywhere in an encrypted document either still
    extract (harmless region) or raise ValueError → quarantine —
    never a crash, never an unhandled exception type."""
    base = encode_pdf(["fuzz page one", "fuzz page two"], encrypt="aes-128")
    rng = np.random.RandomState(3)
    for _ in range(80):
        blob = bytearray(base)
        i = int(rng.randint(0, len(blob)))
        blob[i] ^= 1 << int(rng.randint(0, 8))
        try:
            pages = extract_pdf_pages(bytes(blob))
            assert isinstance(pages, list)
        except ValueError:
            pass


def test_keys_differ_per_object_and_mode():
    fid = os.urandom(16)
    _, h = pc.build_encryption("aes-128", fid)
    assert h._obj_key(4, 0) != h._obj_key(5, 0)
    assert h._obj_key(4, 0) != h._obj_key(4, 1)
    _, h40 = pc.build_encryption("rc4-40", fid)
    assert len(h40._obj_key(4, 0)) == 10  # min(n+5, 16) with n=5
    assert len(h._obj_key(4, 0)) == 16


def test_crafted_encrypt_dict_values_quarantine_cleanly():
    """Every /Encrypt value is attacker-controlled: wrong TYPES must
    raise ValueError (→ whole-doc quarantine), never TypeError/
    AttributeError out of the quarantine contract."""
    base = {
        "/Filter": "/Standard", "/V": 2, "/R": 3, "/Length": 128,
        "/P": -44, "/O": b"o" * 32, "/U": b"u" * 32,
    }
    bad_variants = [
        {"/Length": "(foo)"}, {"/Length": 12.5}, {"/V": "4"},
        {"/P": "x"}, {"/P": 1 << 40},
        {"/V": 4, "/CF": "(x)", "/StmF": "/StdCF", "/StrF": "/StdCF"},
        {"/V": 4, "/CF": {}, "/StmF": 7, "/StrF": 7},
    ]
    for patch in bad_variants:
        enc = dict(base)
        enc.update(patch)
        with pytest.raises(ValueError):
            pc.StdSecurityHandler(enc, b"i" * 16)


def test_v4_v2_cf_length_used():
    """/V 4 with a /V2 crypt filter must take the CF-level /Length
    (16 bytes → 128-bit key), not the 40-bit top-level default."""
    fid = b"i" * 16
    # build a valid V2-R3 handler at 128 bits, then re-present its
    # O/U under a /V 4 /V2 dict whose ONLY length is CF-level
    body, h = pc.build_encryption("rc4-128", fid)
    enc = {
        "/Filter": "/Standard", "/V": 4, "/R": 4, "/P": -44,
        "/O": h.o, "/U": h.u,
        "/CF": {"/StdCF": {"/CFM": "/V2", "/Length": 16}},
        "/StmF": "/StdCF", "/StrF": "/StdCF",
    }
    # R differs (4 vs 3) so the U check uses R4 math on R3 material —
    # recompute O/U properly for R4 instead:
    n = 16
    o = pc._compute_o(b"owner", b"", 4, n)
    key = pc._file_key(b"", o, -44, fid, 4, n)
    u = pc._compute_u(key, fid, 4)[:32]
    enc["/O"], enc["/U"] = o, u
    h4 = pc.StdSecurityHandler(enc, fid)
    assert h4.n == 16 and not h4.aes
