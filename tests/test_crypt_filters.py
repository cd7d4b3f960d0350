"""RC4 standard-security decryption + LZW/RunLength filters.

The reference relies on pikepdf for both (api.py:80-82 read_bytes); we
implement the public spec directly, so these tests pin the new kernel
surfaces: ISO 32000-1 §7.6.3 (Algorithms 1-6), §7.4.4.2 (LZW),
§7.4.5 (RunLength).
"""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from pdf_parser_spark.pdfcore.crypt import (
    StandardDecryptor,
    UnsupportedEncryption,
    build_encrypt_dict,
    rc4,
)
from pdf_parser_spark.pdfcore.extract import extract_pdf
from pdf_parser_spark.pdfcore.filters import (
    lzw_decode,
    lzw_encode,
    runlength_decode,
    runlength_encode,
)
from pdf_parser_spark.pdfgen.writer import make_text_pdf

# ------------------------------------------------------------------ RC4


def test_rc4_known_vector():
    # public test vector (RFC 6229 family): key "Key", plaintext "Plaintext"
    assert rc4(b"Key", b"Plaintext").hex() == "bbf316e8d940af0ad3"
    # symmetric
    assert rc4(b"Key", rc4(b"Key", b"payload")) == b"payload"


@pytest.mark.parametrize("revision", [2, 3])
def test_encrypt_dict_roundtrip(revision):
    enc, cryptor = build_encrypt_dict(b"\x01" * 16, revision=revision)
    # the empty user password verifies against the generated /O /U
    dec = StandardDecryptor(enc, b"\x01" * 16)
    pt = b"stream payload bytes"
    assert dec.decrypt(cryptor.encrypt(pt, 7, 0), 7, 0) == pt
    # a different object number yields a different keystream
    assert cryptor.encrypt(pt, 7, 0) != cryptor.encrypt(pt, 8, 0)


def test_wrong_id_fails_password_check():
    enc, _ = build_encrypt_dict(b"\x01" * 16, revision=3)
    with pytest.raises(UnsupportedEncryption, match="password"):
        StandardDecryptor(enc, b"\x02" * 16)


def test_unknown_schemes_rejected_as_unsupported():
    # V4 without a usable crypt filter (no /CF → Identity) is rejected
    with pytest.raises(UnsupportedEncryption, match="CFM"):
        StandardDecryptor(
            {"Filter": "Standard", "V": 4, "R": 4, "O": b"x" * 32,
             "U": b"y" * 32, "P": -4, "Length": 128},
            b"",
        )
    # an unknown V/R combination is rejected outright
    with pytest.raises(UnsupportedEncryption, match="V=7"):
        StandardDecryptor(
            {"Filter": "Standard", "V": 7, "R": 9, "O": b"x" * 32,
             "U": b"y" * 32, "P": -4, "Length": 128},
            b"",
        )
    # R5 (the deprecated Adobe extension) is explicitly unsupported
    with pytest.raises(UnsupportedEncryption, match="V=5 R=5"):
        StandardDecryptor(
            {"Filter": "Standard", "V": 5, "R": 5, "O": b"x" * 48,
             "U": b"y" * 48, "P": -4, "Length": 256},
            b"",
        )


# ------------------------------------------------- encrypted end-to-end

LINES = [["encrypted body line one", "and a (parenthesised) second line"]]


@pytest.mark.parametrize(
    "kw",
    [
        {"variant": "classic", "encrypt_revision": 2},
        {"variant": "classic", "encrypt_revision": 3},
        {"variant": "xrefstream", "encrypt_revision": 3},
        {"variant": "xrefstream", "use_objstm": True, "encrypt_revision": 3},
    ],
    ids=["classic-r2", "classic-r3", "xrefstream", "objstm"],
)
def test_encrypted_pdf_extracts_identically(kw):
    plain = extract_pdf(make_text_pdf(LINES, variant=kw["variant"],
                                      use_objstm=kw.get("use_objstm", False)))
    enc_pdf = make_text_pdf(LINES, encrypted=True, **kw)
    # ciphertext really differs from plaintext at the byte level
    assert b"encrypted body" not in enc_pdf
    got = extract_pdf(enc_pdf)
    assert got.error is None
    assert got.text == plain.text
    assert [i[:3] for i in got.items] == [i[:3] for i in plain.items]


def test_encrypted_pdf_deterministic():
    assert make_text_pdf(LINES, encrypted=True) == make_text_pdf(
        LINES, encrypted=True
    )


def test_real_password_still_typed_error():
    """A document whose user password is NOT empty must surface the
    typed 'encrypted' audit row, never garbage text."""
    pdf = make_text_pdf(LINES, encrypted=True)
    # corrupt /U so the empty password no longer verifies
    import re

    m = re.search(rb"/U <([0-9A-F]+)>", pdf)
    assert m
    flipped = bytearray(m.group(1))
    flipped[0] = ord("F") if flipped[0] != ord("F") else ord("0")
    bad = pdf[: m.start(1)] + bytes(flipped) + pdf[m.end(1) :]
    r = extract_pdf(bad)
    assert r.error == "encrypted" and r.text == ""


# ------------------------------------------------------------ RunLength


def test_runlength_spec_cases():
    assert runlength_decode(bytes([2]) + b"abc" + bytes([128])) == b"abc"
    assert runlength_decode(bytes([254]) + b"z" + bytes([128])) == b"z" * 3
    assert runlength_decode(bytes([129]) + b"q" + bytes([128])) == b"q" * 128
    with pytest.raises(ValueError):
        runlength_decode(bytes([5]) + b"ab")  # truncated literal


@settings(max_examples=200, deadline=None)
@given(st.binary(max_size=2048))
def test_runlength_roundtrip(data):
    assert runlength_decode(runlength_encode(data)) == data


# ------------------------------------------------------------------ LZW


def test_lzw_known_stream():
    # the classic spec example: 45 45 45 65 65 65 66 66 66 encodes with
    # growing table; just pin a simple deterministic round trip
    data = b"-----A---B"
    assert lzw_decode(lzw_encode(data)) == data


def test_lzw_early_change_variants():
    data = bytes(range(256)) * 3
    for early in (0, 1):
        enc = lzw_encode(data, early=early)
        assert lzw_decode(enc, {"EarlyChange": early}) == data
    # default decode assumes EarlyChange=1 like the spec
    assert lzw_decode(lzw_encode(data, early=1)) == data


@settings(max_examples=100, deadline=None)
@given(st.binary(min_size=0, max_size=4096))
def test_lzw_roundtrip_random(data):
    assert lzw_decode(lzw_encode(data)) == data


@settings(max_examples=20, deadline=None)
@given(st.integers(0, 2**32 - 1))
def test_lzw_roundtrip_table_reset(seed):
    """Data long/diverse enough to fill the 12-bit table and force the
    clear-and-reset path."""
    import random

    rng = random.Random(seed)
    data = bytes(rng.randrange(256) for _ in range(20000))
    assert lzw_decode(lzw_encode(data)) == data


def test_lzw_missing_eod_raises():
    enc = lzw_encode(b"abcabcabc")
    with pytest.raises(ValueError):
        lzw_decode(enc[:-2] + b"\x00")


# ----------------------------------------------- filters inside real PDFs


@pytest.mark.parametrize("encoding", ["lzw", "rl"])
def test_pdf_with_alt_filter_extracts(encoding):
    from pdf_parser_spark.pdfgen.writer import build_pdf

    content = b"BT\n/F1 12 Tf\n1 0 0 1 72 720 Tm\n(alt filter line) Tj\nET"
    pdf = build_pdf([[content]], content_encoding=encoding)
    marker = b"/LZWDecode" if encoding == "lzw" else b"/RunLengthDecode"
    assert marker in pdf
    r = extract_pdf(pdf)
    assert r.error is None and r.text == "alt filter line"


def test_encrypted_lzw_pdf_extracts():
    """Encryption applies AFTER filter encoding on write, so decrypt
    must run BEFORE decode on read — this pins the ordering."""
    from pdf_parser_spark.pdfgen.writer import build_pdf

    content = b"BT\n/F1 12 Tf\n1 0 0 1 72 720 Tm\n(lzw under rc4) Tj\nET"
    pdf = build_pdf([[content]], content_encoding="lzw", encrypted=True)
    r = extract_pdf(pdf)
    assert r.error is None and r.text == "lzw under rc4"


# ------------------------------------------------------------------ AES


def test_aes_fips197_vectors():
    from pdf_parser_spark.pdfcore.aes import (
        _decrypt_block,
        _expand_key,
        cbc_decrypt,
        cbc_encrypt,
        encrypt_block,
    )

    key = bytes.fromhex("000102030405060708090a0b0c0d0e0f")
    pt = bytes.fromhex("00112233445566778899aabbccddeeff")
    assert encrypt_block(pt, key).hex() == "69c4e0d86a7b0430d8cdb78070b4c55a"
    key256 = bytes.fromhex(
        "000102030405060708090a0b0c0d0e0f101112131415161718191a1b1c1d1e1f"
    )
    assert encrypt_block(pt, key256).hex() == "8ea2b7ca516745bfeafc49904b496089"
    assert _decrypt_block(encrypt_block(pt, key256), _expand_key(key256)) == pt
    data = b"arbitrary length payload, not block aligned!"
    iv = bytes(range(16))
    assert cbc_decrypt(cbc_encrypt(data, key, iv), key, iv) == data
    with pytest.raises(ValueError):
        cbc_decrypt(b"short", key, iv)


def test_hash_2b_deterministic_and_password_sensitive():
    from pdf_parser_spark.pdfcore.crypt import hash_2b

    a = hash_2b(b"", b"saltsalt")
    assert a == hash_2b(b"", b"saltsalt") and len(a) == 32
    assert a != hash_2b(b"pw", b"saltsalt")
    assert a != hash_2b(b"", b"other8slt")


def _hash_2b_independent(password: bytes, salt: bytes, udata: bytes = b"") -> bytes:
    """Independent Algorithm 2.B, written straight from the ISO 32000-2
    §7.6.4.3.4 wording with 1-BASED round counting and the
    ``cryptography`` package's AES (not the repo's own cipher): after
    completing round n ≥ 64, stop when the last byte of E ≤ n − 32.
    Exists purely to pin hash_2b against a second implementation."""
    import hashlib

    from cryptography.hazmat.primitives.ciphers import Cipher, algorithms, modes

    k = hashlib.sha256(password + salt + udata).digest()
    n = 0
    while True:
        k1 = (password + k + udata) * 64
        enc = Cipher(algorithms.AES(k[:16]), modes.CBC(k[16:32])).encryptor()
        e = enc.update(k1) + enc.finalize()
        k = (hashlib.sha256, hashlib.sha384, hashlib.sha512)[sum(e[:16]) % 3](e).digest()
        n += 1
        if n >= 64 and e[-1] <= n - 32:
            return k[:32]


def test_hash_2b_matches_independent_implementation():
    """Cross-check hash_2b against a from-the-spec reimplementation on a
    seeded salt sweep, including password and udata (owner-key) paths."""
    import random

    from pdf_parser_spark.pdfcore.crypt import hash_2b

    rng = random.Random(0xA2B)
    for _ in range(12):
        salt = bytes(rng.randrange(256) for _ in range(8))
        pw = bytes(rng.randrange(256) for _ in range(rng.randrange(0, 20)))
        ud = b"" if rng.random() < 0.5 else bytes(rng.randrange(256) for _ in range(48))
        assert hash_2b(pw, salt, ud) == _hash_2b_independent(pw, salt, ud)


def test_hash_2b_off_by_one_divergence_salts():
    """Salts where the buggy pre-r4 stop rule (0-based ``e[-1] <= i-32``,
    i.e. 1-based ``<= n-33``) takes EXTRA rounds and yields a different
    hash — ~3% of the salt space (12/400 in a seeded sweep).  Pins the
    interop-correct outputs so the off-by-one can never silently return;
    round-trip tests alone cannot catch it (both sides would shift)."""
    from pdf_parser_spark.pdfcore.crypt import hash_2b

    vectors = [
        ("adf7607e6428e279", "535b2bde5ad16db5"),
        ("e0125f321036af2e", "b8eab511a95883c1"),
        ("ba713ffba99cb25e", "e7750a0b61b4b24a"),
    ]
    buggy = {
        "adf7607e6428e279": "11f37e3bcd1c7eb2",
        "e0125f321036af2e": "5a8940b2716874ff",
        "ba713ffba99cb25e": "4de28961bbf6ef4c",
    }
    for salt_hex, prefix in vectors:
        got = hash_2b(b"", bytes.fromhex(salt_hex))
        assert got.hex()[:16] == prefix
        assert got.hex()[:16] != buggy[salt_hex]


@pytest.mark.parametrize(
    "kw",
    [
        {"variant": "classic", "encrypt_revision": 4},
        {"variant": "xrefstream", "use_objstm": True, "encrypt_revision": 4},
        {"variant": "classic", "encrypt_revision": 6},
        {"variant": "xrefstream", "use_objstm": True, "encrypt_revision": 6},
    ],
    ids=["aesv2-classic", "aesv2-objstm", "aesv3-classic", "aesv3-objstm"],
)
def test_aes_encrypted_pdf_extracts_identically(kw):
    plain = extract_pdf(make_text_pdf(LINES, variant=kw["variant"],
                                      use_objstm=kw.get("use_objstm", False)))
    enc_pdf = make_text_pdf(LINES, encrypted=True, **kw)
    assert b"encrypted body" not in enc_pdf
    got = extract_pdf(enc_pdf)
    assert got.error is None
    assert got.text == plain.text


def test_aesv3_wrong_password_rejected():
    from pdf_parser_spark.pdfcore.crypt import (
        StandardDecryptor,
        UnsupportedEncryption,
        build_encrypt_dict,
        hash_2b,
    )

    enc, _ = build_encrypt_dict(b"\x07" * 16, revision=6)
    # corrupt the /U validation hash → empty password no longer verifies
    bad = dict(enc)
    bad["U"] = (b"\x00" * 32) + enc["U"][32:]
    with pytest.raises(UnsupportedEncryption, match="password"):
        StandardDecryptor(bad, b"\x07" * 16)
    # corrupt /Perms → integrity check fails
    bad2 = dict(enc)
    bad2["Perms"] = b"\x00" * 16
    with pytest.raises(UnsupportedEncryption, match="Perms"):
        StandardDecryptor(bad2, b"\x07" * 16)


def test_v4_rc4_crypt_filter_supported():
    """V4 with /CFM /V2 (RC4 inside crypt filters) also decrypts."""
    from pdf_parser_spark.pdfcore.crypt import (
        StandardDecryptor,
        build_encrypt_dict,
    )

    enc, cryptor = build_encrypt_dict(b"\x09" * 16, revision=4)
    enc_v2 = dict(enc)
    enc_v2["CF"] = {"StdCF": {"CFM": "V2", "Length": 16}}
    dec = StandardDecryptor(enc_v2, b"\x09" * 16)
    assert dec.cipher == "rc4"
    pt = b"rc4 inside crypt filter"
    assert dec.decrypt(dec.encrypt(pt, 3, 0), 3, 0) == pt


# ------------------------------------------ rewrite on encrypted originals


@pytest.mark.parametrize("rev", [2, 3, 4, 6])
def test_replace_text_on_encrypted_pdf(rev):
    """The incremental update appended to an encrypted document must be
    encrypted with the SAME security handler (§7.6.1) — appended
    plaintext would be 'decrypted' into garbage by every conforming
    reader. Pins the cryptor-aware serializer end-to-end."""
    from pdf_parser_spark.pdfcore.rewrite import replace_text

    lines = [["alpha beta gamma", "delta epsilon"]]
    pdf = make_text_pdf(lines, encrypted=True, encrypt_revision=rev)
    res = replace_text(pdf, "alpha beta gamma", "gamma beta alpha", page_num=0)
    assert res.success
    # the appended section must not leak plaintext
    appended = res.data[len(pdf) :]
    assert b"gamma beta alpha" not in appended
    r = extract_pdf(res.data)
    assert r.error is None
    assert r.text.splitlines()[0] == "gamma beta alpha"
    # original bytes preserved verbatim (incremental-update contract)
    assert res.data.startswith(pdf)


def test_incremental_update_rejects_raw_bytes_on_encrypted():
    from pdf_parser_spark.pdfcore.document import PdfDocument, PdfError
    from pdf_parser_spark.pdfcore.rewrite import incremental_update

    pdf = make_text_pdf(LINES, encrypted=True)
    doc = PdfDocument(pdf)
    with pytest.raises(PdfError, match="encrypted"):
        incremental_update(pdf, doc, {99: b"<< /Length 0 >>"})


# --------------------------------------------- owner-password recovery


@pytest.mark.parametrize("rev", [2, 3, 4, 6])
def test_user_password_set_owner_empty_unlocks(rev):
    """A document whose USER password is set but whose OWNER password is
    blank unlocks via Algorithm 7 (RC4: recover the padded user password
    from /O) or the R6 owner hash + /OE unwrap — a real crawl case from
    generators that set only one password."""
    from pdf_parser_spark.pdfgen.writer import build_pdf

    content = b"BT\n/F1 12 Tf\n1 0 0 1 72 720 Tm\n(owner path body) Tj\nET"
    pdf = build_pdf(
        [[content]], encrypted=True, encrypt_revision=rev,
        encrypt_user_pw=b"s3cret",
    )
    assert b"owner path body" not in pdf
    r = extract_pdf(pdf)
    assert r.error is None and r.text == "owner path body"


def test_both_passwords_set_still_typed_error():
    """When BOTH passwords are real, neither empty-password path can
    verify — must stay the typed 'encrypted' audit row."""
    from pdf_parser_spark.pdfcore.crypt import (
        StandardDecryptor,
        UnsupportedEncryption,
        compute_key,
        compute_o_value,
        compute_u_value,
    )

    o = compute_o_value(b"ownerpw", b"userpw", 3, 16)
    key = compute_key(o, -4, b"\x01" * 16, 3, 16, password=b"userpw")
    u = compute_u_value(key, b"\x01" * 16, 3)
    enc = {"Filter": "Standard", "V": 2, "R": 3, "O": o, "U": u,
           "P": -4, "Length": 128}
    with pytest.raises(UnsupportedEncryption, match="password"):
        StandardDecryptor(enc, b"\x01" * 16)


# ---------------------------------------- /EncryptMetadata false (V4)


def test_encrypt_metadata_false_xmp_stays_plaintext():
    """V4 with /EncryptMetadata false: the catalog's XMP stream is
    stored in PLAINTEXT (§7.6.2 Algorithm 1 step b note) — the reader
    must skip stream decryption for it, or valid XML turns to garbage;
    every OTHER stream still decrypts (key hashed with ffffffff)."""
    from pdf_parser_spark.pdfcore.document import PdfDocument
    from pdf_parser_spark.pdfgen.writer import build_pdf

    xmp = b'<?xpacket begin=""?><x:xmpmeta xmlns:x="adobe:ns:meta/"/>'
    content = b"BT\n/F1 12 Tf\n1 0 0 1 72 720 Tm\n(meta false body) Tj\nET"
    pdf = build_pdf(
        [[content]],
        encrypted=True,
        encrypt_revision=4,
        metadata=xmp,
        encrypt_metadata=False,
    )
    # the XMP really is on disk in the clear; the content stream is not
    assert xmp in pdf
    assert b"meta false body" not in pdf
    r = extract_pdf(pdf)
    assert r.error is None and r.text == "meta false body"
    doc = PdfDocument(pdf)
    meta = doc.resolve(doc.catalog().get("Metadata"))
    assert doc.stream_bytes(meta) == xmp


def test_encrypt_metadata_default_xmp_encrypted():
    """Control: with /EncryptMetadata true (default) the XMP stream is
    enciphered like any other and round-trips through decryption."""
    from pdf_parser_spark.pdfcore.document import PdfDocument
    from pdf_parser_spark.pdfgen.writer import build_pdf

    xmp = b'<?xpacket begin=""?><x:xmpmeta xmlns:x="adobe:ns:meta/"/>'
    content = b"BT\n/F1 12 Tf\n1 0 0 1 72 720 Tm\n(meta true body) Tj\nET"
    pdf = build_pdf(
        [[content]], encrypted=True, encrypt_revision=4, metadata=xmp
    )
    assert xmp not in pdf
    doc = PdfDocument(pdf)
    meta = doc.resolve(doc.catalog().get("Metadata"))
    assert doc.stream_bytes(meta) == xmp
    assert extract_pdf(pdf).text == "meta true body"


# ------------------------------------------- external-writer fixtures


def test_external_writer_fixtures_decrypt_and_extract():
    """Interop against encryption bytes the repo did NOT produce: the
    vendored fixtures were assembled by tests/fixtures/
    make_external_crypt_fixtures.py — a byte-level PDF encryptor
    written only from the ISO 32000 wording on hashlib + the
    ``cryptography`` package, importing nothing from pdf_parser_spark.
    (No external PDF generator exists in this sandbox — no qpdf/
    pikepdf/mupdf/network — so an independent in-test writer is the
    strongest available external pin for /U, /UE, /O, /OE, /Perms.)

    Three guards: (1) regeneration reproduces the vendored bytes, so
    the fixture can't silently drift to match a repo change; (2) the
    sha256 of each fixture is pinned as a constant; (3) the repo's
    reader decrypts both and extracts the exact text."""
    import hashlib
    import os
    import sys

    here = os.path.join(os.path.dirname(__file__), "fixtures")
    sys.path.insert(0, here)
    try:
        import make_external_crypt_fixtures as gen
    finally:
        sys.path.remove(here)

    pins = {
        "external_aes256_r6.pdf": (
            "600fe6e94b3ae782716d9a589c8b86de"
            "5202fa546c89f1a5049fa6e1a7adc7d6"
        ),
        "external_rc4_r3.pdf": (
            "4b6c7e149cf07ebf280e24da8b393f1f"
            "c49dca99b3ccde297e5e2b004d9f46eb"
        ),
    }
    for name, build in gen.FIXTURES.items():
        with open(os.path.join(here, name), "rb") as f:
            vendored = f.read()
        assert build() == vendored, f"{name} drifted from its generator"
        assert hashlib.sha256(vendored).hexdigest() == pins[name]
        r = extract_pdf(vendored)
        assert r.error is None, (name, r.error)
        assert r.text == gen.EXPECTED_TEXT
        # ciphertext really differs from plaintext at the byte level
        assert b"external interop" not in vendored


def test_external_aes256_fixture_rejects_corrupt_u():
    """Flipping one /U byte must surface the typed 'encrypted' row —
    proving the fixture's verification bytes are load-bearing, not
    bypassed."""
    import os
    import re

    path = os.path.join(
        os.path.dirname(__file__), "fixtures", "external_aes256_r6.pdf"
    )
    with open(path, "rb") as f:
        pdf = f.read()
    m = re.search(rb"/U <([0-9A-F]+)>", pdf)
    assert m
    flipped = bytearray(m.group(1))
    flipped[0] = ord("F") if flipped[0] != ord("F") else ord("0")
    bad = pdf[: m.start(1)] + bytes(flipped) + pdf[m.end(1) :]
    r = extract_pdf(bad)
    assert r.error == "encrypted" and r.text == ""
