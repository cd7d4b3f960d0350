"""Independent encrypted-PDF fixture writer — the interop twin.

This sandbox ships no external PDF generator (no qpdf, pikepdf, mupdf,
Ghostscript, and no network), so a truly third-party AES-256 fixture
cannot be produced here. This module is the closest substitute: a
byte-level PDF encryptor written ONLY from the ISO 32000 wording, using
``hashlib`` and the ``cryptography`` package's AES — it imports nothing
from pdf_parser_spark, shares no code with pdfcore/crypt.py or
pdfgen/writer.py, and assembles the file, xref table, and encryption
dictionary by hand. The /U, /UE, /O, /OE, /Perms bytes in the vendored
fixtures were therefore NOT produced by the code under test; a shared
bug would require the same independent misreading of the spec twice.

Deterministic by construction (fixed salts, file key, and per-object
IVs): regenerating must reproduce the vendored bytes exactly, which the
test asserts — the fixtures cannot silently drift to match a repo
change.

Run directly to (re)write the two fixtures next to this file:

    python tests/fixtures/make_external_crypt_fixtures.py
"""

from __future__ import annotations

import hashlib
import os

from cryptography.hazmat.primitives.ciphers import Cipher, algorithms, modes

HERE = os.path.dirname(os.path.abspath(__file__))

PAD = bytes.fromhex(
    "28BF4E5E4E758A4164004E56FFFA01082E2E00B6D0683E802F0CA9FE6453697A"
)


# ----------------------------------------------------------------- AES


def _aes_cbc_encrypt(key: bytes, iv: bytes, data: bytes) -> bytes:
    enc = Cipher(algorithms.AES(key), modes.CBC(iv)).encryptor()
    return enc.update(data) + enc.finalize()


def _aes_ecb_encrypt(key: bytes, block: bytes) -> bytes:
    enc = Cipher(algorithms.AES(key), modes.ECB()).encryptor()
    return enc.update(block) + enc.finalize()


def _pkcs7(data: bytes) -> bytes:
    n = 16 - len(data) % 16
    return data + bytes([n]) * n


# ----------------------------------------------------------------- RC4


def _rc4(key: bytes, data: bytes) -> bytes:
    s = list(range(256))
    j = 0
    for i in range(256):
        j = (j + s[i] + key[i % len(key)]) & 0xFF
        s[i], s[j] = s[j], s[i]
    out = bytearray()
    i = j = 0
    for c in data:
        i = (i + 1) & 0xFF
        j = (j + s[i]) & 0xFF
        s[i], s[j] = s[j], s[i]
        out.append(c ^ s[(s[i] + s[j]) & 0xFF])
    return bytes(out)


# ------------------------------------------------- R6 KDF (ISO 32000-2)


def _hash_2b(password: bytes, salt: bytes, udata: bytes = b"") -> bytes:
    """Algorithm 2.B, written from the §7.6.4.3.4 wording with 1-based
    round counting: after completing round n >= 64, stop when the last
    byte of E <= n - 32."""
    k = hashlib.sha256(password + salt + udata).digest()
    n = 0
    while True:
        k1 = (password + k + udata) * 64
        e = _aes_cbc_encrypt(k[:16], k[16:32], k1)
        k = (hashlib.sha256, hashlib.sha384, hashlib.sha512)[sum(e[:16]) % 3](
            e
        ).digest()
        n += 1
        if n >= 64 and e[-1] <= n - 32:
            return k[:32]


# ------------------------------------------------------- PDF assembly


def _assemble(objects: list[bytes], trailer_extra: bytes, id_hex: str) -> bytes:
    """Classic-xref PDF: objects are full ``N 0 obj ... endobj`` bodies
    numbered 1..len(objects)."""
    head = b"%PDF-1.7\n%\xc3\xa4\xc3\xbc\xc3\xb6\n"
    out = bytearray(head)
    offsets = []
    for body in objects:
        offsets.append(len(out))
        out += body + b"\n"
    xref_at = len(out)
    out += b"xref\n0 %d\n" % (len(objects) + 1)
    out += b"0000000000 65535 f \n"
    for off in offsets:
        out += b"%010d 00000 n \n" % off
    out += (
        b"trailer\n<< /Size %d /Root 1 0 R " % (len(objects) + 1)
        + trailer_extra
        + b" /ID [<%s> <%s>] >>\nstartxref\n%d\n%%%%EOF\n"
        % (id_hex.encode(), id_hex.encode(), xref_at)
    )
    return bytes(out)


def _doc_objects(content_cipher: bytes) -> list[bytes]:
    return [
        b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj",
        b"2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj",
        b"3 0 obj\n<< /Type /Page /Parent 2 0 R"
        b" /MediaBox [0 0 612 792] /Contents 4 0 R"
        b" /Resources << /Font << /F1 5 0 R >> >> >>\nendobj",
        b"4 0 obj\n<< /Length %d >>\nstream\n" % len(content_cipher)
        + content_cipher
        + b"\nendstream\nendobj",
        b"5 0 obj\n<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica"
        b" /Encoding /WinAnsiEncoding >>\nendobj",
    ]


CONTENT = b"BT\n/F1 12 Tf\n1 0 0 1 72 720 Tm\n(external interop) Tj\nET"
EXPECTED_TEXT = "external interop"


# --------------------------------------------------------- AES-256 R6


def build_aes256_r6() -> bytes:
    """Empty user/owner password, V5 R6 AESV3 — every encryption-
    dictionary byte derived here, not by the code under test. All
    inputs fixed so the output is byte-deterministic."""
    file_key = bytes(range(32))
    u_vsalt, u_ksalt = b"UVALSALT", b"UKEYSALT"
    o_vsalt, o_ksalt = b"OVALSALT", b"OKEYSALT"
    pw = b""  # empty user + owner password

    u_hash = _hash_2b(pw, u_vsalt)
    u_value = u_hash + u_vsalt + u_ksalt  # 48 bytes
    ue = _aes_cbc_encrypt(_hash_2b(pw, u_ksalt), b"\x00" * 16, file_key)

    o_hash = _hash_2b(pw, o_vsalt, u_value)
    o_value = o_hash + o_vsalt + o_ksalt
    oe = _aes_cbc_encrypt(
        _hash_2b(pw, o_ksalt, u_value), b"\x00" * 16, file_key
    )

    p_value = -3904
    perms_block = (
        (p_value & 0xFFFFFFFF).to_bytes(4, "little")
        + b"\xff\xff\xff\xff"
        + b"T"  # EncryptMetadata true
        + b"adb"
        + b"fixt"  # arbitrary tail
    )
    perms = _aes_ecb_encrypt(file_key, perms_block)

    iv = hashlib.md5(b"aes256-r6-content-iv").digest()
    cipher = iv + _aes_cbc_encrypt(file_key, iv, _pkcs7(CONTENT))

    enc_dict = (
        b"6 0 obj\n<< /Filter /Standard /V 5 /R 6 /Length 256"
        b" /CF << /StdCF << /CFM /AESV3 /AuthEvent /DocOpen /Length 32 >> >>"
        b" /StmF /StdCF /StrF /StdCF"
        b" /O <%s> /U <%s> /OE <%s> /UE <%s> /Perms <%s>"
        b" /P %d >>\nendobj"
        % (
            o_value.hex().upper().encode(),
            u_value.hex().upper().encode(),
            oe.hex().upper().encode(),
            ue.hex().upper().encode(),
            perms.hex().upper().encode(),
            p_value,
        )
    )
    objects = _doc_objects(cipher) + [enc_dict]
    return _assemble(
        objects, b"/Encrypt 6 0 R", hashlib.md5(b"aes256-fixture-id").hexdigest().upper()
    )


# ----------------------------------------------------------- RC4 R3


def _rc4_compute_key(
    o_value: bytes, p_value: int, id0: bytes, n_bytes: int, password: bytes = b""
) -> bytes:
    """Algorithm 2 (R3): MD5 over padded pw + O + P + ID, then 50
    re-hash rounds over the first n bytes."""
    h = hashlib.md5(
        (password + PAD)[:32]
        + o_value
        + (p_value & 0xFFFFFFFF).to_bytes(4, "little")
        + id0
    ).digest()
    for _ in range(50):
        h = hashlib.md5(h[:n_bytes]).digest()
    return h[:n_bytes]


def build_rc4_r3() -> bytes:
    """Empty user/owner password, V2 R3 128-bit RC4."""
    id0 = hashlib.md5(b"rc4-r3-fixture-id").digest()
    n_bytes = 16  # /Length 128
    p_value = -3904

    # Algorithm 3: /O from the (empty) owner password
    h = hashlib.md5((b"" + PAD)[:32]).digest()
    for _ in range(50):
        h = hashlib.md5(h).digest()
    okey = h[:n_bytes]
    o_value = _rc4(okey, (b"" + PAD)[:32])
    for i in range(1, 20):
        o_value = _rc4(bytes(b ^ i for b in okey), o_value)

    key = _rc4_compute_key(o_value, p_value, id0, n_bytes)

    # Algorithm 5: /U
    u = _rc4(key, hashlib.md5(PAD + id0).digest())
    for i in range(1, 20):
        u = _rc4(bytes(b ^ i for b in key), u)
    u_value = u + b"\x00" * 16

    def obj_key(num: int, gen: int) -> bytes:
        d = hashlib.md5(
            key
            + (num & 0xFFFFFF).to_bytes(3, "little")
            + (gen & 0xFFFF).to_bytes(2, "little")
        ).digest()
        return d[: min(n_bytes + 5, 16)]

    cipher = _rc4(obj_key(4, 0), CONTENT)

    enc_dict = (
        b"6 0 obj\n<< /Filter /Standard /V 2 /R 3 /Length 128"
        b" /O <%s> /U <%s> /P %d >>\nendobj"
        % (o_value.hex().upper().encode(), u_value.hex().upper().encode(), p_value)
    )
    objects = _doc_objects(cipher) + [enc_dict]
    return _assemble(objects, b"/Encrypt 6 0 R", id0.hex().upper())


FIXTURES = {
    "external_aes256_r6.pdf": build_aes256_r6,
    "external_rc4_r3.pdf": build_rc4_r3,
}


def main() -> None:
    for name, build in FIXTURES.items():
        path = os.path.join(HERE, name)
        data = build()
        with open(path, "wb") as f:
            f.write(data)
        print(f"{name}: {len(data)} bytes sha256={hashlib.sha256(data).hexdigest()}")


if __name__ == "__main__":
    main()
