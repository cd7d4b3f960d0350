"""Standard security handler — RC4 encryption (ISO 32000-1 §7.6.2-7.6.3).

The reference gets decryption for free from pikepdf (it never opens an
encrypted document itself — pikepdf.open would prompt/fail). We
implement the public-spec RC4 flavours directly so that the common
crawl case — an encrypted PDF with an EMPTY user password — extracts
instead of dying as a typed ``encrypted`` audit row:

- key derivation, Algorithm 2 (§7.6.3.3): md5(pad ∥ O ∥ P ∥ ID[0]),
  50 extra md5 rounds when R ≥ 3;
- user-password verification, Algorithms 4/5 (§7.6.3.4);
- per-object keys, Algorithm 1 (§7.6.2): md5(key ∥ num₃LE ∥ gen₂LE);
- RC4 itself (public algorithm; also used by the fixture *encryptor*
  in pdfgen — RC4 is symmetric).

Supported: /Filter /Standard, V ∈ {1, 2}, R ∈ {2, 3}. Everything else
(AESV2/V3, crypt filters, user passwords we cannot verify) raises
:class:`UnsupportedEncryption`, which the kernel converts into the
typed ``encrypted`` audit row — never a crash, never garbage text.
"""

from __future__ import annotations

import hashlib

# the 32-byte padding string from ISO 32000-1 Table 21 / §7.6.3.3
PAD = bytes(
    [
        0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41,
        0x64, 0x00, 0x4E, 0x56, 0xFF, 0xFA, 0x01, 0x08,
        0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
        0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A,
    ]
)


class UnsupportedEncryption(ValueError):
    """Encryption present but outside the supported RC4 subset."""


def rc4(key: bytes, data: bytes) -> bytes:
    """Plain RC4 (KSA + PRGA). Symmetric: encrypt == decrypt."""
    S = list(range(256))
    j = 0
    klen = len(key)
    for i in range(256):
        j = (j + S[i] + key[i % klen]) & 0xFF
        S[i], S[j] = S[j], S[i]
    out = bytearray(len(data))
    i = j = 0
    for n, byte in enumerate(data):
        i = (i + 1) & 0xFF
        j = (j + S[i]) & 0xFF
        S[i], S[j] = S[j], S[i]
        out[n] = byte ^ S[(S[i] + S[j]) & 0xFF]
    return bytes(out)


def _pad_password(pw: bytes) -> bytes:
    return (pw + PAD)[:32]


def compute_key(
    o_value: bytes,
    p_value: int,
    id0: bytes,
    revision: int,
    key_bytes: int,
    password: bytes = b"",
) -> bytes:
    """Algorithm 2: the file encryption key."""
    md = hashlib.md5()
    md.update(_pad_password(password))
    md.update(o_value[:32])
    md.update((p_value & 0xFFFFFFFF).to_bytes(4, "little"))
    md.update(id0)
    digest = md.digest()
    if revision >= 3:
        for _ in range(50):
            digest = hashlib.md5(digest[:key_bytes]).digest()
    return digest[:key_bytes]


def compute_o_value(
    owner_pw: bytes, user_pw: bytes, revision: int, key_bytes: int
) -> bytes:
    """Algorithm 3: the /O entry (fixture encryptor side)."""
    digest = hashlib.md5(_pad_password(owner_pw)).digest()
    if revision >= 3:
        for _ in range(50):
            digest = hashlib.md5(digest).digest()
    key = digest[:key_bytes]
    out = rc4(key, _pad_password(user_pw))
    if revision >= 3:
        for i in range(1, 20):
            out = rc4(bytes(b ^ i for b in key), out)
    return out


def compute_u_value(key: bytes, id0: bytes, revision: int) -> bytes:
    """Algorithms 4 (R2) / 5 (R3): the /U entry."""
    if revision == 2:
        return rc4(key, PAD)
    digest = hashlib.md5(PAD + id0).digest()
    out = rc4(key, digest)
    for i in range(1, 20):
        out = rc4(bytes(b ^ i for b in key), out)
    return out + b"\x00" * 16


def verify_user_password(key: bytes, u_value: bytes, id0: bytes, revision: int) -> bool:
    """Algorithm 6: does *key* (derived from a candidate password)
    reproduce /U? R3 compares only the first 16 bytes (§7.6.3.4)."""
    expected = compute_u_value(key, id0, revision)
    if revision == 2:
        return expected == u_value[:32]
    return expected[:16] == u_value[:16]


class StandardDecryptor:
    """Per-object RC4 decryption for one document.

    Raises :class:`UnsupportedEncryption` from the constructor when the
    dictionary is outside the supported subset or the empty user
    password does not verify (a real password we don't have).
    """

    def __init__(self, enc: dict, id0: bytes):
        filt = str(enc.get("Filter") or "")
        if filt != "Standard":
            raise UnsupportedEncryption(f"security handler /{filt}")
        v = int(enc.get("V") or 0)
        r = int(enc.get("R") or 0)
        if v not in (1, 2) or r not in (2, 3):
            raise UnsupportedEncryption(f"V={v} R={r} (RC4 V1/V2 R2/R3 only)")
        o_value = enc.get("O")
        u_value = enc.get("U")
        if not isinstance(o_value, bytes) or not isinstance(u_value, bytes):
            raise UnsupportedEncryption("missing /O or /U")
        length = int(enc.get("Length") or 40)
        if length % 8 or not 40 <= length <= 128:
            raise UnsupportedEncryption(f"bad /Length {length}")
        key_bytes = 5 if v == 1 else length // 8
        p_value = int(enc.get("P") or 0)
        key = compute_key(o_value, p_value, id0, r, key_bytes, password=b"")
        if not verify_user_password(key, u_value, id0, r):
            raise UnsupportedEncryption("user password required")
        self.key = key
        self.revision = r

    def object_key(self, num: int, gen: int) -> bytes:
        md = hashlib.md5()
        md.update(self.key)
        md.update((num & 0xFFFFFF).to_bytes(3, "little"))
        md.update((gen & 0xFFFF).to_bytes(2, "little"))
        return md.digest()[: min(len(self.key) + 5, 16)]

    def decrypt(self, data: bytes, num: int, gen: int) -> bytes:
        return rc4(self.object_key(num, gen), data)

    # symmetric cipher: the fixture encryptor reuses the same math
    encrypt = decrypt


def build_encrypt_dict(
    id0: bytes, revision: int = 3, length: int = 128, permissions: int = -4
) -> tuple[dict, StandardDecryptor]:
    """Fixture-encryptor helper: a /Standard RC4 encryption dictionary
    for empty owner+user passwords, plus the matching (symmetric)
    cryptor. Deterministic for a given *id0*."""
    v = 1 if revision == 2 else 2
    key_bytes = 5 if revision == 2 else length // 8
    o_value = compute_o_value(b"", b"", revision, key_bytes)
    key = compute_key(o_value, permissions, id0, revision, key_bytes)
    u_value = compute_u_value(key, id0, revision)
    enc = {
        "Filter": "Standard",
        "V": v,
        "R": revision,
        "O": o_value,
        "U": u_value,
        "P": permissions,
        "Length": key_bytes * 8,
    }
    cryptor = StandardDecryptor(enc, id0)
    return enc, cryptor
