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

Supported (always for the EMPTY user password — the crawl case):

- V ∈ {1, 2}, R ∈ {2, 3}: RC4, 40-128 bit;
- V 4, R 4: crypt filters /StdCF with /CFM /V2 (RC4) or /AESV2
  (AES-128-CBC, per-object key salted with 'sAlT', IV-prefixed data,
  §7.6.2 Algorithm 1 step b) — including /EncryptMetadata false
  (ffffffff appended to the key hash);
- V 5, R 6: /AESV3 (AES-256-CBC, ISO 32000-2 §7.6.4): the hardened
  iterated hash (Algorithm 2.B: SHA-256/384/512 rounds keyed by an
  AES-128-CBC feedback), /U validation + /UE file-key unwrap, /Perms
  integrity check.

Both empty-password paths are tried: the user path first, then the
owner path (Algorithm 7 for RC4, the owner hash + /OE unwrap for R6),
unlocking documents where only the user password was set. Anything
else (both passwords real, unknown handlers/CFMs, R5) raises
:class:`UnsupportedEncryption`, which the kernel converts into the
typed ``encrypted`` audit row — never a crash, never garbage text.
"""

from __future__ import annotations

import hashlib

from .aes import cbc_decrypt, cbc_encrypt, encrypt_block

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
    """Encryption present but outside the supported subset (or both
    passwords are real and neither empty-password path verifies)."""


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
    extra: bytes = b"",
) -> bytes:
    """Algorithm 2: the file encryption key. *extra* carries the
    ffffffff suffix hashed in when R ≥ 4 and /EncryptMetadata false."""
    md = hashlib.md5()
    md.update(_pad_password(password))
    md.update(o_value[:32])
    md.update((p_value & 0xFFFFFFFF).to_bytes(4, "little"))
    md.update(id0)
    md.update(extra)
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


def recover_user_password(
    owner_pw: bytes, o_value: bytes, revision: int, key_bytes: int
) -> bytes:
    """Algorithm 7 (§7.6.3.4): decrypt /O with the owner-password key,
    recovering the PADDED user password (already 32 bytes — feeding it
    to Algorithm 2 is a no-op pad)."""
    digest = hashlib.md5(_pad_password(owner_pw)).digest()
    if revision >= 3:
        for _ in range(50):
            digest = hashlib.md5(digest).digest()
    key = digest[:key_bytes]
    if revision == 2:
        return rc4(key, o_value[:32])
    out = o_value[:32]
    for i in range(19, -1, -1):
        out = rc4(bytes(b ^ i for b in key), out)
    return out


def verify_user_password(key: bytes, u_value: bytes, id0: bytes, revision: int) -> bool:
    """Algorithm 6: does *key* (derived from a candidate password)
    reproduce /U? R3 compares only the first 16 bytes (§7.6.3.4)."""
    expected = compute_u_value(key, id0, revision)
    if revision == 2:
        return expected == u_value[:32]
    return expected[:16] == u_value[:16]


# ------------------------------------------------- V5/R6 hardened hash


import functools


@functools.lru_cache(maxsize=256)
def hash_2b(password: bytes, salt: bytes, udata: bytes = b"") -> bytes:
    """ISO 32000-2 §7.6.4.3.4 Algorithm 2.B — the R6 iterated hash:
    SHA-256 seed, then ≥64 rounds of AES-128-CBC feedback selecting
    SHA-256/384/512 by the block sum mod 3; after completing round n
    (1-based, n ≥ 64) stop when the last feedback byte ≤ n − 32.  With
    ``i`` the 0-based index of the just-completed round, n = i + 1, so
    the interop-correct stop condition (qpdf, pdf.js, mupdf agree) is
    ``e[-1] <= i - 31`` — NOT ``i - 32``, which diverges on ~2.5% of
    salts (pinned by test_crypt_filters.py's divergence goldens).

    lru_cached: the hash is an intentional anti-brute-force KDF (~15k
    AES block encrypts), and a corpus of fixtures sharing salts — or a
    reader re-opening documents — should pay it once per (pw, salt)."""
    k = hashlib.sha256(password + salt + udata).digest()
    i = 0
    while True:
        k1 = (password + k + udata) * 64
        e = cbc_encrypt(k1, k[:16], k[16:32], pad=False)
        mod = sum(e[:16]) % 3
        k = (hashlib.sha256, hashlib.sha384, hashlib.sha512)[mod](e).digest()
        if i >= 63 and e[-1] <= i - 31:
            return k[:32]
        i += 1


def _iv_for(id0: bytes, num: int, gen: int) -> bytes:
    """Deterministic per-object IV for the FIXTURE encryptor (IVs need
    uniqueness, not secrecy; determinism keeps goldens byte-stable)."""
    return hashlib.md5(id0 + f":{num}:{gen}".encode()).digest()


class StandardDecryptor:
    """Per-object decryption for one document (RC4 / AES-128 / AES-256).

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
        self.revision = r
        self._id0 = id0
        # /EncryptMetadata false (R ≥ 4): the XMP metadata stream is
        # stored in PLAINTEXT — the document reader must skip stream
        # decryption for it (document.py honors this flag)
        self.encrypt_metadata = enc.get("EncryptMetadata") is not False
        o_value = enc.get("O")
        u_value = enc.get("U")
        if not isinstance(o_value, bytes) or not isinstance(u_value, bytes):
            raise UnsupportedEncryption("missing /O or /U")

        if v in (1, 2) and r in (2, 3):
            self.cipher = "rc4"
            self._init_rc4(enc, o_value, u_value, id0, v, r)
        elif v == 4 and r == 4:
            self._init_v4(enc, o_value, u_value, id0)
        elif v == 5 and r == 6:
            self._init_v5(enc, o_value, u_value)
        else:
            raise UnsupportedEncryption(
                f"V={v} R={r} (supported: RC4 V1/V2, V4 StdCF, V5 R6)"
            )

    # ------------------------------------------------------ RC4 (V1/V2)

    def _init_rc4(self, enc, o_value, u_value, id0, v, r, extra=b""):
        length = int(enc.get("Length") or 40)
        if length % 8 or not 40 <= length <= 128:
            raise UnsupportedEncryption(f"bad /Length {length}")
        key_bytes = 5 if v == 1 else length // 8
        p_value = int(enc.get("P") or 0)
        key = compute_key(
            o_value, p_value, id0, r, key_bytes, password=b"", extra=extra
        )
        if not verify_user_password(key, u_value, id0, min(r, 3)):
            # empty USER password failed — try the empty OWNER password
            # (Algorithm 7, §7.6.3.4): decrypt /O with the owner-derived
            # key to recover the padded user password, then re-derive.
            # Unlocks the real-world case of a user password set by a
            # generator whose owner password was left blank.
            user_pw = recover_user_password(b"", o_value, min(r, 3), key_bytes)
            key = compute_key(
                o_value, p_value, id0, r, key_bytes,
                password=user_pw, extra=extra,
            )
            if not verify_user_password(key, u_value, id0, min(r, 3)):
                raise UnsupportedEncryption("user password required")
        self.key = key

    # --------------------------------------------- V4 (crypt filters)

    def _init_v4(self, enc, o_value, u_value, id0):
        stmf = str(enc.get("StmF") or "Identity")
        strf = str(enc.get("StrF") or "Identity")
        if stmf != strf:
            raise UnsupportedEncryption(f"split StmF/StrF {stmf}/{strf}")
        cf = enc.get("CF") or {}
        cfd = cf.get(stmf) if isinstance(cf, dict) else None
        cfm = str((cfd or {}).get("CFM") or "Identity")
        if cfm == "V2":
            self.cipher = "rc4"
        elif cfm == "AESV2":
            self.cipher = "aesv2"
        else:
            raise UnsupportedEncryption(f"CFM /{cfm}")
        meta = enc.get("EncryptMetadata")
        extra = b"\xff\xff\xff\xff" if meta is False else b""
        self._init_rc4(enc, o_value, u_value, id0, v=2, r=4, extra=extra)

    # ----------------------------------------------------- V5 (AESV3)

    def _init_v5(self, enc, o_value, u_value):
        if len(u_value) < 48:
            raise UnsupportedEncryption("short /U for R6")
        ue = enc.get("UE")
        if not isinstance(ue, bytes) or len(ue) < 32:
            raise UnsupportedEncryption("missing /UE")
        vsalt, ksalt = u_value[32:40], u_value[40:48]
        if hash_2b(b"", vsalt) == u_value[:32]:
            ikey = hash_2b(b"", ksalt)
            self.key = cbc_decrypt(ue[:32], ikey, b"\x00" * 16, unpad=False)
        else:
            # empty OWNER password path (Algorithm 12/9: the owner hash
            # and /OE unwrap salt with the first 48 bytes of /U)
            oe = enc.get("OE")
            if (
                len(o_value) < 48
                or not isinstance(oe, bytes)
                or len(oe) < 32
                or hash_2b(b"", o_value[32:40], u_value[:48]) != o_value[:32]
            ):
                raise UnsupportedEncryption("user password required")
            ikey = hash_2b(b"", o_value[40:48], u_value[:48])
            self.key = cbc_decrypt(oe[:32], ikey, b"\x00" * 16, unpad=False)
        self.cipher = "aesv3"
        perms = enc.get("Perms")
        if isinstance(perms, bytes) and len(perms) >= 16:
            from .aes import _decrypt_block, _expand_key

            dec = _decrypt_block(perms[:16], _expand_key(self.key))
            if dec[9:12] != b"adb":
                raise UnsupportedEncryption("/Perms integrity check failed")

    # ------------------------------------------------------- data path

    def object_key(self, num: int, gen: int) -> bytes:
        md = hashlib.md5()
        md.update(self.key)
        md.update((num & 0xFFFFFF).to_bytes(3, "little"))
        md.update((gen & 0xFFFF).to_bytes(2, "little"))
        if self.cipher == "aesv2":
            md.update(b"sAlT")  # §7.6.2 Algorithm 1 step b
        return md.digest()[: min(len(self.key) + 5, 16)]

    def decrypt(self, data: bytes, num: int, gen: int) -> bytes:
        if self.cipher == "rc4":
            return rc4(self.object_key(num, gen), data)
        if len(data) < 16:
            return b""  # AES data must carry a 16-byte IV prefix
        key = self.key if self.cipher == "aesv3" else self.object_key(num, gen)
        return cbc_decrypt(data[16:], key, data[:16])

    def encrypt(self, data: bytes, num: int, gen: int) -> bytes:
        """Fixture-encryptor side. RC4 is symmetric; AES prepends a
        deterministic per-object IV and pads."""
        if self.cipher == "rc4":
            return rc4(self.object_key(num, gen), data)
        key = self.key if self.cipher == "aesv3" else self.object_key(num, gen)
        iv = _iv_for(self._id0, num, gen)
        return iv + cbc_encrypt(data, key, iv)


def build_encrypt_dict(
    id0: bytes,
    revision: int = 3,
    length: int = 128,
    permissions: int = -4,
    user_pw: bytes = b"",
    encrypt_metadata: bool = True,
) -> tuple[dict, StandardDecryptor]:
    """Fixture-encryptor helper: a /Standard encryption dictionary for
    empty owner+user passwords, plus the matching cryptor.
    Deterministic for a given *id0*. Revisions: 2 (RC4-40), 3
    (RC4-128), 4 (AES-128 /AESV2 crypt filter), 6 (AES-256 /AESV3,
    ISO 32000-2). encrypt_metadata=False (R4 only): /EncryptMetadata
    false — ffffffff enters the key hash (§7.6.2 Algorithm 1 step b)
    and the XMP stream is expected to be stored in plaintext."""
    if revision == 6:
        return _build_encrypt_dict_r6(id0, permissions, user_pw=user_pw)
    v = {2: 1, 3: 2, 4: 4}[revision]
    key_bytes = 5 if revision == 2 else length // 8
    extra = b""
    if revision == 4 and not encrypt_metadata:
        extra = b"\xff\xff\xff\xff"
    o_value = compute_o_value(b"", user_pw, min(revision, 3), key_bytes)
    key = compute_key(
        o_value, permissions, id0, revision, key_bytes, password=user_pw,
        extra=extra,
    )
    u_value = compute_u_value(key, id0, min(revision, 3))
    enc = {
        "Filter": "Standard",
        "V": v,
        "R": revision,
        "O": o_value,
        "U": u_value,
        "P": permissions,
        "Length": key_bytes * 8,
    }
    if revision == 4:
        enc["CF"] = {"StdCF": {"CFM": "AESV2", "Length": 16}}
        enc["StmF"] = "StdCF"
        enc["StrF"] = "StdCF"
        if not encrypt_metadata:
            enc["EncryptMetadata"] = False
    cryptor = StandardDecryptor(enc, id0)
    return enc, cryptor


def _build_encrypt_dict_r6(
    id0: bytes, permissions: int = -4, user_pw: bytes = b""
) -> tuple[dict, StandardDecryptor]:
    """AES-256 /AESV3 (R6): /U, /UE, /O, /OE, /Perms follow ISO
    32000-2 §7.6.4.4 Algorithms 8-10 for empty passwords.

    Fixture-determinism choice: salts and the file key are FIXED
    constants (not per-document), so the anti-brute-force hardened
    hash — ~15k AES block encrypts per (pw, salt) by design — runs
    once per process via the lru_cache instead of 6× per document.
    Per-object IVs still derive from *id0*, so ciphertexts differ per
    document; uniqueness of the file key across fixtures is a
    non-goal (these are test corpora, not secrets)."""
    h = lambda tag: hashlib.md5(b"pdf-parser-spark-r6" + tag).digest()  # noqa: E731
    file_key = h(b"K1") + h(b"K2")  # 32 deterministic bytes
    uvsalt, uksalt = h(b"uv")[:8], h(b"uk")[:8]
    u_value = hash_2b(user_pw, uvsalt) + uvsalt + uksalt
    ue = cbc_encrypt(
        file_key, hash_2b(user_pw, uksalt), b"\x00" * 16, pad=False
    )
    ovsalt, oksalt = h(b"ov")[:8], h(b"ok")[:8]
    o_value = hash_2b(b"", ovsalt, u_value) + ovsalt + oksalt
    oe = cbc_encrypt(
        file_key, hash_2b(b"", oksalt, u_value), b"\x00" * 16, pad=False
    )
    perms_pt = (
        (permissions & 0xFFFFFFFF).to_bytes(4, "little")
        + b"\xff\xff\xff\xff"
        + b"T"  # EncryptMetadata true
        + b"adb"
        + h(b"rnd")[:4]
    )
    perms = encrypt_block(perms_pt, file_key)
    enc = {
        "Filter": "Standard",
        "V": 5,
        "R": 6,
        "O": o_value,
        "U": u_value,
        "OE": oe,
        "UE": ue,
        "P": permissions,
        "Perms": perms,
        "Length": 256,
        "CF": {"StdCF": {"CFM": "AESV3", "Length": 32}},
        "StmF": "StdCF",
        "StrF": "StdCF",
    }
    cryptor = StandardDecryptor(enc, id0)
    return enc, cryptor
