"""AES-128/256 in pure Python (FIPS-197) with CBC mode — just enough
for PDF standard-security crypt filters (/AESV2, /AESV3; ISO 32000
§7.6.2-7.6.3), since this container has no crypto libraries.

Correctness is pinned to the FIPS-197 appendix vectors in
tests/test_crypt_filters.py. Throughput is a few hundred KB/s — fine
for content streams (KBs each); a production deployment would swap in
``cryptography``/OpenSSL behind the same function signatures.
"""

from __future__ import annotations

# S-box / inverse S-box (FIPS-197 figure 7 / figure 14 — public constants)
_SBOX = bytes.fromhex(
    "637c777bf26b6fc53001672bfed7ab76ca82c97dfa5947f0add4a2af9ca472c0"
    "b7fd9326363ff7cc34a5e5f171d8311504c723c31896059a071280e2eb27b275"
    "09832c1a1b6e5aa0523bd6b329e32f8453d100ed20fcb15b6acbbe394a4c58cf"
    "d0efaafb434d338545f9027f503c9fa851a3408f929d38f5bcb6da2110fff3d2"
    "cd0c13ec5f974417c4a77e3d645d197360814fdc222a908846eeb814de5e0bdb"
    "e0323a0a4906245cc2d3ac629195e479e7c8376d8dd54ea96c56f4ea657aae08"
    "ba78252e1ca6b4c6e8dd741f4bbd8b8a703eb5664803f60e613557b986c11d9e"
    "e1f8981169d98e949b1e87e9ce5528df8ca1890dbfe6426841992d0fb054bb16"
)
_INV_SBOX = bytes(256)
_inv = bytearray(256)
for _i, _v in enumerate(_SBOX):
    _inv[_v] = _i
_INV_SBOX = bytes(_inv)

_RCON = [0x01, 0x02, 0x04, 0x08, 0x10, 0x20, 0x40, 0x80, 0x1B, 0x36, 0x6C, 0xD8]


def _xtime(a: int) -> int:
    a <<= 1
    if a & 0x100:
        a ^= 0x11B
    return a & 0xFF


# GF(2^8) multiply tables for the mix-columns coefficients we need
def _mul_table(c: int) -> bytes:
    out = bytearray(256)
    for x in range(256):
        r, a, b = 0, x, c
        while b:
            if b & 1:
                r ^= a
            a = _xtime(a)
            b >>= 1
        out[x] = r
    return bytes(out)


_M2, _M3 = _mul_table(2), _mul_table(3)
_M9, _M11, _M13, _M14 = (_mul_table(c) for c in (9, 11, 13, 14))


def _expand_key(key: bytes) -> list[bytes]:
    """Round keys as 16-byte blocks (FIPS-197 §5.2), Nk = 4 or 8."""
    nk = len(key) // 4
    if nk not in (4, 8):
        raise ValueError("AES key must be 128 or 256 bits")
    nr = nk + 6
    words = [key[4 * i : 4 * i + 4] for i in range(nk)]
    for i in range(nk, 4 * (nr + 1)):
        temp = words[i - 1]
        if i % nk == 0:
            temp = bytes(
                _SBOX[temp[(j + 1) % 4]] ^ (_RCON[i // nk - 1] if j == 0 else 0)
                for j in range(4)
            )
        elif nk == 8 and i % nk == 4:
            temp = bytes(_SBOX[b] for b in temp)
        words.append(bytes(a ^ b for a, b in zip(words[i - nk], temp)))
    return [b"".join(words[4 * r : 4 * r + 4]) for r in range(nr + 1)]


# T-tables (standard 32-bit formulation): T0[x] packs the MixColumns
# column for a SubBytes'd byte in row 0; T1-T3 are its rotations. One
# round = 4 table lookups + 3 xors per column — ~10× the naive loop,
# which matters because the R6 hardened hash runs ~15k block encrypts.
_T0 = [0] * 256
_T1 = [0] * 256
_T2 = [0] * 256
_T3 = [0] * 256
for _x in range(256):
    _s = _SBOX[_x]
    _s2, _s3 = _M2[_s], _M3[_s]
    _T0[_x] = (_s2 << 24) | (_s << 16) | (_s << 8) | _s3
    _T1[_x] = (_s3 << 24) | (_s2 << 16) | (_s << 8) | _s
    _T2[_x] = (_s << 24) | (_s3 << 16) | (_s2 << 8) | _s
    _T3[_x] = (_s << 24) | (_s << 16) | (_s3 << 8) | _s2


def _round_key_words(rks: list[bytes]) -> list[tuple[int, ...]]:
    return [
        tuple(int.from_bytes(rk[4 * c : 4 * c + 4], "big") for c in range(4))
        for rk in rks
    ]


def _encrypt_block(block: bytes, rks: list[bytes]) -> bytes:
    return _encrypt_block_words(block, _round_key_words(rks))


def _encrypt_block_words(block: bytes, rkw: list[tuple[int, ...]]) -> bytes:
    rk0 = rkw[0]
    c0 = int.from_bytes(block[0:4], "big") ^ rk0[0]
    c1 = int.from_bytes(block[4:8], "big") ^ rk0[1]
    c2 = int.from_bytes(block[8:12], "big") ^ rk0[2]
    c3 = int.from_bytes(block[12:16], "big") ^ rk0[3]
    nr = len(rkw) - 1
    T0, T1, T2, T3 = _T0, _T1, _T2, _T3
    for rnd in range(1, nr):
        rk = rkw[rnd]
        n0 = (
            T0[c0 >> 24] ^ T1[(c1 >> 16) & 0xFF] ^ T2[(c2 >> 8) & 0xFF]
            ^ T3[c3 & 0xFF] ^ rk[0]
        )
        n1 = (
            T0[c1 >> 24] ^ T1[(c2 >> 16) & 0xFF] ^ T2[(c3 >> 8) & 0xFF]
            ^ T3[c0 & 0xFF] ^ rk[1]
        )
        n2 = (
            T0[c2 >> 24] ^ T1[(c3 >> 16) & 0xFF] ^ T2[(c0 >> 8) & 0xFF]
            ^ T3[c1 & 0xFF] ^ rk[2]
        )
        n3 = (
            T0[c3 >> 24] ^ T1[(c0 >> 16) & 0xFF] ^ T2[(c1 >> 8) & 0xFF]
            ^ T3[c2 & 0xFF] ^ rk[3]
        )
        c0, c1, c2, c3 = n0, n1, n2, n3
    rk = rkw[nr]
    S = _SBOX
    o0 = (
        (S[c0 >> 24] << 24) | (S[(c1 >> 16) & 0xFF] << 16)
        | (S[(c2 >> 8) & 0xFF] << 8) | S[c3 & 0xFF]
    ) ^ rk[0]
    o1 = (
        (S[c1 >> 24] << 24) | (S[(c2 >> 16) & 0xFF] << 16)
        | (S[(c3 >> 8) & 0xFF] << 8) | S[c0 & 0xFF]
    ) ^ rk[1]
    o2 = (
        (S[c2 >> 24] << 24) | (S[(c3 >> 16) & 0xFF] << 16)
        | (S[(c0 >> 8) & 0xFF] << 8) | S[c1 & 0xFF]
    ) ^ rk[2]
    o3 = (
        (S[c3 >> 24] << 24) | (S[(c0 >> 16) & 0xFF] << 16)
        | (S[(c1 >> 8) & 0xFF] << 8) | S[c2 & 0xFF]
    ) ^ rk[3]
    return (
        o0.to_bytes(4, "big") + o1.to_bytes(4, "big")
        + o2.to_bytes(4, "big") + o3.to_bytes(4, "big")
    )


def _decrypt_block(block: bytes, rks: list[bytes]) -> bytes:
    nr = len(rks) - 1
    s = bytearray(a ^ b for a, b in zip(block, rks[nr]))
    for rnd in range(nr - 1, 0, -1):
        # InvShiftRows + InvSubBytes
        t = bytearray(16)
        for c in range(4):
            for r in range(4):
                t[4 * c + r] = _INV_SBOX[s[4 * ((c - r) % 4) + r]]
        # AddRoundKey + InvMixColumns
        rk = rks[rnd]
        for c in range(4):
            a0 = t[4 * c + 0] ^ rk[4 * c + 0]
            a1 = t[4 * c + 1] ^ rk[4 * c + 1]
            a2 = t[4 * c + 2] ^ rk[4 * c + 2]
            a3 = t[4 * c + 3] ^ rk[4 * c + 3]
            s[4 * c + 0] = _M14[a0] ^ _M11[a1] ^ _M13[a2] ^ _M9[a3]
            s[4 * c + 1] = _M9[a0] ^ _M14[a1] ^ _M11[a2] ^ _M13[a3]
            s[4 * c + 2] = _M13[a0] ^ _M9[a1] ^ _M14[a2] ^ _M11[a3]
            s[4 * c + 3] = _M11[a0] ^ _M13[a1] ^ _M9[a2] ^ _M14[a3]
    out = bytearray(16)
    rk = rks[0]
    for c in range(4):
        for r in range(4):
            out[4 * c + r] = _INV_SBOX[s[4 * ((c - r) % 4) + r]] ^ rk[4 * c + r]
    return bytes(out)


def encrypt_block(block: bytes, key: bytes) -> bytes:
    """Single-block ECB encrypt (used by the R6 'hardened hash')."""
    return _encrypt_block(block, _expand_key(key))


def cbc_encrypt(data: bytes, key: bytes, iv: bytes, pad: bool = True) -> bytes:
    """AES-CBC encrypt. With *pad*, PKCS#7 padding is applied (PDF
    §7.6.2 uses the 1-16-byte block-cipher padding). IV is NOT
    prepended — PDF prepends it at the stream layer."""
    rkw = _round_key_words(_expand_key(key))
    if pad:
        n = 16 - (len(data) % 16)
        data = data + bytes([n]) * n
    elif len(data) % 16:
        raise ValueError("unpadded CBC input must be block-aligned")
    out = bytearray()
    prev = int.from_bytes(iv, "big")
    for i in range(0, len(data), 16):
        block = (int.from_bytes(data[i : i + 16], "big") ^ prev).to_bytes(
            16, "big"
        )
        enc = _encrypt_block_words(block, rkw)
        out += enc
        prev = int.from_bytes(enc, "big")
    return bytes(out)


def cbc_decrypt(data: bytes, key: bytes, iv: bytes, unpad: bool = True) -> bytes:
    """AES-CBC decrypt; with *unpad*, strip PKCS#7 padding leniently
    (a malformed final block raises ValueError → the kernel's caught
    taxonomy)."""
    if len(data) % 16:
        raise ValueError("AES-CBC ciphertext not block-aligned")
    rks = _expand_key(key)
    out = bytearray()
    prev = iv
    for i in range(0, len(data), 16):
        block = data[i : i + 16]
        out += bytes(a ^ b for a, b in zip(_decrypt_block(block, rks), prev))
        prev = block
    if unpad:
        if not out:
            return b""
        n = out[-1]
        if not 1 <= n <= 16 or len(out) < n:
            raise ValueError("bad AES-CBC padding")
        del out[-n:]
    return bytes(out)
