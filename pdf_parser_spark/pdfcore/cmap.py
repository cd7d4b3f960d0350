"""ToUnicode CMap parsing / decoding / synthesis.

Output-semantics-identical to the reference implementation at
/root/reference/pdf_parser/core/cmap.py:4-165 (written fresh; the
reference is the behavioural spec, not the source). The quirks we
deliberately reproduce, each pinned by a golden test:

1. line-oriented scan: any line with three ``<hex>`` groups is treated
   as a bfrange triple, any line with two as a bfchar pair — regardless
   of begin/end section markers (cmap.py:15-38).
2. single-byte only: source codes > 0xFF are silently skipped
   (cmap.py:24-26,35-37); CID/2-byte codes are dropped.
3. the codespacerange line ``<00> <FF>`` in a synthesized CMap is itself
   matched by the bfchar rule, so every synthesized CMap also maps byte
   0x00 → U+00FF 'ÿ' (cmap.py:151 feeding cmap.py:30-38).
4. unmapped bytes decode to ``'?'`` (cmap.py:54).
5. synthesis covers printable ASCII 32..126 only, whatever the declared
   encoding — anything non-WinAnsi falls back to WinAnsi (cmap.py:119-142).

``parse_cmap`` returns an int-keyed dict plus a prebuilt 256-entry
translate table so decoding is a single C-level ``str.translate`` per
string (the reference loops per byte in Python — cmap.py:54).
"""

from __future__ import annotations

import re

_RANGE_RE = re.compile(
    r"<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>"
)
_CHAR_RE = re.compile(r"<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>")


class CMap:
    """Byte-code → unicode-char mapping with a fast translate table.

    ``multi`` (CID extension, SURVEY §2.2 T7 north-star promise) holds
    multi-byte code → string entries; ``spaces`` holds the declared
    codespace ranges as (n_bytes, lo, hi). Both are only populated when
    the CMap was parsed with ``multibyte=True`` and are empty in
    reference-compatible mode, keeping the fast single-byte translate
    path."""

    __slots__ = ("mapping", "multi", "spaces", "_table")

    def __init__(
        self,
        mapping: dict[int, str],
        multi: dict[bytes, str] | None = None,
        spaces: list[tuple[int, int, int]] | None = None,
    ):
        self.mapping = mapping
        self.multi = multi or {}
        self.spaces = spaces or []
        # translate table over latin1-decoded bytes: ord(0..255) → char
        self._table = {i: mapping.get(i, "?") for i in range(256)}

    def decode(self, data: bytes) -> str:
        """Per-byte decode with '?' fallback (reference cmap.py:43-54).

        With multi-byte entries present the walk is codespace-driven:
        the declared range containing the next code determines its byte
        width (ISO 32000-1 §9.7.6.2 / Adobe CMap spec), so mixed 1&2
        (and wider) codespaces decode unambiguously; an in-codespace
        but unmapped code yields ONE '?' (one code = one char). Without
        declared codespaces the walk is greedy 2-byte-then-1-byte.
        Reference-identical when ``multi`` is empty (always, unless
        parsed with multibyte=True)."""
        if not self.multi:
            return data.decode("latin1").translate(self._table)
        out: list[str] = []
        i, n = 0, len(data)
        spaces = self.spaces
        while i < n:
            width = 0
            for nb, lo, hi in spaces:
                if i + nb <= n and lo <= int.from_bytes(data[i : i + nb], "big") <= hi:
                    width = nb
                    break
            if width == 1:
                out.append(self._table[data[i]])
                i += 1
                continue
            if width > 1:
                ch = self.multi.get(data[i : i + width])
                out.append(ch if ch is not None else "?")
                i += width
                continue
            # outside every declared codespace (or none declared):
            # greedy 2-byte attempt, then the single-byte table
            ch = self.multi.get(data[i : i + 2])
            if ch is not None:
                out.append(ch)
                i += 2
                continue
            out.append(self._table[data[i]])
            i += 1
        return "".join(out)

    def reverse(self) -> dict[str, int]:
        """Unicode char → byte code (last writer wins, like dict inversion
        in the reference's encode path, cmap.py:71)."""
        return {v: k for k, v in self.mapping.items()}


def parse_cmap(cmap_str: str, multibyte: bool = False) -> CMap:
    """Parse a ToUnicode CMap string (reference semantics, see module doc).

    ``multibyte=False`` (default) is reference-identical: codes > 0xFF
    are silently skipped, the line-oriented quirks apply (including the
    codespacerange ghost entry). ``multibyte=True`` is the CID
    extension promised by SURVEY §2.2 T7: the parse becomes
    codespace-section-aware (codespacerange lines no longer produce
    ghost bfchar entries) and 2-byte source codes populate
    ``CMap.multi`` so CJK text decodes instead of '?????'. The flag is
    OFF for all goldens/oracles.

    Memoized on (source string, flag): fonts repeat massively across a
    corpus (every WinAnsi-synthesized CMap is literally identical, and
    real documents share embedded-font ToUnicode streams), and the
    returned CMap is read-only by construction, so sharing one instance
    is safe. Profiling showed re-parsing cost ~30% of per-document
    kernel time before this cache.
    """
    return _parse_cmap_cached(cmap_str, multibyte)


from functools import lru_cache  # noqa: E402  (kept beside its sole user)


_ARRAY_RANGE_RE = re.compile(
    r"<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>\s*\[((?:\s*<[0-9A-Fa-f]+>)+)\s*\]"
)
_HEX_TOKEN_RE = re.compile(r"<([0-9A-Fa-f]+)>")


def _dst_str(hexdst: str) -> str:
    """bfchar/bfrange destination hex → string (CID extension form):
    ≤4 digits is one BMP scalar; longer is UTF-16BE (ligatures,
    surrogate pairs — e.g. <00660069> → 'fi', <D835DC00> → U+1D400)."""
    if len(hexdst) <= 4:
        return chr(int(hexdst, 16))
    raw = bytes.fromhex(hexdst if len(hexdst) % 2 == 0 else "0" + hexdst)
    return raw.decode("utf-16-be", errors="replace")


def _dst_incr(dst: str, offset: int) -> str:
    """bfrange destination increment: the LAST code unit advances
    (Adobe CMap spec §bfrange); single-char destinations are the
    common case."""
    if not dst:
        return dst
    return dst[:-1] + chr(ord(dst[-1]) + offset)


@lru_cache(maxsize=4096)
def _parse_cmap_cached(cmap_str: str, multibyte: bool = False) -> CMap:
    mapping: dict[int, str] = {}
    multi: dict[bytes, str] = {}
    spaces: list[tuple[int, int, int]] = []
    cs_tokens: list[str] = []
    in_codespace = False

    def _put(code: int, nbytes: int, dst: str) -> None:
        if nbytes == 1:
            if code <= 0xFF:
                mapping[code] = dst
        elif code < (1 << (8 * nbytes)):
            multi[code.to_bytes(nbytes, "big")] = dst
        # else: malformed entry (odd-digit hex like <ABC> makes the
        # declared width smaller than the value) — skip, don't raise

    for line in cmap_str.splitlines():
        if multibyte:
            # section-aware: codespacerange bounds become decode-width
            # declarations, not mappings; bounds may be one-per-line
            if "begincodespacerange" in line:
                in_codespace = True
                cs_tokens = []
                continue
            if "endcodespacerange" in line:
                in_codespace = False
                for lo_hex, hi_hex in zip(cs_tokens[0::2], cs_tokens[1::2]):
                    if len(lo_hex) == len(hi_hex):
                        spaces.append(
                            (
                                len(lo_hex) // 2,
                                int(lo_hex, 16),
                                int(hi_hex, 16),
                            )
                        )
                continue
            if in_codespace:
                cs_tokens.extend(_HEX_TOKEN_RE.findall(line))
                continue
            # bfrange array-destination form: <a> <b> [<x> <y> …] — the
            # form real CJK ToUnicode streams use (must be checked
            # before the scalar triple, which would otherwise eat the
            # first array element as a scalar destination)
            m = _ARRAY_RANGE_RE.search(line)
            if m:
                lo = int(m.group(1), 16)
                hi = int(m.group(2), 16)
                nbytes = max(1, len(m.group(1)) // 2)
                dsts = _HEX_TOKEN_RE.findall(m.group(3))
                for j, code in enumerate(range(lo, hi + 1)):
                    if j >= len(dsts):
                        break
                    _put(code, nbytes, _dst_str(dsts[j]))
                continue
        m = _RANGE_RE.search(line)
        if m:
            lo = int(m.group(1), 16)
            hi = int(m.group(2), 16)
            # in multibyte mode the code width is declared by the hex
            # digit count (<0041> is the 2-byte code 00 41), not the
            # numeric magnitude
            wide = multibyte and len(m.group(1)) > 2
            if multibyte:
                nbytes = max(1, len(m.group(1)) // 2) if wide else 1
                base = _dst_str(m.group(3))
                for code in range(lo, hi + 1):
                    _put(code, nbytes, _dst_incr(base, code - lo))
                continue
            dst = int(m.group(3), 16)
            for code in range(lo, hi + 1):
                if code > 0xFF:
                    continue
                mapping[code] = chr(dst + (code - lo))
            continue
        m = _CHAR_RE.search(line)
        if m:
            code = int(m.group(1), 16)
            if multibyte:
                nbytes = max(1, len(m.group(1)) // 2)
                _put(code, nbytes, _dst_str(m.group(2)))
                continue
            if code > 0xFF:
                continue
            mapping[code] = chr(int(m.group(2), 16))
    if not multibyte:
        return CMap(mapping, None)
    return CMap(mapping, multi, spaces)


def decode_pdf_string(data: bytes, cmap: CMap) -> str:
    return cmap.decode(data)


_WINANSI_PRINTABLE = {code: chr(code) for code in range(32, 127)}


def synthesize_tounicode_cmap(encoding_name: str = "/WinAnsiEncoding") -> str:
    """Build the fallback ToUnicode CMap string for a font that lacks one.

    Matches the reference's output (cmap.py:107-165): printable-ASCII
    bfchar entries only; unknown encodings fall back to WinAnsi. The
    emitted codespacerange line is intentionally in the quirky
    ``<00> <FF>`` single-line form so that :func:`parse_cmap` picks up
    the 0x00→'ÿ' ghost entry exactly as the reference does.
    """
    # every declared encoding currently resolves to the same printable set,
    # mirroring the reference's single-entry standard_encodings table
    table = _WINANSI_PRINTABLE
    lines = [
        "/CIDInit /ProcSet findresource begin",
        "12 dict begin",
        "begincmap",
        "/CIDSystemInfo << /Registry (Adobe) /Ordering (UCS) /Supplement 0 >> def",
        "/CMapName /Adobe-Identity-UCS def",
        "/CMapType 2 def",
        "1 begincodespacerange",
        "<00> <FF>",
        "endcodespacerange",
        f"{len(table)} beginbfchar",
    ]
    for code, ch in table.items():
        lines.append(f"<{code:02X}> <{ord(ch):04X}>")
    lines.append("endbfchar")
    lines.append("endcmap")
    lines.append("CMapName currentdict /CMap defineresource pop")
    lines.append("end")
    lines.append("end")
    return "\n".join(lines)
