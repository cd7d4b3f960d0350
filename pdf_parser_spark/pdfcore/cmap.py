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
    2-byte code → char entries; it is only populated when the CMap was
    parsed with ``multibyte=True`` and is empty in reference-compatible
    mode, keeping the fast single-byte translate path."""

    __slots__ = ("mapping", "multi", "_table")

    def __init__(self, mapping: dict[int, str], multi: dict[bytes, str] | None = None):
        self.mapping = mapping
        self.multi = multi or {}
        # translate table over latin1-decoded bytes: ord(0..255) → char
        self._table = {i: mapping.get(i, "?") for i in range(256)}

    def decode(self, data: bytes) -> str:
        """Per-byte decode with '?' fallback (reference cmap.py:43-54).

        With 2-byte entries present, a greedy walk consumes a 2-byte
        code wherever one matches and falls back to the single-byte
        table otherwise — reference-identical when ``multi`` is empty
        (always, unless parsed with multibyte=True)."""
        if not self.multi:
            return data.decode("latin1").translate(self._table)
        out: list[str] = []
        i, n = 0, len(data)
        while i < n:
            pair = data[i : i + 2]
            ch = self.multi.get(pair)
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


@lru_cache(maxsize=4096)
def _parse_cmap_cached(cmap_str: str, multibyte: bool = False) -> CMap:
    mapping: dict[int, str] = {}
    multi: dict[bytes, str] = {}
    in_codespace = False
    for line in cmap_str.splitlines():
        if multibyte:
            # section-aware: codespacerange bounds are not mappings
            if "begincodespacerange" in line:
                in_codespace = True
                continue
            if "endcodespacerange" in line:
                in_codespace = False
                continue
            if in_codespace:
                continue
        m = _RANGE_RE.search(line)
        if m:
            lo = int(m.group(1), 16)
            hi = int(m.group(2), 16)
            dst = int(m.group(3), 16)
            # in multibyte mode the code width is declared by the hex
            # digit count (<0041> is the 2-byte code 00 41), not the
            # numeric magnitude; only 2-byte codes are supported
            wide = multibyte and len(m.group(1)) == 4
            for code in range(lo, hi + 1):
                if wide:
                    if code <= 0xFFFF:
                        multi[code.to_bytes(2, "big")] = chr(dst + (code - lo))
                    continue
                if code > 0xFF:
                    continue
                mapping[code] = chr(dst + (code - lo))
            continue
        m = _CHAR_RE.search(line)
        if m:
            code = int(m.group(1), 16)
            if multibyte and len(m.group(1)) == 4:
                if code <= 0xFFFF:
                    multi[code.to_bytes(2, "big")] = chr(int(m.group(2), 16))
                continue
            if code > 0xFF:
                continue
            mapping[code] = chr(int(m.group(2), 16))
    return CMap(mapping, multi if multibyte else None)


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
