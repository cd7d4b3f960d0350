"""PDF object lexer/parser (ISO 32000-1 §7.3) — pure Python, zero deps.

Parses the eight COS object types (null, boolean, numeric, string, name,
array, dictionary, stream) plus indirect references from raw bytes.

The reference delegates all of this to ``pikepdf.open`` (see
/root/reference/pdf_parser/api.py:43); we reimplement it from the public
spec so the whole extraction path runs inside a Python worker with no
native extensions.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

WHITESPACE = b"\x00\t\n\x0c\r "
DELIMITERS = b"()<>[]{}/%"

# C-speed scanners for the three hottest byte loops (profiled at ~25%
# of extract_pdf): plain-whitespace runs, comment bodies, and regular
# tokens (everything up to ws/delimiter). Semantics identical to the
# per-byte loops they replace.
_WS_RE = re.compile(rb"[\x00\t\n\x0c\r ]+")
_COMMENT_RE = re.compile(rb"[^\r\n]*")
_TOKEN_RE = re.compile(rb"[^\x00\t\n\x0c\r ()<>\[\]{}/%]*")
_STRING_ESC = {0x6E: 0x0A, 0x72: 0x0D, 0x74: 0x09, 0x62: 0x08, 0x66: 0x0C}
_STR_PLAIN_RE = re.compile(rb"[^\\()]+")
# indirect reference "num gen R" in one C-level match (the trailing
# lookahead pins R at a token boundary) — replaces a three-token
# lookahead-and-rewind dance on every integer parsed
# inter-token separator: whitespace runs and/or %-comments (a comment
# is legal anywhere whitespace is — _skip_ws eats both, so the C-level
# multi-token matchers must too)
_SEP = rb"(?:[\x00\t\n\x0c\r ]++|%[^\r\n]*+)++"  # possessive: see below
_REF_RE = re.compile(
    rb"(\d++)" + _SEP + rb"(\d++)" + _SEP + rb"R"
    rb"(?![^\x00\t\n\x0c\r ()<>\[\]{}/%])"
)
# one-match dict entry "/Key value" for the four scalar value shapes
# that cover almost every entry in real object dicts (ref, number,
# name, bool/null) — replaces ~8 Python-level calls per entry with a
# single C-level match. Alternation order matters: the ref shape must
# win over a bare number. Every alternative ends at an exact token
# boundary (trailing lookahead = not-a-regular-char), and a name
# containing '#' fails the boundary lookahead so hex-escaped names
# fall back to the per-byte parser.
_TOKB = rb"(?![^\x00\t\n\x0c\r ()<>\[\]{}/%])"  # token-boundary lookahead
# All quantifiers over ws-runs, comments, and digit-runs are POSSESSIVE
# (++/*+, Python 3.11). The earlier greedy forms — (?:WS+|%…)* and
# (\d+\.?\d*) repeated under a star — were catastrophically
# backtracking: a mutated dict with a long whitespace run (or a long
# numeric array with its closing ] corrupted) made a failing match
# exponential (~10s at 28 ws bytes, measured), pinning an executor
# core on one malformed crawl row. Possessiveness is semantically free
# here: ws/comments can never be re-split into part of a token, and a
# digit run never legally splits across two numbers, so no valid parse
# is lost — failing matches just fail in O(n).
_DICT_ENTRY_RE = re.compile(
    rb"(?:[\x00\t\n\x0c\r ]++|%[^\r\n]*+)*+"  # leading ws folded in
    rb"/([^\x00\t\n\x0c\r ()<>\[\]{}/%#]*+)" + _TOKB +
    rb"(?:[\x00\t\n\x0c\r ]++|%[^\r\n]*+)*+(?:"
    rb"(\d++)" + _SEP + rb"(\d++)" + _SEP + rb"R" + _TOKB +
    rb"|([+-]?(?:\d++\.?\d*+|\.\d++))" + _TOKB +
    rb"|/([^\x00\t\n\x0c\r ()<>\[\]{}/%#]*+)" + _TOKB +
    rb"|(true|false|null)" + _TOKB +
    rb")"
)
# all-numeric array fast path (e.g. /MediaBox, /Widths, /Index, /W):
# numbers separated by PDF whitespace, bulk-split after one match.
# \x00 is deliberately NOT in the separator class — bytes.split()
# below doesn't split on it, so NUL-separated arrays take the
# per-object path instead of mis-parsing.
_NUMARRAY_RE = re.compile(
    rb"\[[\t\n\x0c\r ]*+"
    rb"(?:[+-]?(?:\d++\.?\d*+|\.\d++)(?:[\t\n\x0c\r ]++|(?=\])))*+\]"
)


@dataclass(frozen=True)
class Ref:
    """Indirect object reference ``num gen R``."""

    num: int
    gen: int


@dataclass
class Stream:
    """A stream object: its dictionary plus raw (still-encoded) bytes."""

    dict: dict
    raw: bytes


class Name(str):
    """A PDF name object (``/Foo``). Subclass of str, value excludes the slash."""

    __slots__ = ()

    def __repr__(self) -> str:  # pragma: no cover - debug aid
        return f"/{str(self)}"


class PdfLexer:
    """Single-pass recursive-descent parser over a bytes buffer."""

    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.pos = pos

    # ------------------------------------------------------------------ utils

    def _skip_ws(self) -> None:
        # byte loop beats a regex here: runs are almost always 0-2
        # chars, so the match-object overhead dominates any C-side win
        data, n = self.data, len(self.data)
        pos = self.pos
        while True:
            while pos < n and data[pos] in WHITESPACE:
                pos += 1
            if pos < n and data[pos] == 0x25:  # '%' comment runs to EOL
                pos = _COMMENT_RE.match(data, pos).end()
            else:
                break
        self.pos = pos

    def _peek(self) -> int:
        return self.data[self.pos] if self.pos < len(self.data) else -1

    def _read_token(self) -> bytes:
        """Read a regular token (keyword / number) up to a delimiter or ws."""
        m = _TOKEN_RE.match(self.data, self.pos)
        self.pos = m.end()
        return m.group()

    # ---------------------------------------------------------------- objects

    def parse_object(self):
        self._skip_ws()
        c = self._peek()
        if c == -1:
            raise ValueError("unexpected EOF while parsing object")
        if c == 0x2F:  # '/'
            return self._parse_name()
        if c == 0x28:  # '('
            return self._parse_literal_string()
        if c == 0x3C:  # '<'
            if self.data[self.pos : self.pos + 2] == b"<<":
                return self._parse_dict_or_stream()
            return self._parse_hex_string()
        if c == 0x5B:  # '['
            return self._parse_array()
        if c == 0x5D:  # ']'
            raise ValueError("unexpected ']'")
        # number (possibly an indirect reference "n g R") or keyword
        if 0x30 <= c <= 0x39:  # digit: try the one-match ref fast path
            m = _REF_RE.match(self.data, self.pos)
            if m:
                self.pos = m.end()
                return Ref(int(m.group(1)), int(m.group(2)))
        tok = self._read_token()
        if tok == b"true":
            return True
        if tok == b"false":
            return False
        if tok == b"null":
            return None
        try:
            return float(tok) if b"." in tok else int(tok)
        except ValueError as exc:
            raise ValueError(f"bad token {tok!r} at {self.pos}") from exc

    def _parse_name(self) -> Name:
        assert self.data[self.pos] == 0x2F
        self.pos += 1
        # fast path: a name token never containing '#' needs no
        # per-byte escape walk ('#' is a regular char, so _TOKEN_RE
        # stops at exactly the same boundary the loop does)
        m = _TOKEN_RE.match(self.data, self.pos)
        tok = m.group()
        if b"#" not in tok:
            self.pos = m.end()
            return Name(tok.decode("latin1"))
        data, n = self.data, len(self.data)
        out = bytearray()
        pos = self.pos
        while pos < n:
            c = data[pos]
            if c in WHITESPACE or c in DELIMITERS:
                break
            if c == 0x23 and pos + 2 < n:  # '#' hex escape
                try:
                    out.append(int(data[pos + 1 : pos + 3], 16))
                    pos += 3
                    continue
                except ValueError:
                    pass
            out.append(c)
            pos += 1
        self.pos = pos
        return Name(out.decode("latin1"))

    def _parse_literal_string(self) -> bytes:
        assert self.data[self.pos] == 0x28
        self.pos += 1
        data, n = self.data, len(self.data)
        out = bytearray()
        depth = 1
        pos = self.pos
        while pos < n:
            m = _STR_PLAIN_RE.match(data, pos)
            if m:  # bulk-copy the run of plain chars (C-speed)
                out += m.group()
                pos = m.end()
                if pos >= n:
                    break
            c = data[pos]
            if c == 0x5C:  # backslash
                pos += 1
                if pos >= n:
                    break
                e = data[pos]
                esc = _STRING_ESC
                if e in esc:
                    out.append(esc[e])
                    pos += 1
                elif e in b"01234567":  # up to 3 octal digits
                    oct_digits = bytearray([e])
                    pos += 1
                    while pos < n and len(oct_digits) < 3 and data[pos] in b"01234567":
                        oct_digits.append(data[pos])
                        pos += 1
                    out.append(int(oct_digits, 8) & 0xFF)
                elif e in b"\r\n":  # line continuation
                    pos += 1
                    if e == 0x0D and pos < n and data[pos] == 0x0A:
                        pos += 1
                else:  # \( \) \\ and unknown escapes: literal char
                    out.append(e)
                    pos += 1
            elif c == 0x28:
                depth += 1
                out.append(c)
                pos += 1
            elif c == 0x29:
                depth -= 1
                if depth == 0:
                    pos += 1
                    break
                out.append(c)
                pos += 1
            else:
                out.append(c)
                pos += 1
        self.pos = pos
        return bytes(out)

    def _parse_hex_string(self) -> bytes:
        assert self.data[self.pos] == 0x3C
        self.pos += 1
        end = self.data.find(b">", self.pos)
        if end == -1:
            raise ValueError("unterminated hex string")
        hexchars = bytes(
            c for c in self.data[self.pos : end] if c not in WHITESPACE
        )
        self.pos = end + 1
        if len(hexchars) % 2:
            hexchars += b"0"
        return bytes.fromhex(hexchars.decode("ascii"))

    def _parse_array(self) -> list:
        assert self.data[self.pos] == 0x5B
        m = _NUMARRAY_RE.match(self.data, self.pos)
        if m:  # all-numeric array: one C match + bulk split
            self.pos = m.end()
            return [
                float(t) if b"." in t else int(t)
                for t in m.group()[1:-1].split()
            ]
        self.pos += 1
        out = []
        while True:
            self._skip_ws()
            if self._peek() == 0x5D:
                self.pos += 1
                return out
            if self._peek() == -1:
                raise ValueError("unterminated array")
            out.append(self.parse_object())

    def _parse_dict_or_stream(self):
        assert self.data[self.pos : self.pos + 2] == b"<<"
        self.pos += 2
        d: dict = {}
        data = self.data
        while True:
            m = _DICT_ENTRY_RE.match(data, self.pos)
            if m:  # scalar-valued entry: one C match, no recursion
                self.pos = m.end()
                g = m.group
                num = g(2)
                if num is not None:
                    value = Ref(int(num), int(g(3)))
                else:
                    num = g(4)
                    if num is not None:
                        value = float(num) if b"." in num else int(num)
                    else:
                        nm = g(5)
                        if nm is not None:
                            value = Name(nm.decode("latin1"))
                        else:
                            kw = g(6)
                            value = True if kw == b"true" else (
                                False if kw == b"false" else None
                            )
                d[g(1).decode("latin1")] = value
                continue
            self._skip_ws()
            if data[self.pos : self.pos + 2] == b">>":
                self.pos += 2
                break
            if self._peek() != 0x2F:
                raise ValueError(f"expected name key at {self.pos}")
            key = self._parse_name()
            value = self.parse_object()
            d[str(key)] = value
        # stream keyword?
        save = self.pos
        self._skip_ws()
        if self.data[self.pos : self.pos + 6] == b"stream":
            self.pos += 6
            # EOL after 'stream': CRLF or LF (spec §7.3.8.1)
            if self.data[self.pos : self.pos + 2] == b"\r\n":
                self.pos += 2
            elif self.pos < len(self.data) and self.data[self.pos] in b"\n\r":
                self.pos += 1
            length = d.get("Length")
            if isinstance(length, int):
                raw = self.data[self.pos : self.pos + length]
                endpos = self.pos + length
            else:
                # Length is an indirect ref (resolved later) or broken:
                # fall back to scanning for 'endstream'.
                endpos = self.data.find(b"endstream", self.pos)
                if endpos == -1:
                    raise ValueError("unterminated stream")
                raw = self.data[self.pos : endpos]
                # strip one trailing EOL that belongs to the marker
                if raw.endswith(b"\r\n"):
                    raw = raw[:-2]
                elif raw.endswith(b"\n") or raw.endswith(b"\r"):
                    raw = raw[:-1]
            self.pos = endpos
            self._skip_ws()
            if self.data[self.pos : self.pos + 9] == b"endstream":
                self.pos += 9
            return Stream(d, bytes(raw))
        self.pos = save
        return d


def parse_indirect_object(data: bytes, offset: int):
    """Parse ``num gen obj ... endobj`` at *offset*; returns (num, gen, obj)."""
    lex = PdfLexer(data, offset)
    lex._skip_ws()
    num = int(lex._read_token())
    lex._skip_ws()
    gen = int(lex._read_token())
    lex._skip_ws()
    kw = lex._read_token()
    if kw != b"obj":
        raise ValueError(f"expected 'obj' at offset {offset}, got {kw!r}")
    obj = lex.parse_object()
    return num, gen, obj
