"""Content-stream tokenization: reference-identical text pass + span pass.

Two deliberately separate layers:

**Text pass** (:func:`extract_text_items`) — byte-identical to the
reference's regex walk (/root/reference/pdf_parser/api.py:90-128). Its
quirks are the contract (each pinned by a golden test):

- one regex alternation over the latin1-decoded stream matching
  ``(..)Tj/TJ``, ``[..]TJ`` and ``/Name <int> Tf`` (api.py:94-96);
  fractional font sizes do NOT match, so ``/F1 12.5 Tf`` never switches
  the current font;
- text ops are dropped unless the current font has a CMap (api.py:104);
- TJ arrays are flattened by ``str.split()`` keeping only whitespace-
  delimited tokens that start '(' and end ')' — string segments with
  internal spaces are garbled, and if nothing survives the ORIGINAL raw
  array text is decoded instead (api.py:109-118);
- escape handling replaces exactly ``\\(`` ``\\)`` ``\\\\`` in that
  order (api.py:121), then latin1-encodes;
- decoded text is ``.strip()``-ed and dropped if empty (api.py:127).

**Span pass** (:func:`extract_spans`) — a real postfix operator
interpreter (ISO 32000-1 §9.4) recovering the (text, x, y, font, size)
metadata the reference only approximates with constants
(/root/reference/pdf_gui.py:845-854: font_size=12, char_width=8). We
track Tf (with float sizes), the full Tm matrix (translation + scale),
Td/TD, TL, T*, BT/ET, Tc/Tw/Tz spacing state and per-glyph advances
from /Widths, superseding the GUI's estimate while leaving the text
pass untouched.
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from itertools import accumulate as _accumulate

from .cmap import CMap

# --- text pass (reference-identical) ---------------------------------------

_COMBINED_RE = re.compile(
    r"(?:\(((?:[^()\\]|\\.)*)\)|\[((?:[^][\\()]|\\.)*)\])\s*T[Jj]"
    r"|/[A-Za-z0-9]+\s+\d+\s+Tf"
)
_TEXT_RE = re.compile(r"(?:\(((?:[^()\\]|\\.)*)\)|\[((?:[^][\\()]|\\.)*)\])\s*T[Jj]")
_FONT_RE = re.compile(r"/([A-Za-z0-9]+)\s+\d+\s+Tf")
# literal-string escapes (§7.3.4.2) + a bulk matcher for plain runs —
# hoisted out of the per-byte loop (hot path: every Tj operand)
_STR_ESC = {0x6E: 0x0A, 0x72: 0x0D, 0x74: 0x09, 0x62: 0x08, 0x66: 0x0C}
_STR_PLAIN_RE = re.compile(rb"[^\\()]+")


def flatten_tj_array(inner_text: str) -> str:
    """Reference TJ-flatten quirk (api.py:109-118): whitespace-split, keep
    '('..')' tokens, concatenate insides; empty result keeps the raw text."""
    processed = ""
    for part in inner_text.split():
        if part.startswith("(") and part.endswith(")"):
            processed += part[1:-1]
    return processed if processed else inner_text


def normalize_escapes(inner_text: str) -> bytes:
    """Reference parse-path escape rule (api.py:121-122). NOTE the replace
    order is semantic: ``\\(`` and ``\\)`` first, then ``\\\\``."""
    return (
        inner_text.replace("\\(", "(").replace("\\)", ")").replace("\\\\", "\\")
    ).encode("latin1")


def extract_text_items(
    content: bytes, font_cmaps: dict[str, CMap]
) -> list[tuple[str, str, bytes]]:
    """Walk a decoded content stream; returns [(font, text, encoded_bytes)].

    Output-identical to the reference's decode loop (api.py:86-128).
    """
    content_str = content.decode("latin1", errors="replace")
    items: list[tuple[str, str, bytes]] = []
    current_font: str | None = None
    for m in _COMBINED_RE.finditer(content_str):
        tok = m.group(0)
        fm = _FONT_RE.search(tok)
        if fm:
            current_font = "/" + fm.group(1)
            continue
        tm = _TEXT_RE.search(tok)
        if not tm or current_font not in font_cmaps:
            continue
        is_tj_array = tok.strip().endswith("TJ")
        inner = tm.group(2) if is_tj_array else tm.group(1)
        if is_tj_array:
            inner = flatten_tj_array(inner)
        try:
            encoded = normalize_escapes(inner)
        except (UnicodeEncodeError, AttributeError):
            continue
        decoded = font_cmaps[current_font].decode(encoded)
        stripped = decoded.strip()
        if stripped:
            items.append((current_font, stripped, encoded))
    return items


# --- span pass (real operator interpreter) ----------------------------------

_NUM_RE = re.compile(rb"[+-]?(?:\d++\.?\d*+|\.\d++)")

# Fused command matcher: one anchored C-level match per *command* for
# the alphabet that covers ordinary text-only content streams —
# Tm(6), Td/TD(2), Tj(simple literal string), Tf, TL/Tc/Tw/Tz, BT/ET/T*.
# Anything outside it (hex strings, TJ arrays, ' / ", nested-paren
# strings, graphics operators, malformed operand stacks) makes the
# match FAIL, and extract_spans falls back to the general token
# interpreter for the whole stream — the fast path can only produce
# output identical to the interpreter or no output at all (pinned by
# test_tokenizer's fast-vs-interpreter differential). re.S so "\<LF>"
# line continuations stay inside the string alternative.
_SP = rb"[\x00\t\n\x0c\r ]"
# digit runs POSSESSIVE (\d++): the greedy form made a FAILING match
# backtrack through every split of every number — ~k^6 tail retries on
# the six-operand Tm alternative (0.54s per attempt at 12-digit
# operands, measured), so one coordinate-heavy stream rejected by the
# fast path could burn minutes before falling back. A digit run never
# legally splits across operands (the separator class has no digits),
# so possessiveness loses no valid match.
_NP = rb"([+-]?(?:\d++\.?\d*+|\.\d++))"
_KB = rb"(?![^\x00\t\n\x0c\r ()<>\[\]{}/%])"  # keyword boundary
_FAST_CMD_RE = re.compile(
    rb"[\x00\t\n\x0c\r ]*(?:"
    + _NP + _SP + rb"+" + _NP + _SP + rb"+" + _NP + _SP + rb"+"
    + _NP + _SP + rb"+" + _NP + _SP + rb"+" + _NP + _SP + rb"*Tm" + _KB
    + rb"|" + _NP + _SP + rb"+" + _NP + _SP + rb"*(Td|TD)" + _KB
    + rb"|\(((?:[^()\\]|\\.)*)\)" + _SP + rb"*Tj" + _KB
    + rb"|/([^\x00\t\n\x0c\r ()<>\[\]{}/%]*)" + _SP + rb"+" + _NP
    + _SP + rb"*Tf" + _KB
    + rb"|" + _NP + _SP + rb"*(TL|Tc|Tw|Tz)" + _KB
    + rb"|(BT|ET|T\*)" + _KB
    + rb")",
    re.S,
)


def _unescape_literal(seg: bytes) -> bytes:
    """Escape-decode the inside of a literal string with no unescaped
    parens — byte-identical to _ContentLexer._string for such input."""
    out = bytearray()
    pos, n = 0, len(seg)
    while pos < n:
        m = _STR_PLAIN_RE.match(seg, pos)
        if m:
            out += m.group()
            pos = m.end()
            if pos >= n:
                break
        # seg contains no bare parens, so this byte is a backslash
        pos += 1
        if pos >= n:
            break
        e = seg[pos]
        if e in _STR_ESC:
            out.append(_STR_ESC[e])
            pos += 1
        elif e in b"01234567":
            digits = bytearray([e])
            pos += 1
            while pos < n and len(digits) < 3 and seg[pos] in b"01234567":
                digits.append(seg[pos])
                pos += 1
            out.append(int(digits, 8) & 0xFF)
        elif e in b"\r\n":
            pos += 1
            if e == 0x0D and pos < n and seg[pos] == 0x0A:
                pos += 1
        else:
            out.append(e)
            pos += 1
    return bytes(out)

WHITESPACE = b"\x00\t\n\x0c\r "
DELIMS = b"()<>[]{}/%"


@dataclass
class Span:
    seq: int
    text: str
    x: float
    y: float
    font: str
    size: float
    width: float
    char_xs: list[float]


class _ContentLexer:
    """Token stream over raw content bytes: numbers, names, strings,
    hex strings, arrays (as lists of strings/numbers), operators."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0

    def tokens(self):
        data, n = self.data, len(self.data)
        while self.pos < n:
            c = data[self.pos]
            if c in WHITESPACE:
                self.pos += 1
                continue
            if c == 0x25:  # comment
                nl = data.find(b"\n", self.pos)
                self.pos = n if nl == -1 else nl + 1
                continue
            if c == 0x28:
                yield ("str", self._string())
                continue
            if c == 0x3C:
                if data[self.pos : self.pos + 2] == b"<<":
                    self.pos += 2
                    yield ("op", "<<")
                    continue
                yield ("str", self._hex_string())
                continue
            if c == 0x3E and data[self.pos : self.pos + 2] == b">>":
                self.pos += 2
                yield ("op", ">>")
                continue
            if c == 0x2F:
                yield ("name", self._name())
                continue
            if c == 0x5B:
                self.pos += 1
                yield ("op", "[")
                continue
            if c == 0x5D:
                self.pos += 1
                yield ("op", "]")
                continue
            if c == 0x7B or c == 0x7D:
                self.pos += 1
                continue
            # per-byte loop beats a regex here: tokens are 1-4 chars,
            # so match-object overhead dominates any C-side win
            start = self.pos
            while (
                self.pos < n
                and data[self.pos] not in WHITESPACE
                and data[self.pos] not in DELIMS
            ):
                self.pos += 1
            tok = data[start : self.pos]
            if not tok:
                # stray delimiter byte (unbalanced ')' / '>' in a
                # corrupt or still-compressed stream): skip it — the
                # loop must never yield without advancing
                self.pos += 1
                continue
            if _NUM_RE.fullmatch(tok):
                yield ("num", float(tok))
            else:
                yield ("kw", tok.decode("latin1"))

    def _string(self) -> bytes:
        data, n = self.data, len(self.data)
        self.pos += 1
        out = bytearray()
        depth = 1
        while self.pos < n:
            m = _STR_PLAIN_RE.match(data, self.pos)
            if m:  # bulk-copy the run of plain chars (C-speed)
                out += m.group()
                self.pos = m.end()
                if self.pos >= n:
                    break
            c = data[self.pos]
            if c == 0x5C:
                self.pos += 1
                if self.pos >= n:
                    break
                e = data[self.pos]
                esc = _STR_ESC
                if e in esc:
                    out.append(esc[e])
                    self.pos += 1
                elif e in b"01234567":
                    digits = bytearray([e])
                    self.pos += 1
                    while (
                        self.pos < n
                        and len(digits) < 3
                        and data[self.pos] in b"01234567"
                    ):
                        digits.append(data[self.pos])
                        self.pos += 1
                    out.append(int(digits, 8) & 0xFF)
                elif e in b"\r\n":
                    self.pos += 1
                    if e == 0x0D and self.pos < n and data[self.pos] == 0x0A:
                        self.pos += 1
                else:
                    out.append(e)
                    self.pos += 1
            elif c == 0x28:
                depth += 1
                out.append(c)
                self.pos += 1
            elif c == 0x29:
                depth -= 1
                self.pos += 1
                if depth == 0:
                    break
                out.append(c)
            else:
                out.append(c)
                self.pos += 1
        return bytes(out)

    def _hex_string(self) -> bytes:
        end = self.data.find(b">", self.pos)
        if end == -1:
            end = len(self.data)
        raw = bytes(
            c for c in self.data[self.pos + 1 : end] if c not in WHITESPACE
        )
        self.pos = end + 1
        if len(raw) % 2:
            raw += b"0"
        try:
            return bytes.fromhex(raw.decode("ascii"))
        except ValueError:
            return b""

    def _name(self) -> str:
        data, n = self.data, len(self.data)
        self.pos += 1
        start = self.pos
        while (
            self.pos < n
            and data[self.pos] not in WHITESPACE
            and data[self.pos] not in DELIMS
        ):
            self.pos += 1
        return "/" + data[start : self.pos].decode("latin1")


class FontMetrics:
    """Glyph advance widths (1000-unit glyph space) for one font resource."""

    __slots__ = ("first_char", "widths", "default_width", "_table")

    def __init__(self, first_char=0, widths=None, default_width=500.0):
        self.first_char = int(first_char)
        self.widths = [float(w) for w in (widths or [])]
        self.default_width = float(default_width)
        self._table = None

    def advance(self, code: int) -> float:
        idx = code - self.first_char
        if 0 <= idx < len(self.widths):
            return self.widths[idx]
        return self.default_width

    def table(self) -> list[float]:
        """256-entry byte→advance lookup (built lazily, cached): one
        list index replaces an advance() call per glyph in the span
        hot loop; table[c] == advance(c) exactly."""
        t = self._table
        if t is None:
            adv = self.advance
            t = self._table = [adv(c) for c in range(256)]
        return t


# advance table for text drawn with no /Widths entry: 500 glyph units
_DEFAULT_WTAB = [500.0] * 256


def extract_spans(
    content: bytes,
    font_cmaps: dict[str, CMap],
    font_metrics: dict[str, FontMetrics] | None = None,
    page_no: int = 0,
    use_fast: bool = True,
) -> list[Span]:
    """Interpret text-positioning operators and emit one Span per text run.

    Implements the ISO 32000-1 §9.4 text state machine: BT/ET, Tf, Tm
    (full 6-element matrix — translation AND scale), Td, TD, TL, T*,
    Tc (char spacing), Tw (word spacing, applied on byte 0x20), Tz
    (horizontal scaling %), Tj, ', " (incl. its aw/ac operands), TJ
    (kerning-aware). Glyph advances come from /Widths via
    *font_metrics* (default 500 units when unknown), replacing the
    reference's hard-coded 8-pt char width
    (/root/reference/pdf_gui.py:848-853). Per §9.4.4 the glyph
    displacement is tx = ((w0/1000)·Tfs + Tc + Tw)·(Tz/100), mapped to
    device space through the text matrix — so x/width respect Tm scale;
    rotation (b/c ≠ 0) tracks the x' component only, y stays the line
    origin. Reported ``size`` is Tfs (the Tf operand), not the
    device-space effective size.
    """
    metrics = font_metrics or {}
    spans: list[Span] = []
    stack: list = []
    font: str | None = None
    size = 0.0
    leading = 0.0
    char_sp = 0.0  # Tc
    word_sp = 0.0  # Tw
    hscale = 100.0  # Tz
    tm = [1.0, 0.0, 0.0, 1.0, 0.0, 0.0]  # text matrix [a b c d e f]
    tlm = list(tm)  # line matrix
    seq = 0

    def translate_line(tx: float, ty: float) -> None:
        # Tlm = [[1,0,0],[0,1,0],[tx,ty,1]] × Tlm ; Tm = Tlm
        nonlocal tm, tlm
        tlm = [
            tlm[0],
            tlm[1],
            tlm[2],
            tlm[3],
            tx * tlm[0] + ty * tlm[2] + tlm[4],
            tx * tlm[1] + ty * tlm[3] + tlm[5],
        ]
        tm = list(tlm)

    def emit(raw: bytes, kern_groups: list | None = None):
        nonlocal seq
        if font is None:
            return
        cmap = font_cmaps.get(font)
        fm = metrics.get(font)
        scale = size / 1000.0
        zh = hscale / 100.0
        x0 = tm[4]
        y0 = tm[5]
        char_xs: list[float] = []
        text_parts: list[str] = []
        groups = kern_groups if kern_groups is not None else [raw]
        # hot loop: localize tm cells and pre-resolve the per-byte
        # advance into a 256-entry table — float ops and their ORDER
        # are identical to the per-byte advance() form (span x/width
        # feed value-hashed oracles, so reassociation is not allowed)
        tm0, tm1, tmx, tmy = tm[0], tm[1], tm[4], tm[5]
        wtab = fm.table() if fm else _DEFAULT_WTAB
        push_x = char_xs.append
        if tm1 == 0.0:
            # unrotated text (the overwhelming case): tmy never moves,
            # so per-glyph deltas fold into one comprehension and a
            # C-level prefix sum; each delta keeps the exact op order
            # ((w*scale + Tc + Tw?)*zh)*tm0 of the general loop below
            for g in groups:
                if isinstance(g, float):  # TJ kerning: move by -g/1000 em
                    tmx += (-g * scale * zh) * tm0
                    continue
                xs = list(
                    _accumulate(
                        [
                            (
                                (
                                    wtab[b] * scale
                                    + char_sp
                                    + (word_sp if b == 0x20 else 0.0)
                                )
                                * zh
                            )
                            * tm0
                            for b in g
                        ],
                        initial=tmx,
                    )
                )
                tmx = xs.pop()
                char_xs.extend(xs)
                text_parts.append(cmap.decode(g) if cmap else g.decode("latin1"))
        else:
            for g in groups:
                if isinstance(g, float):  # TJ kerning: move by -g/1000 em
                    t = -g * scale * zh
                    tmx += t * tm0
                    tmy += t * tm1
                    continue
                for b in g:
                    push_x(tmx)
                    t = (
                        wtab[b] * scale
                        + char_sp
                        + (word_sp if b == 0x20 else 0.0)
                    ) * zh
                    tmx += t * tm0
                    tmy += t * tm1
                text_parts.append(cmap.decode(g) if cmap else g.decode("latin1"))
        tm[4], tm[5] = tmx, tmy
        text = "".join(text_parts)
        if not text.strip():
            return
        spans.append(
            Span(
                seq=seq,
                text=text,
                x=x0,
                y=y0,
                font=font or "",
                size=size,
                width=tm[4] - x0,
                char_xs=char_xs,
            )
        )
        seq += 1

    def nums(k: int) -> list[float]:
        vals = [v for t, v in stack[-k:] if t == "num"] if k else []
        return vals if len(vals) == k else []

    if use_fast:
        # fused fast path: one C-level match per command; ANY byte it
        # cannot account for aborts to the general interpreter below
        # with all state (including emitted spans) reset
        data = content.rstrip(b"\x00\t\n\x0c\r ")
        pos, n = 0, len(data)
        completed = True
        while pos < n:
            m = _FAST_CMD_RE.match(data, pos)
            if m is None:
                completed = False
                break
            pos = m.end()
            g = m.group
            raw = g(10)
            if raw is not None:  # (str) Tj — the hot command
                emit(raw if b"\\" not in raw else _unescape_literal(raw))
                continue
            v = g(7)
            if v is not None:  # Td / TD
                ty = float(g(8))
                translate_line(float(v), ty)
                if g(9) == b"TD":
                    leading = -ty
                continue
            if g(1) is not None:  # Tm
                tm = [float(g(i)) for i in range(1, 7)]
                tlm = list(tm)
                continue
            nm = g(11)
            if nm is not None:  # Tf
                font = "/" + nm.decode("latin1")
                size = float(g(12))
                continue
            v = g(13)
            if v is not None:  # TL / Tc / Tw / Tz
                op = g(14)
                if op == b"TL":
                    leading = float(v)
                elif op == b"Tc":
                    char_sp = float(v)
                elif op == b"Tw":
                    word_sp = float(v)
                else:
                    hscale = float(v)
                continue
            op = g(15)
            if op == b"BT":
                tm = [1.0, 0.0, 0.0, 1.0, 0.0, 0.0]
                tlm = list(tm)
            elif op == b"T*":
                translate_line(0.0, -leading)
            # ET: no state change
        if completed:
            return spans
        spans.clear()
        seq = 0
        font = None
        size = 0.0
        leading = 0.0
        char_sp = 0.0
        word_sp = 0.0
        hscale = 100.0
        tm = [1.0, 0.0, 0.0, 1.0, 0.0, 0.0]
        tlm = list(tm)

    for kind, val in _ContentLexer(content).tokens():
        if kind != "kw":
            stack.append((kind, val))
            continue
        op = val  # keyword / operator

        if op == "Tf":
            if len(stack) >= 2 and stack[-2][0] == "name" and stack[-1][0] == "num":
                font = stack[-2][1]
                size = stack[-1][1]
        elif op == "Tm":
            v = nums(6)
            if v:
                tm = list(v)
                tlm = list(v)
        elif op in ("Td", "TD"):
            v = nums(2)
            if v:
                translate_line(v[0], v[1])
                if op == "TD":
                    leading = -v[1]
        elif op == "TL":
            v = nums(1)
            if v:
                leading = v[0]
        elif op == "Tc":
            v = nums(1)
            if v:
                char_sp = v[0]
        elif op == "Tw":
            v = nums(1)
            if v:
                word_sp = v[0]
        elif op == "Tz":
            v = nums(1)
            if v:
                hscale = v[0]
        elif op == "T*":
            translate_line(0.0, -leading)
        elif op == "BT":
            tm = [1.0, 0.0, 0.0, 1.0, 0.0, 0.0]
            tlm = list(tm)
        elif op == "Tj":
            if stack and stack[-1][0] == "str":
                emit(stack[-1][1])
        elif op == "'":
            translate_line(0.0, -leading)
            if stack and stack[-1][0] == "str":
                emit(stack[-1][1])
        elif op == '"':
            # "aw ac string": set word/char spacing, next line, show
            if (
                len(stack) >= 3
                and stack[-3][0] == "num"
                and stack[-2][0] == "num"
                and stack[-1][0] == "str"
            ):
                word_sp = stack[-3][1]
                char_sp = stack[-2][1]
            translate_line(0.0, -leading)
            if stack and stack[-1][0] == "str":
                emit(stack[-1][1])
        elif op == "TJ":
            # collect back to the matching '['
            groups: list = []
            i = len(stack) - 1
            while i >= 0 and not (stack[i][0] == "op" and stack[i][1] == "["):
                t, v2 = stack[i]
                if t == "str":
                    groups.append(v2)
                elif t == "num":
                    groups.append(float(v2))
                i -= 1
            groups.reverse()
            emit(b"", kern_groups=groups)
        stack.clear()
    return spans
