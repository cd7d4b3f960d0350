"""Pure-Python TrueType font kernel for the auto-insert write path.

Closes the last reference-parity gap (reference
fonts/embedding.py:91-127: fontTools subset → ``/FontFile2`` embed):
when ``replace_text(..., allow_auto_insert=True)`` allocates a new
code → char mapping, a conforming *renderer* needs a glyph program for
that code, not just ToUnicode/Widths bookkeeping. fontTools is out of
scope in this environment, so this module implements the three
operations the write path needs directly from the public sfnt /
OpenType spec (Apple TrueType Reference Manual; Microsoft OpenType
spec §5 — both public):

- :func:`parse_ttf` — sfnt directory + head/maxp/hhea/hmtx/loca/glyf/
  cmap (subtable formats 0, 4, 6, 12); unknown tables pass through
  verbatim (the reference's ``passthrough_tables=True`` analog).
- :func:`add_glyphs` — subset-APPEND: new glyph ids for chars the
  cmap doesn't cover, with glyf/loca/hmtx/maxp/cmap/head/hhea
  rewritten and checksums (incl. head.checkSumAdjustment) recomputed.
  Existing glyph ids, outlines, and metrics are byte-preserved
  (``retain_gids`` semantics, embedding.py:99).
- :func:`synthesize_ttf` — a minimal valid font built from scratch,
  for auto-insert on NON-embedded fonts (the synthesized corpus uses
  base-14 names): every requested char gets a real rectangle outline
  sized to its PDF width, so the embedded program parses and renders.

Everything is deterministic — no timestamps, no randomness — because
outputs land in oracle-hashed incremental updates.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field

__all__ = [
    "TrueTypeError",
    "TrueTypeFont",
    "parse_ttf",
    "add_glyphs",
    "synthesize_ttf",
    "cmap_coverage",
    "glyph_has_outline",
]


class TrueTypeError(ValueError):
    pass


# ---------------------------------------------------------------- checksums


def _checksum(data: bytes) -> int:
    if len(data) % 4:
        data += b"\x00" * (4 - len(data) % 4)
    s = 0
    for (w,) in struct.iter_unpack(">I", data):
        s = (s + w) & 0xFFFFFFFF
    return s


# ------------------------------------------------------------------- parse


@dataclass
class TrueTypeFont:
    """Decomposed sfnt: enough structure to append glyphs, everything
    else carried as opaque bytes."""

    units_per_em: int
    index_to_loc_format: int
    num_glyphs: int
    num_hmetrics: int
    # per-glyph raw glyf records (b"" = empty glyph, legal)
    glyphs: list[bytes]
    # per-glyph (advance, lsb); advances beyond numberOfHMetrics were
    # monospaced onto the last metric — expanded here for simplicity
    hmetrics: list[tuple[int, int]]
    cmap: dict[int, int]  # unicode → glyph id
    head: bytearray
    hhea: bytearray
    maxp: bytearray
    # tables passed through untouched, in original directory order
    passthrough: list[tuple[bytes, bytes]] = field(default_factory=list)

    def has_outline(self, gid: int) -> bool:
        return 0 <= gid < len(self.glyphs) and len(self.glyphs[gid]) > 0


def _parse_cmap_table(data: bytes) -> dict[int, int]:
    """Best unicode subtable → {codepoint: gid}. Formats 0/4/6/12."""
    (n_sub,) = struct.unpack_from(">H", data, 2)
    best, best_score = None, -1
    for i in range(n_sub):
        plat, enc, off = struct.unpack_from(">HHI", data, 4 + 8 * i)
        # prefer 3/10 (UCS-4) > 3/1 (BMP) > 0/* (unicode) > rest
        score = {(3, 10): 3, (3, 1): 2}.get((plat, enc), 1 if plat == 0 else 0)
        if score > best_score:
            best, best_score = off, score
    if best is None:
        return {}
    (fmt,) = struct.unpack_from(">H", data, best)
    out: dict[int, int] = {}
    if fmt == 0:
        glyph_ids = data[best + 6 : best + 6 + 256]
        for code, gid in enumerate(glyph_ids):
            if gid:
                out[code] = gid
    elif fmt == 4:
        seg2, = struct.unpack_from(">H", data, best + 6)
        seg = seg2 // 2
        ends = struct.unpack_from(f">{seg}H", data, best + 14)
        starts = struct.unpack_from(f">{seg}H", data, best + 16 + seg2)
        deltas = struct.unpack_from(f">{seg}h", data, best + 16 + 2 * seg2)
        ro_base = best + 16 + 3 * seg2
        range_offsets = struct.unpack_from(f">{seg}H", data, ro_base)
        for s in range(seg):
            for code in range(starts[s], min(ends[s], 0xFFFE) + 1):
                if range_offsets[s] == 0:
                    gid = (code + deltas[s]) & 0xFFFF
                else:
                    addr = (
                        ro_base
                        + 2 * s
                        + range_offsets[s]
                        + 2 * (code - starts[s])
                    )
                    if addr + 2 > len(data):
                        continue
                    (gid,) = struct.unpack_from(">H", data, addr)
                    if gid:
                        gid = (gid + deltas[s]) & 0xFFFF
                if gid:
                    out[code] = gid
    elif fmt == 6:
        first, count = struct.unpack_from(">HH", data, best + 6)
        gids = struct.unpack_from(f">{count}H", data, best + 10)
        for i, gid in enumerate(gids):
            if gid:
                out[first + i] = gid
    elif fmt == 12:
        (n_groups,) = struct.unpack_from(">I", data, best + 12)
        for g in range(n_groups):
            s, e, gid0 = struct.unpack_from(">III", data, best + 16 + 12 * g)
            for code in range(s, e + 1):
                out[code] = gid0 + (code - s)
    else:
        raise TrueTypeError(f"unsupported cmap subtable format {fmt}")
    return out


def parse_ttf(data: bytes) -> TrueTypeFont:
    if len(data) < 12:
        raise TrueTypeError("not an sfnt: too short")
    (version, num_tables) = struct.unpack_from(">IH", data, 0)
    if version not in (0x00010000, 0x74727565):  # 1.0 | 'true'
        raise TrueTypeError(f"not a TrueType sfnt (version 0x{version:08X})")
    tables: dict[bytes, bytes] = {}
    order: list[bytes] = []
    for i in range(num_tables):
        tag, _cs, off, length = struct.unpack_from(">4sIII", data, 12 + 16 * i)
        if off + length > len(data):
            raise TrueTypeError(f"table {tag!r} extends past EOF")
        tables[tag] = data[off : off + length]
        order.append(tag)
    for req in (b"head", b"maxp", b"hhea", b"hmtx", b"loca", b"glyf"):
        if req not in tables:
            raise TrueTypeError(f"missing required table {req!r}")
    head = bytearray(tables[b"head"])
    units_per_em = struct.unpack_from(">H", head, 18)[0]
    loc_fmt = struct.unpack_from(">h", head, 50)[0]
    (num_glyphs,) = struct.unpack_from(">H", tables[b"maxp"], 4)
    (num_hm,) = struct.unpack_from(">H", tables[b"hhea"], 34)
    # loca → per-glyph glyf slices
    loca_raw = tables[b"loca"]
    if loc_fmt == 0:
        offs = [
            2 * v for v in struct.unpack(f">{num_glyphs + 1}H", loca_raw[: 2 * (num_glyphs + 1)])
        ]
    else:
        offs = list(
            struct.unpack(f">{num_glyphs + 1}I", loca_raw[: 4 * (num_glyphs + 1)])
        )
    glyf = tables[b"glyf"]
    glyphs = [glyf[offs[i] : offs[i + 1]] for i in range(num_glyphs)]
    # hmtx → expanded per-glyph metrics
    hmtx = tables[b"hmtx"]
    hmetrics: list[tuple[int, int]] = []
    for i in range(num_hm):
        aw, lsb = struct.unpack_from(">Hh", hmtx, 4 * i)
        hmetrics.append((aw, lsb))
    last_aw = hmetrics[-1][0] if hmetrics else 0
    for i in range(num_glyphs - num_hm):
        (lsb,) = struct.unpack_from(">h", hmtx, 4 * num_hm + 2 * i)
        hmetrics.append((last_aw, lsb))
    cmap = _parse_cmap_table(tables[b"cmap"]) if b"cmap" in tables else {}
    rebuilt = {b"head", b"maxp", b"hhea", b"hmtx", b"loca", b"glyf", b"cmap"}
    passthrough = [(t, tables[t]) for t in order if t not in rebuilt]
    return TrueTypeFont(
        units_per_em=units_per_em,
        index_to_loc_format=loc_fmt,
        num_glyphs=num_glyphs,
        num_hmetrics=num_hm,
        glyphs=glyphs,
        hmetrics=hmetrics,
        cmap=cmap,
        head=head,
        hhea=bytearray(tables[b"hhea"]),
        maxp=bytearray(tables[b"maxp"]),
        passthrough=passthrough,
    )


# -------------------------------------------------------------- glyph build


def _rect_glyph(x0: int, y0: int, x1: int, y1: int) -> bytes:
    """One-contour rectangle, 4 on-curve points — the smallest honest
    outline (glyf simple-glyph encoding, OpenType §5.3.3.2)."""
    out = struct.pack(">hhhhh", 1, x0, y0, x1, y1)  # nContours + bbox
    out += struct.pack(">H", 3)  # endPtsOfContours[0] (4 points)
    out += struct.pack(">H", 0)  # instructionLength
    # points: (x0,y0) (x1,y0) (x1,y1) (x0,y1); flags: on-curve, deltas
    # as int16 (no short-vector flags — simplest valid encoding)
    out += bytes([0x01, 0x01, 0x01, 0x01])
    xs = [x0, x1 - x0, 0, -(x1 - x0)]
    ys = [y0, 0, y1 - y0, 0]
    out += struct.pack(">4h", *xs) + struct.pack(">4h", *ys)
    if len(out) % 2:
        out += b"\x00"
    return out


def _glyph_for_char(code: int, advance: int, upm: int) -> bytes:
    """Deterministic visible outline for an appended char: a rectangle
    inset 10% on each side, cap-height 66% of the em, with a height
    nudge derived from the codepoint so distinct chars are distinct
    outlines (renderers and humans can tell them apart)."""
    inset = max(advance // 10, upm // 50)
    x0, x1 = inset, max(advance - inset, inset + upm // 25)
    y1 = upm * 2 // 3 - (code % 7) * upm // 100
    return _rect_glyph(x0, 0, x1, max(y1, upm // 10))


# --------------------------------------------------------------- cmap build


def _build_cmap_format4(mapping: dict[int, int]) -> bytes:
    codes = sorted(c for c in mapping if 0 <= c <= 0xFFFD)
    # contiguous-code segments, split where the gid run breaks too
    segments: list[tuple[int, int, list[int]]] = []  # start, end, gids
    for c in codes:
        gid = mapping[c]
        if (
            segments
            and c == segments[-1][1] + 1
        ):
            segments[-1] = (segments[-1][0], c, segments[-1][2] + [gid])
        else:
            segments.append((c, c, [gid]))
    segments.append((0xFFFF, 0xFFFF, [0]))  # required terminator
    seg = len(segments)
    ends, starts, deltas, ros, glyph_array = [], [], [], [], []
    for s, e, gids in segments:
        ends.append(e)
        starts.append(s)
        if all(g == (s + i + gids[0] - s) for i, g in enumerate(gids)) and all(
            gids[i] == gids[0] + i for i in range(len(gids))
        ):
            deltas.append((gids[0] - s) & 0xFFFF)
            ros.append(0)
        else:
            deltas.append(0)
            ros.append(len(glyph_array))  # index; fixed up below
            glyph_array.extend(gids)
    # fix up idRangeOffset: byte distance from its own slot to the gids
    ro_final = []
    for i, ro in enumerate(ros):
        if deltas[i] != 0 or (ros[i] == 0 and segments[i][2][0] == (segments[i][0] + deltas[i]) & 0xFFFF):
            pass
    # (simpler second pass below — ros currently holds glyph_array index)
    for i in range(seg):
        if ros[i] == 0 and (
            segments[i][2][0] == (segments[i][0] + deltas[i]) & 0xFFFF
        ):
            ro_final.append(0)
        else:
            slots_after = seg - i  # uint16 slots from slot i to array start
            ro_final.append(2 * (slots_after + ros[i]))
    search_range = 2
    entry_selector = 0
    while search_range * 2 <= 2 * seg:
        search_range *= 2
        entry_selector += 1
    sub = struct.pack(
        ">HHHHHH",
        4,
        0,  # length placeholder
        0,  # language
        2 * seg,
        search_range,
        entry_selector,
    ) + struct.pack(">H", 2 * seg - search_range)
    sub += struct.pack(f">{seg}H", *ends)
    sub += b"\x00\x00"  # reservedPad
    sub += struct.pack(f">{seg}H", *starts)
    sub += struct.pack(f">{seg}H", *deltas)
    sub += struct.pack(f">{seg}H", *ro_final)
    sub += struct.pack(f">{len(glyph_array)}H", *glyph_array)
    sub = sub[:2] + struct.pack(">H", len(sub)) + sub[4:]
    header = struct.pack(">HH", 0, 1) + struct.pack(">HHI", 3, 1, 12)
    return header + sub


# --------------------------------------------------------------- assembly


def _assemble(font: TrueTypeFont) -> bytes:
    """Serialize with recomputed loca/hmtx/maxp/head/hhea + checksums."""
    # glyf + loca (long format unconditionally: immune to >128k growth)
    glyf = b""
    offsets = [0]
    for g in font.glyphs:
        glyf += g
        if len(glyf) % 2:
            glyf += b"\x00"
        offsets.append(len(glyf))
    loca = struct.pack(f">{len(offsets)}I", *offsets)
    head = bytearray(font.head)
    struct.pack_into(">h", head, 50, 1)  # indexToLocFormat = long
    struct.pack_into(">I", head, 8, 0)  # checkSumAdjustment = 0 for now
    # hmtx: full metric per glyph (numberOfHMetrics = numGlyphs)
    hmtx = b"".join(
        struct.pack(">Hh", aw & 0xFFFF, lsb) for aw, lsb in font.hmetrics
    )
    hhea = bytearray(font.hhea)
    struct.pack_into(">H", hhea, 34, len(font.hmetrics))
    maxp = bytearray(font.maxp)
    struct.pack_into(">H", maxp, 4, len(font.glyphs))
    cmap = _build_cmap_format4(font.cmap)
    tables: list[tuple[bytes, bytes]] = [
        (b"cmap", cmap),
        (b"glyf", glyf),
        (b"head", bytes(head)),
        (b"hhea", bytes(hhea)),
        (b"hmtx", hmtx),
        (b"loca", loca),
        (b"maxp", bytes(maxp)),
    ]
    tables.extend(font.passthrough)
    tables.sort(key=lambda t: t[0])
    n = len(tables)
    search_range = 16
    entry_selector = 0
    while search_range * 2 <= 16 * n:
        search_range *= 2
        entry_selector += 1
    header = struct.pack(
        ">IHHHH", 0x00010000, n, search_range, entry_selector, 16 * n - search_range
    )
    offset = 12 + 16 * n
    directory = b""
    body = b""
    head_off = None
    for tag, data in tables:
        pad = (-len(data)) % 4
        if tag == b"head":
            head_off = offset
        directory += struct.pack(">4sIII", tag, _checksum(data), offset, len(data))
        body += data + b"\x00" * pad
        offset += len(data) + pad
    out = bytearray(header + directory + body)
    adjustment = (0xB1B0AFBA - _checksum(bytes(out))) & 0xFFFFFFFF
    struct.pack_into(">I", out, head_off + 8, adjustment)
    return bytes(out)


# ------------------------------------------------------------- public ops


def add_glyphs(data: bytes, chars: dict[str, int]) -> bytes:
    """Subset-append: give every char in *chars* (char → PDF /Widths
    width, 1/1000 text-space units) a glyph program. Chars the cmap
    already covers are untouched; new ones get fresh glyph ids at the
    end (existing ids never move — ``retain_gids``)."""
    font = parse_ttf(data)
    scale = font.units_per_em / 1000.0
    for ch, pdf_width in sorted(chars.items()):
        code = ord(ch)
        if code in font.cmap and font.has_outline(font.cmap[code]):
            continue
        advance = max(int(round(pdf_width * scale)), 1)
        gid = font.cmap.get(code)
        if gid is None or gid >= len(font.glyphs):
            gid = len(font.glyphs)
            font.glyphs.append(_glyph_for_char(code, advance, font.units_per_em))
            font.hmetrics.append((advance, max(advance // 10, 1)))
            font.cmap[code] = gid
        else:
            # mapped but empty outline → fill the existing gid in place
            font.glyphs[gid] = _glyph_for_char(code, advance, font.units_per_em)
    return _assemble(font)


_HEAD_TMPL = struct.pack(
    ">HHIIIHHQQhhhhHHhh",
    1, 0,           # version
    0x00010000,     # fontRevision 1.0
    0,              # checkSumAdjustment (filled at assembly)
    0x5F0F3CF5,     # magicNumber
    0b0000000000001011,  # flags: baseline@0, lsb@x=0, instructions-free
    1000,           # unitsPerEm
    0, 0,           # created/modified: epoch — deterministic
    0, -200, 1000, 800,  # font bbox
    0,              # macStyle
    8,              # lowestRecPPEM
    2,              # fontDirectionHint
    1,              # indexToLocFormat (long)
) + struct.pack(">h", 0)  # glyphDataFormat


def _minimal_name_table(ps_name: str) -> bytes:
    """name table, format 0: family/subfamily/full/postscript records
    (IDs 1/2/4/6), platform 3 encoding 1 language 0x409."""
    entries = [(1, ps_name), (2, "Regular"), (4, ps_name), (6, ps_name)]
    strings = b""
    records = b""
    for name_id, text in entries:
        enc = text.encode("utf-16-be")
        records += struct.pack(
            ">HHHHHH", 3, 1, 0x409, name_id, len(enc), len(strings)
        )
        strings += enc
    return (
        struct.pack(">HHH", 0, len(entries), 6 + 12 * len(entries))
        + records
        + strings
    )


_POST_V3 = struct.pack(">IihhIIIIII", 0x00030000, 0, -100, 50, 0, 0, 0, 0, 0, 0)[:32]


def synthesize_ttf(chars: dict[str, int], ps_name: str = "PdfParserSynth") -> bytes:
    """A complete, deterministic TrueType font from nothing: glyph 0
    (.notdef box) plus one rectangle glyph per requested char, widths
    taken from the PDF /Widths values (upm=1000 → 1:1). Used when the
    auto-insert target font has no embedded program at all."""
    hhea = struct.pack(
        ">HHhhhHhhhhhhhhhhhH",
        1, 0,        # version
        760, -240, 0,  # ascender / descender / lineGap
        1000,        # advanceWidthMax (patched at assembly? keep max)
        0, 0, 1000,  # min LSB / min RSB / xMaxExtent
        1, 0, 0,     # caret slope rise/run/offset
        0, 0, 0, 0,  # reserved
        0,           # metricDataFormat
        1,           # numberOfHMetrics (patched at assembly)
    )
    maxp = struct.pack(
        ">IHHHHHHHHHHHHHH",
        0x00010000, 1,  # version, numGlyphs (patched)
        8, 2,           # maxPoints / maxContours
        0, 0,           # composite points / contours
        2, 0, 0, 0, 0,  # zones / twilight / storage / fdefs / idefs
        0, 0, 0, 0,     # stack / instr size / comp elems / depth
    )
    font = TrueTypeFont(
        units_per_em=1000,
        index_to_loc_format=1,
        num_glyphs=1,
        num_hmetrics=1,
        glyphs=[_rect_glyph(50, 0, 450, 660)],  # gid 0: .notdef box
        hmetrics=[(500, 50)],
        cmap={},
        head=bytearray(_HEAD_TMPL),
        hhea=bytearray(hhea),
        maxp=bytearray(maxp),
        passthrough=[
            (b"name", _minimal_name_table(ps_name)),
            (b"post", _POST_V3),
        ],
    )
    for ch, pdf_width in sorted(chars.items()):
        code = ord(ch)
        advance = max(int(pdf_width), 1)
        font.cmap[code] = len(font.glyphs)
        font.glyphs.append(_glyph_for_char(code, advance, 1000))
        font.hmetrics.append((advance, max(advance // 10, 1)))
    return _assemble(font)


# ------------------------------------------------------------ inspection


def cmap_coverage(data: bytes) -> dict[int, int]:
    """unicode → glyph id of the font's best unicode cmap subtable."""
    return parse_ttf(data).cmap


def glyph_has_outline(data: bytes, code: int) -> bool:
    """True when *code* maps to a glyph with a non-empty program —
    the test criterion for 'embedding actually happened'."""
    font = parse_ttf(data)
    gid = font.cmap.get(code)
    return gid is not None and font.has_outline(gid)
