"""Read-compatible text replacement — the reference's rewrite engine
(/root/reference/pdf_parser/core/replacer.py:43-839) re-expressed over
this repo's own kernel (no pikepdf/fontTools).

Semantics reproduced (each pinned by a test):

- F6 identity guard (replacer.py:92-94): target == replacement bails.
- whole-document census A2/A3/A4 (replacer.py:119-221) with the
  REPLACE-path escape rule T5 (``inner.replace('\\\\','')`` — strips
  every backslash, replacer.py:199,487), which deliberately diverges
  from the parse-path rule T4.
- validation E2 (replacer.py:375-467): replacement chars must be in
  the target font's census charset ∪ whitespace ∪ the reverse-CMap
  domain; otherwise the replacement is canceled and the original
  bytes come back unchanged.
- rewrite loop (replacer.py:469-802): segment regex incl. the Tm
  alternation, font-state fold, instance gate F7 (counts only segments
  whose decoded text equals the target), per-char code lookup J3
  (census codes first — lowest code, deterministic, where the
  reference takes set-iteration order — then reverse CMap), partial-
  replacement guard, escape T10 + splice J5 via the same
  ``str.replace`` on the matched segment.

Differences, by design:

- ``allow_auto_insert=True`` is the WORKING form of the reference's
  auto-insert aspiration (its own path is broken at
  fonts/embedding.py:68 — SURVEY.md §3.3): safe-code allocation E1,
  CMap merge E3, /Differences + /Widths reconciliation, and — closing
  the last parity gap — real glyph-program embedding: an existing
  /FontFile2 gets the new codes subset-APPENDED (retain-gids, like the
  reference's fontTools options, embedding.py:96-101), a non-embedded
  font gets a complete synthesized TrueType program + /FontDescriptor,
  both through the pure-Python sfnt kernel (truetype.py). Default
  (False) cancels on unsupported characters, exactly like the
  reference with auto-insert disabled.
- K2 sink: instead of pikepdf copy-and-save, the modified document is
  produced as an INCREMENTAL UPDATE (ISO 32000-1 §7.5.6): the original
  bytes are preserved verbatim and a new content stream object, a
  classic xref section, and a trailer with /Prev are appended. Our own
  reader follows the /Prev chain, so rewritten documents round-trip
  through extract_pdf.
"""

from __future__ import annotations

import re
import zlib
from dataclasses import dataclass, field

from .cmap import CMap
from .document import PdfDocument, PdfError
from .extract import _font_cmaps_and_metrics
from .lexer import Name, Ref, Stream

# segment regex — replacer.py:470-471 (text ops + Tf + 6-number Tm).
# _TEXT_RE/_FONT_RE are the extraction path's contract regexes
# (tokenizer.py, pinned by goldens) — imported, not copied, so a fix
# to the contract can never diverge the census/rewrite path.
from .tokenizer import _FONT_RE, _TEXT_RE  # noqa: E402
from .truetype import TrueTypeError, add_glyphs, synthesize_ttf

_SEGMENT_RE = re.compile(
    _TEXT_RE.pattern
    + r"|/[A-Za-z0-9]+\s+\d+\s+Tf"
    + r"|(?:[-\d.]+\s+){5}[-\d.]+\s+Tm"
)


# --------------------------------------------------------------------------
# scalar building blocks (reference core/cmap.py:57-104, fonts/analysis.py,
# fonts/embedding.py) — T9, T10, E1, E3, A6

_ESCAPE_MAP = {
    "(": "\\(",
    ")": "\\)",
    "\\": "\\\\",
    "\r": "\\r",
    "\n": "\\n",
    "\t": "\\t",
    "\b": "\\b",
    "\f": "\\f",
}


def escape_pdf_string(text: str) -> str:
    """T10 (reference cmap.py:80-104): escape ( ) \\ CR LF TAB BS FF."""
    return "".join(_ESCAPE_MAP.get(ch, ch) for ch in text)


def encode_pdf_string(text: str, cmap: CMap) -> bytes:
    """T9 (reference cmap.py:57-77): reverse-CMap encode; ValueError on
    any unmapped char (last-writer-wins inversion, like the reference)."""
    reverse = cmap.reverse()
    out = bytearray()
    for ch in text:
        if ch not in reverse:
            raise ValueError(f"Character {ch} not found in CMap, cannot encode.")
        out.append(reverse[ch])
    return bytes(out)


# E1 blocklist — reference fonts/analysis.py:70-100
_UNSAFE_RANGES = [
    (0x00, 0x1F),
    (0x20, 0x20),
    (0x22, 0x22),
    (0x27, 0x27),
    (0x28, 0x29),
    (0x2C, 0x2C),
    (0x2E, 0x2E),
    (0x3A, 0x3B),
    (0x3F, 0x3F),
    (0x5B, 0x5D),
    (0x7B, 0x7D),
]


def is_safe_code(code: int) -> bool:
    """Reference fonts/analysis.py:70-100 blocklist."""
    return not any(lo <= code <= hi for lo, hi in _UNSAFE_RANGES)


def allocate_safe_code(
    used_codes: set[int],
    already_used: set[int] | None = None,
    encoding_maps: dict[str, dict[int, str]] | None = None,
) -> int | None:
    """E1 (reference replacer.py:687-717): scan 0xB0..0xFF for a code
    not in use anywhere and passing the safety blocklist. The
    reference's 0x100-0x10F "extended range" fallback is intentionally
    NOT reproduced — it masks codes back into 0x00-0x0F (`& 0xFF`,
    replacer.py:719-736), silently colliding with control codes; we
    return None instead."""
    already = already_used or set()
    maps = encoding_maps or {}
    for code in range(0xB0, 0x100):
        if code in used_codes or code in already:
            continue
        if any(code in m for m in maps.values()):
            continue
        if is_safe_code(code):
            return code
    return None


def merge_cmaps(original: dict[int, str], new: dict[int, str]) -> dict[int, str]:
    """E3 (reference fonts/embedding.py:62-66): original ∪ new, new wins."""
    merged = dict(original)
    merged.update(new)
    return merged


def build_tounicode_stream(mapping: dict[int, str]) -> str:
    """ToUnicode CMap text whose :func:`parse_cmap` (default mode) result
    is EXACTLY *mapping* — the auto-insert write form.

    The codespacerange bounds are emitted one-per-line so the quirky
    line-oriented parser (two hex groups on one line = bfchar) cannot
    manufacture the 0x00→'ÿ' ghost entry: the merged mapping round-trips
    bit-exactly, including any explicit 0x00 entry it carries. CMaps are
    PostScript, so the token-per-line layout is spec-valid."""
    lines = [
        "/CIDInit /ProcSet findresource begin",
        "12 dict begin",
        "begincmap",
        "/CIDSystemInfo << /Registry (Adobe) /Ordering (UCS) /Supplement 0 >> def",
        "/CMapName /Adobe-Identity-UCS def",
        "/CMapType 2 def",
        "1 begincodespacerange",
        "<00>",
        "<FF>",
        "endcodespacerange",
        f"{len(mapping)} beginbfchar",
    ]
    for code in sorted(mapping):  # O3 sort order
        lines.append(f"<{code:02X}> <{ord(mapping[code]):04X}>")
    lines.extend(
        [
            "endbfchar",
            "endcmap",
            "CMapName currentdict /CMap defineresource pop",
            "end",
            "end",
        ]
    )
    return "\n".join(lines)


def avg_width_ratio(pairs: list[tuple[float, float]]) -> float:
    """A6 (reference fonts/embedding.py:149-171): mean of
    pdf_width/ttf_width ratios × 0.97; 0.0 for an empty input."""
    ratios = [p / t for p, t in pairs if t]
    if not ratios:
        return 0.0
    return (sum(ratios) / len(ratios)) * 0.97


# --------------------------------------------------------------------------
# census (replace-path T5 decode — replacer.py:119-221)


def _census(doc: PdfDocument, pages: list[dict], page_cmaps: list[dict[str, CMap]]):
    all_pdf_chars: dict[str, set[str]] = {}
    all_char_codes: dict[str, dict[str, set[int]]] = {}
    used_codes: dict[str, set[int]] = {}
    all_texts: list[tuple[str, str]] = []  # (font, decoded)
    for pno, page in enumerate(pages):
        content = doc.page_content_bytes(page).decode("latin1")
        cmaps = page_cmaps[pno]
        current_font: str | None = None
        for seg in _SEGMENT_RE.finditer(content):
            fm = _FONT_RE.search(seg.group(0))
            if fm:
                current_font = "/" + fm.group(1)
                continue
            tmatch = _TEXT_RE.search(seg.group(0))
            if not tmatch or current_font not in cmaps:
                continue
            is_tj = seg.group(0).strip().endswith("TJ")
            inner = tmatch.group(2) if is_tj else tmatch.group(1)
            raw = inner.replace("\\", "").encode("latin1")  # T5
            decoded = cmaps[current_font].decode(raw)
            all_texts.append((current_font, decoded))
            all_pdf_chars.setdefault(current_font, set()).update(decoded)
            used_codes.setdefault(current_font, set()).update(raw)
            codes = all_char_codes.setdefault(current_font, {})
            for b, ch in zip(raw, decoded):
                codes.setdefault(ch, set()).add(b)
    return all_pdf_chars, all_char_codes, used_codes, all_texts


# --------------------------------------------------------------------------
# incremental-update writer (K2 sink)


def _serialize(obj, cryptor=None, num: int = 0, gen: int = 0) -> bytes:
    """COS serializer for objects parsed by this kernel's lexer.

    When *cryptor* is given (the owning document's StandardDecryptor),
    literal strings and stream payloads are enciphered with the
    (num, gen) object key before emission — an incremental update
    appended to an encrypted document MUST be encrypted with the same
    security handler (ISO 32000-1 §7.6.1), or every conforming reader
    would "decrypt" the plaintext into garbage. /Length is computed
    AFTER encryption (AES adds an IV prefix + block padding)."""
    if obj is None:
        return b"null"
    if isinstance(obj, bool):
        return b"true" if obj else b"false"
    if isinstance(obj, Ref):
        return f"{obj.num} {obj.gen} R".encode()
    if isinstance(obj, Name):
        return b"/" + str(obj).encode("latin1")
    if isinstance(obj, int):
        return str(obj).encode()
    if isinstance(obj, float):
        s = f"{obj:.6f}".rstrip("0").rstrip(".")
        return s.encode()
    if isinstance(obj, bytes):
        if cryptor is not None:
            obj = cryptor.encrypt(obj, num, gen)
        # \r and \n must be escaped too: §7.3.4.2 makes a conforming
        # reader fold any raw EOL inside a literal string to 0x0A, which
        # would corrupt binary payloads (AES ciphertext, /ID digests)
        esc = (
            obj.replace(b"\\", b"\\\\")
            .replace(b"(", b"\\(")
            .replace(b")", b"\\)")
            .replace(b"\r", b"\\r")
            .replace(b"\n", b"\\n")
        )
        return b"(" + esc + b")"
    if isinstance(obj, str):  # plain str (shouldn't occur, but be safe)
        return _serialize(obj.encode("latin1", "replace"), cryptor, num, gen)
    if isinstance(obj, list):
        return b"[" + b" ".join(_serialize(x, cryptor, num, gen) for x in obj) + b"]"
    if isinstance(obj, dict):
        parts = [b"<<"]
        for k, v in obj.items():
            parts.append(
                b"/" + str(k).encode("latin1") + b" "
                + _serialize(v, cryptor, num, gen)
            )
        parts.append(b">>")
        return b" ".join(parts)
    if isinstance(obj, Stream):
        raw = obj.raw
        if cryptor is not None:
            raw = cryptor.encrypt(raw, num, gen)
        d = dict(obj.dict)
        d["Length"] = len(raw)
        # the stream dict's own strings encrypt with the same key; the
        # payload was handled above, so serialize the dict leaf-wise
        return (
            _serialize(d, cryptor, num, gen) + b"\nstream\n" + raw + b"\nendstream"
        )
    raise PdfError(f"cannot serialize {type(obj).__name__}")


def incremental_update(
    data: bytes, doc: PdfDocument, updates: dict[int, object]
) -> bytes:
    """Append updated object bodies + a classic xref section + trailer
    (/Prev chain) to the original bytes — ISO 32000-1 §7.5.6. Works on
    top of classic-xref AND xref-stream originals: the appended section
    is read first (newest wins), then /Prev walks into the original.

    The base buffer is ``doc.data`` — NOT the caller's raw bytes: the
    reader tolerates up to 1 KiB of junk before %PDF- and strips it, so
    every xref offset (startxref, /Prev chain, and the new entries
    below) lives in stripped coordinates. Appending to the unstripped
    buffer would shift every new offset by the prefix length and yield
    an unreadable document; dropping the junk prefix on rewrite is
    spec-legal and keeps the coordinate system consistent."""
    del data  # see docstring: stripped doc.data is the only safe base
    prev = doc._find_startxref()
    out = bytearray(doc.data)
    if not out.endswith(b"\n"):
        out += b"\n"
    offsets: dict[int, int] = {}
    # carry each overridden object's ORIGINAL generation into the
    # appended body and xref entry: a spec-conforming reader resolving
    # 'n g R' with g > 0 would otherwise ignore the update (our own
    # reader ignores generations, so round-trip tests can't catch it)
    gens = {num: doc.object_generation(num) for num in updates}
    for num in sorted(updates):
        offsets[num] = len(out)
        upd = updates[num]
        if isinstance(upd, (bytes, bytearray)):
            # pre-serialized bodies are plaintext by construction —
            # appending them to an encrypted document would corrupt it
            if doc.decryptor is not None:
                raise PdfError(
                    "raw object bodies cannot be appended to an "
                    "encrypted document; pass parsed objects instead"
                )
            body = bytes(upd)
        else:
            body = _serialize(upd, doc.decryptor, num, gens[num])
        out += f"{num} {gens[num]} obj\n".encode() + body + b"\nendobj\n"
    xref_pos = len(out)
    out += b"xref\n"
    # one subsection per contiguous run of object numbers
    nums = sorted(offsets)
    run_start = 0
    while run_start < len(nums):
        run_end = run_start
        while (
            run_end + 1 < len(nums) and nums[run_end + 1] == nums[run_end] + 1
        ):
            run_end += 1
        first = nums[run_start]
        count = run_end - run_start + 1
        out += f"{first} {count}\n".encode()
        for num in nums[run_start : run_end + 1]:
            out += f"{offsets[num]:010d} {gens[num]:05d} n \n".encode()
        run_start = run_end + 1
    size = int(doc.trailer.get("Size") or 0)
    size = max(size, max(nums) + 1)
    trailer: dict = {"Size": size, "Prev": prev}
    # ISO 32000-1 §7.5.6: an update's trailer must carry forward /Root,
    # /Encrypt, /ID and /Info — a reader that treats the newest trailer
    # as authoritative (most do) would otherwise see an encrypted
    # document's update as unencrypted, or fail key derivation without
    # /ID.  /Encrypt stays the ORIGINAL value (a Ref when the source
    # used one, serialized verbatim); the trailer itself is serialized
    # with no cryptor, so /ID strings are emitted unencrypted as the
    # spec requires.  Our own reader merges trailer chains via
    # setdefault, which is why round-trip tests alone can't catch an
    # omission here (pinned in test_rewrite).
    for key in ("Root", "Encrypt", "Info", "ID"):
        val = doc.trailer.get(key)
        if val is not None:
            trailer[key] = val
    out += b"trailer\n" + _serialize(trailer)
    out += f"\nstartxref\n{xref_pos}\n%%EOF\n".encode()
    return bytes(out)


def _flate_stream_body(content: bytes) -> Stream:
    """FlateDecode'd stream OBJECT (not bytes): serialization — and
    therefore /Length and any encryption — happens in
    incremental_update, which knows the object number."""
    return Stream({"Filter": Name("FlateDecode")}, zlib.compress(content, 6))


def _contents_uses(doc: PdfDocument, page_num: int, stream_num: int) -> bool:
    """True when page object *page_num*'s /Contents references object
    *stream_num* (directly or inside a /Contents array)."""
    page = doc.get_object(page_num)
    if not isinstance(page, dict):
        return False
    c = page.get("Contents")
    if isinstance(c, Ref):
        return c.num == stream_num
    if isinstance(c, list):
        return any(isinstance(x, Ref) and x.num == stream_num for x in c)
    return False


def content_update_objects(
    doc: PdfDocument,
    page_index: int,
    new_content: bytes,
    next_num: int | None = None,
) -> dict[int, bytes]:
    """Object bodies for swapping one page's content stream.

    Single-Ref /Contents owned by THIS page alone → override that
    object in place. Array or direct /Contents — or a stream object
    shared with another page (legal: boilerplate content reused across
    pages) → new stream object + rewritten page object, so the edit
    stays scoped to page_index instead of silently rewriting every
    sharing page."""
    refs = doc.page_object_refs()
    if page_index >= len(refs) or refs[page_index] is None:
        raise PdfError(f"cannot locate page object for index {page_index}")
    pnum = refs[page_index]
    page_obj = doc.get_object(pnum)
    if not isinstance(page_obj, dict):
        raise PdfError(f"page object {pnum} is not a dict")
    contents = page_obj.get("Contents")
    body = _flate_stream_body(new_content)
    if isinstance(contents, Ref):
        target = doc.resolve(contents)
        shared = any(
            i != page_index and _contents_uses(doc, r, contents.num)
            for i, r in enumerate(refs)
            if r is not None
        )
        if isinstance(target, Stream) and not shared:
            return {contents.num: body}
    new_num = next_num if next_num is not None else doc.max_object_number() + 1
    new_page = dict(page_obj)
    new_page["Contents"] = Ref(new_num, 0)
    return {new_num: body, pnum: new_page}


def font_update_objects(
    doc: PdfDocument,
    page: dict,
    font_name: str,
    new_entries: dict[int, str],
    current_mapping: dict[int, str],
    next_num: int,
) -> dict[int, bytes] | None:
    """Object bodies extending *font_name* with *new_entries* — the
    working form of the reference's intended auto-insert flow
    (fonts/embedding.py:11-230, which is broken at embedding.py:68):

    - a NEW ToUnicode stream carrying merge_cmaps(current, new) in the
      exact-round-trip form (:func:`build_tounicode_stream`), always a
      fresh object so a ToUnicode shared between fonts is never mutated;
    - the font dict rewritten in place: /ToUnicode → the new stream,
      /Encoding /Differences extended with ``code /uniXXXX`` pairs
      (AGL convention) so spec-conforming viewers map the code to a
      glyph name, /Widths extended when the font declares them (gap
      codes get the font's average width — the A6 analog; no better
      estimate exists without the glyph program);
    - a GLYPH PROGRAM for every inserted code (reference
      fonts/embedding.py:91-127, which shells to fontTools.subset with
      retain_gids + passthrough_tables and embeds as /FontFile2):
      an already-embedded /FontFile2 is subset-APPENDED via
      :func:`truetype.add_glyphs` (existing glyph ids, outlines, and
      metrics byte-preserved; new chars get fresh ids), written as a
      fresh stream with a fresh /FontDescriptor pointing at it (a
      descriptor shared between fonts is never mutated — same rule as
      ToUnicode above). A NON-embedded font (base-14 name, no
      descriptor) gets a complete synthesized program
      (:func:`truetype.synthesize_ttf`) covering every char the merged
      CMap can produce, a new /FontDescriptor, and /Subtype /TrueType
      so the /FontFile2 is conforming (ISO 32000-1 §9.8.1 + Table 127).
      Unlike the reference we do NOT rename /BaseFont//FontName: the
      reference renames to an external replacement font's name table
      entry (embedding.py:117-123); here the program extends the font
      the document already declares. A malformed embedded program
      degrades gracefully to the r3 behavior (bookkeeping-only merge,
      no embed) rather than canceling the replacement.

    Returns None when the font is not incrementally updatable (inlined
    font dict — no object to override). The returned dict may span
    2-3 NEW object numbers starting at *next_num*; callers allocate
    their next object at ``max(returned) + 1``."""
    ref = doc.page_font_refs(page).get(font_name)
    if ref is None:
        return None
    fdict = doc.resolve(ref)
    if not isinstance(fdict, dict):
        return None
    merged = merge_cmaps(current_mapping, new_entries)
    cmap_body = _flate_stream_body(
        build_tounicode_stream(merged).encode("latin1")
    )
    new_font = dict(fdict)
    new_font["ToUnicode"] = Ref(next_num, 0)
    # /Differences: additive, preserving any existing array
    enc = doc.resolve(fdict.get("Encoding"))
    if isinstance(enc, dict):
        enc_dict = dict(enc)
        diffs = list(doc.resolve(enc_dict.get("Differences")) or [])
    else:
        enc_dict = {"Type": Name("Encoding")}
        if isinstance(enc, Name):
            enc_dict["BaseEncoding"] = enc
        diffs = []
    for code in sorted(new_entries):
        diffs.extend([code, Name(f"uni{ord(new_entries[code]):04X}")])
    enc_dict["Differences"] = diffs
    new_font["Encoding"] = enc_dict
    # /Widths: extend the declared range to cover the new codes
    widths = doc.resolve(fdict.get("Widths"))
    first_char = doc.resolve(fdict.get("FirstChar"))
    avg = 500  # PDF default-ish advance; also the A6 gap fill
    code_width: dict[int, int] = {}
    if isinstance(widths, list) and isinstance(first_char, (int, float)):
        w = [int(doc.resolve(x)) for x in widths]
        avg = round(sum(w) / len(w)) if w else 500
        first = int(first_char)
        code_width = {first + i: wi for i, wi in enumerate(w)}
        last = first + len(w) - 1
        for code in sorted(new_entries):
            if code < first:
                w = [avg] * (first - code) + w
                first = code
            elif code > last:
                w = w + [avg] * (code - last)
                last = code
        new_font["FirstChar"] = first
        new_font["LastChar"] = last
        new_font["Widths"] = w
    out = {next_num: cmap_body}

    # ---- glyph programs for the inserted codes (embedding.py:91-127)
    new_char_widths = {
        ch: code_width.get(code, avg) for code, ch in new_entries.items()
    }
    desc = doc.resolve(fdict.get("FontDescriptor"))
    ff_ref = desc.get("FontFile2") if isinstance(desc, dict) else None
    embedded = doc.resolve(ff_ref) if ff_ref is not None else None
    prog_num = next_num + 1
    if isinstance(embedded, Stream):
        # subset-append into the existing program; fresh stream + fresh
        # descriptor so objects shared between fonts are never mutated
        try:
            ttf = add_glyphs(doc.stream_bytes(embedded), new_char_widths)
        except Exception:  # a program that fails to DECODE (bad filter
            # bytes) must degrade the same way as one that fails to
            # PARSE (TrueTypeError): bookkeeping-only merge
            ttf = None
        if ttf is not None:
            new_desc = dict(desc)
            new_desc["FontFile2"] = Ref(prog_num, 0)
            out[prog_num] = Stream(
                {"Filter": Name("FlateDecode"), "Length1": len(ttf)},
                zlib.compress(ttf, 6),
            )
            out[prog_num + 1] = new_desc
            new_font["FontDescriptor"] = Ref(prog_num + 1, 0)
    else:
        # non-embedded (base-14 name): synthesize a complete program
        # covering everything the merged CMap can produce, so the
        # document becomes self-contained for the whole font
        base = fdict.get("BaseFont")
        ps_name = str(base) if isinstance(base, Name) else "PdfParserSynth"
        rev = {ch: code for code, ch in merged.items()}
        all_chars = {
            ch: code_width.get(code, avg)
            for ch, code in rev.items()
            if len(ch) == 1
        }
        ttf = synthesize_ttf(all_chars, ps_name=ps_name)
        out[prog_num] = Stream(
            {"Filter": Name("FlateDecode"), "Length1": len(ttf)},
            zlib.compress(ttf, 6),
        )
        out[prog_num + 1] = {
            "Type": Name("FontDescriptor"),
            "FontName": Name(ps_name),
            "Flags": 32,  # nonsymbolic — /Differences lookups apply
            "FontBBox": [0, -240, 1000, 800],
            "ItalicAngle": 0,
            "Ascent": 760,
            "Descent": -240,
            "CapHeight": 660,
            "StemV": 80,
            "FontFile2": Ref(prog_num, 0),
        }
        new_font["FontDescriptor"] = Ref(prog_num + 1, 0)
        new_font["Subtype"] = Name("TrueType")
    out[ref.num] = new_font
    return out


# --------------------------------------------------------------------------
# the replace engine


@dataclass
class ReplaceResult:
    data: bytes  # output document (original bytes when unchanged)
    changed: bool
    success: bool
    replacements: int = 0
    log: list[tuple[str, str]] = field(default_factory=list)


def replace_text(
    pdf_data: bytes,
    target_text: str,
    replacement_text: str,
    page_num: int = 0,
    instance_index: int = -1,
    allow_auto_insert: bool = False,
) -> ReplaceResult:
    """Replace occurrences of *target_text* on one page.

    ``instance_index=-1`` replaces every matching segment on the page;
    ``k >= 0`` replaces only the k-th match (F7). See the module
    docstring for the reproduced semantics and declared differences.

    ``allow_auto_insert=True`` enables the WORKING form of the
    reference's broken aspiration (fonts/embedding.py:11-230): each
    replacement char missing from the census ∪ reverse-CMap domain gets
    a safe code (E1, allocate_safe_code), the target font's ToUnicode is
    extended via merge (E3) and written as a new stream through the
    incremental-update sink, /Differences and /Widths are reconciled,
    a GLYPH PROGRAM is embedded for every inserted code (subset-append
    into an existing /FontFile2, or a complete synthesized TrueType
    program for non-embedded fonts — see font_update_objects), and the
    splice uses the allocated code — so our reader round-trips the
    inserted character exactly and a conforming renderer has an
    outline to draw."""
    log: list[tuple[str, str]] = []

    def _log(level: str, msg: str) -> None:
        log.append((level, msg))

    if target_text == replacement_text:  # F6
        _log("WARNING", "Target and replacement are identical, skipping")
        return ReplaceResult(pdf_data, False, False, 0, log)

    try:
        doc = PdfDocument(pdf_data)
        pages = doc.pages()
    except (PdfError, ValueError) as exc:
        _log("ERROR", f"cannot open PDF: {exc}")
        return ReplaceResult(pdf_data, False, False, 0, log)
    if page_num < 0 or page_num >= len(pages):
        _log("ERROR", f"page {page_num} out of range (0..{len(pages) - 1})")
        return ReplaceResult(pdf_data, False, False, 0, log)

    page_cmaps = [_font_cmaps_and_metrics(doc, p)[0] for p in pages]
    all_pdf_chars, all_char_codes, used_codes, all_texts = _census(
        doc, pages, page_cmaps
    )

    # ---- validation E2 (replacer.py:375-467)
    target_font = next((f for f, t in all_texts if t == target_text), None)
    if target_font is not None and target_font in all_pdf_chars:
        allowed = set(all_pdf_chars[target_font])
        _log(
            "INFO",
            f"Found target text font: {target_font}, "
            f"contains {len(allowed)} characters",
        )
    else:
        _log("WARNING", "Could not determine target font, checking all fonts")
        allowed = set().union(*all_pdf_chars.values()) if all_pdf_chars else set()
    reverse_domain: set[str] = set()
    if target_font is not None:
        cm = next(
            (pc[target_font] for pc in page_cmaps if target_font in pc), None
        )
        if cm is not None:
            reverse_domain = set(cm.reverse())
    unsupported = [
        ch
        for ch in replacement_text
        if ch not in allowed and ch not in " \t\n\r" and ch not in reverse_domain
    ]
    auto_entries: dict[int, str] = {}
    font_updates: dict[int, bytes] | None = None
    base_next = doc.max_object_number() + 1
    if unsupported and not allow_auto_insert:
        for ch in unsupported:
            _log(
                "WARNING",
                f"Font {target_font or 'unknown'} missing character "
                f"'{ch}', replacement canceled",
            )
        return ReplaceResult(pdf_data, False, False, 0, log)
    if unsupported:
        # ---- auto-insert E1+E3 (the reference's intended
        # update_pdf_font_mapping flow, done through our own writer)
        page_cm = page_cmaps[page_num].get(target_font) if target_font else None
        if target_font is None or page_cm is None:
            _log(
                "ERROR",
                "auto-insert requires the target font on the target page; "
                "replacement canceled",
            )
            return ReplaceResult(pdf_data, False, False, 0, log)
        taken = set(used_codes.get(target_font, set())) | set(page_cm.mapping)
        for ch in dict.fromkeys(unsupported):
            code = allocate_safe_code(taken, already_used=set(auto_entries))
            if code is None:
                _log("ERROR", f"no safe code available for '{ch}', canceled")
                return ReplaceResult(pdf_data, False, False, 0, log)
            auto_entries[code] = ch
            taken.add(code)
        font_updates = font_update_objects(
            doc,
            pages[page_num],
            target_font,
            auto_entries,
            page_cm.mapping,
            next_num=base_next,
        )
        if font_updates is None:
            _log(
                "ERROR",
                f"font {target_font} is not incrementally updatable "
                "(inlined font dict); replacement canceled",
            )
            return ReplaceResult(pdf_data, False, False, 0, log)
        for code, ch in auto_entries.items():
            _log(
                "INFO",
                f"Auto-insert: '{ch}' → code 0x{code:02X} in {target_font}",
            )

    # ---- rewrite loop (replacer.py:469-802) on the target page only
    cmaps = page_cmaps[page_num]
    content_raw = doc.page_content_bytes(pages[page_num]).decode("latin1")
    new_segments: list[str] = []
    current_pos = 0
    current_font: str | None = None
    current_instance = 0
    changed = False
    n_replacements = 0

    for segment in _SEGMENT_RE.finditer(content_raw):
        if segment.start() > current_pos:
            new_segments.append(content_raw[current_pos : segment.start()])
        seg_text = segment.group(0)

        fm = _FONT_RE.search(seg_text)
        if fm:
            current_font = "/" + fm.group(1)
            new_segments.append(seg_text)
            current_pos = segment.end()
            continue

        tmatch = _TEXT_RE.search(seg_text)
        if tmatch and current_font in cmaps:
            is_tj = seg_text.strip().endswith("TJ")
            inner = tmatch.group(2) if is_tj else tmatch.group(1)
            raw = inner.replace("\\", "").encode("latin1")  # T5
            decoded = cmaps[current_font].decode(raw)
            if decoded == target_text:
                if instance_index >= 0:  # F7 gate
                    if current_instance != instance_index:
                        current_instance += 1
                        new_segments.append(seg_text)
                        current_pos = segment.end()
                        continue
                    current_instance += 1
                _log(
                    "INFO",
                    f"({current_font}) Replacing: {decoded} → {replacement_text}",
                )
                # J3 per-char code lookup: census codes first (lowest
                # code — deterministic where the reference takes set
                # order), then the reverse CMap
                font_codes = all_char_codes.get(current_font, {})
                reverse_map = cmaps[current_font].reverse()
                if auto_entries and current_font == target_font:
                    for code, ch in auto_entries.items():
                        reverse_map.setdefault(ch, code)
                new_codes: list[int] = []
                for ch in replacement_text:
                    if ch in font_codes and font_codes[ch]:
                        new_codes.append(min(font_codes[ch]))
                    elif ch in reverse_map:
                        new_codes.append(reverse_map[ch])
                    else:
                        _log(
                            "WARNING",
                            f"Character '{ch}' not available in font. "
                            "Auto-insert disabled.",
                        )
                        break
                if len(new_codes) < len(replacement_text):  # partial guard
                    _log(
                        "WARNING",
                        "Partial replacement not allowed with auto-insert "
                        "disabled. Preserving original text.",
                    )
                    new_segments.append(seg_text)
                    current_pos = segment.end()
                    continue
                new_str = escape_pdf_string(bytes(new_codes).decode("latin1"))
                if is_tj:  # splice J5 — same str.replace as the reference
                    seg_out = seg_text.replace(
                        f"[{tmatch.group(2)}]", f"[({new_str})]"
                    )
                else:
                    seg_out = seg_text.replace(
                        f"({tmatch.group(1)})", f"({new_str})"
                    )
                new_segments.append(seg_out)
                changed = True
                n_replacements += 1
            else:
                new_segments.append(seg_text)
        else:
            new_segments.append(seg_text)
        current_pos = segment.end()

    if current_pos < len(content_raw):
        new_segments.append(content_raw[current_pos:])

    if not changed:
        _log("WARNING", f"Text not found on page {page_num}: {target_text}")
        return ReplaceResult(pdf_data, False, False, 0, log)

    new_content = "".join(new_segments).encode("latin1")
    # the font update (when present) consumed base_next.. for its new
    # ToUnicode stream / glyph program / descriptor; content objects
    # allocate after the highest number it took
    content_next = max(font_updates) + 1 if font_updates else base_next
    updates = content_update_objects(
        doc, page_num, new_content, next_num=content_next
    )
    if font_updates:
        updates.update(font_updates)
    out = incremental_update(pdf_data, doc, updates)
    _log("SUCCESS", f"Replaced {n_replacements} occurrence(s) on page {page_num}")
    return ReplaceResult(out, True, True, n_replacements, log)


# --------------------------------------------------------------------------
# J4/S5: template ⋈ replacement-columns batch (reference pdf_gui.py:1671-1758)


def sanitize_tag(tag: str) -> str:
    """Output-name tag sanitizer (pdf_gui.py:1694): keep alnum/_/-."""
    return "".join(ch for ch in tag if ch.isalnum() or ch in ("_", "-"))


def batch_replace(
    data: bytes,
    template_texts: list[str],
    replacement_columns: list[list[str]],
    page_num: int = 0,
) -> dict[str, ReplaceResult]:
    """J4 (reference pdf_gui.py:1689-1758): one output document per
    replacement column; within a column, the template targets are
    replaced SEQUENTIALLY (each rewrite chains on the previous output,
    like the reference's copy-then-replace loop), skipping pairs where
    either side is empty. Keys are the column's sanitized first
    non-empty value, or ``colN``; a key that collides with an earlier
    column's (e.g. two tags sanitizing identically) is suffixed
    ``_colN`` so no column's output is silently dropped."""
    out: dict[str, ReplaceResult] = {}
    for idx, col in enumerate(replacement_columns, start=1):
        tag = next((v for v in col if v), "") or f"col{idx}"
        key = sanitize_tag(tag) or f"col{idx}"
        if key in out:
            key = f"{key}_col{idx}"
        current = data
        total = 0
        logs: list[tuple[str, str]] = []
        for target, repl in zip(template_texts, col):
            if not target or not repl:
                continue
            r = replace_text(current, target, repl, page_num)
            current = r.data
            total += r.replacements
            logs.extend(r.log)
        out[key] = ReplaceResult(current, current != data, total > 0, total, logs)
    return out


def load_replacement_table(path: str) -> tuple[list[str], list[list[str]]]:
    """S5: read a header-less replacement table (column 0 = template
    texts, columns 1..N = replacement sets) from .xlsx or CSV.

    The reference reads .xlsx via pandas/openpyxl (pdf_gui.py:1671);
    openpyxl is absent here, so xlsx goes through the pure-Python
    zip+XML reader (sources/xlsx.py — matching the reference's file
    surface), with CSV kept as the plain-text path. At corpus scale the
    same table loads once and broadcasts."""
    with open(path, "rb") as fh:
        is_zip = fh.read(2) == b"PK"
    if is_zip:
        from ..sources.xlsx import read_xlsx

        rows = [r for r in read_xlsx(path) if any(v for v in r)]
    else:
        import csv

        with open(path, newline="", encoding="utf-8") as fh:
            rows = [r for r in csv.reader(fh) if r]
    if not rows or len(rows[0]) < 2:
        raise ValueError("replacement table needs >= 2 columns")
    width = max(len(r) for r in rows)
    rows = [r + [""] * (width - len(r)) for r in rows]
    template = [r[0] for r in rows]
    columns = [[r[c] for r in rows] for c in range(1, width)]
    return template, columns
