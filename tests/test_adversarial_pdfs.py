"""Adversarial real-world-shape goldens (VERDICT r3 item 8):
generator-diverse documents exercising paths the self-generated
corpus (pdfgen/writer.py) structurally cannot — Linearized headers,
multi-generation incremental chains with gen > 0 objects, mixed
filter cascades, UTF-16BE outline strings, and headers not at byte 0.

Every document here is hand-assembled byte-by-byte so the exact
file shape is pinned, not whatever our own writer happens to emit.
The behavioral bar: extraction must succeed cleanly (error=None,
recovered=False unless the shape is genuinely broken) and produce the
expected text.
"""

import base64
import zlib

from pdf_parser_spark.pdfcore.extract import extract_pdf
from pdf_parser_spark.pdfcore.document import PdfDocument


def _content(text: str) -> bytes:
    return f"BT /F1 12 Tf 72 720 Td ({text}) Tj ET".encode("latin1")


def _classic_pdf(objects: dict[int, bytes], root: int = 1,
                 header: bytes = b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n") -> bytes:
    """Assemble numbered object bodies into a classic-xref PDF."""
    out = bytearray(header)
    offsets: dict[int, int] = {}
    for num in sorted(objects):
        offsets[num] = len(out)
        out += b"%d 0 obj\n" % num + objects[num] + b"\nendobj\n"
    xref_at = len(out)
    size = max(objects) + 1
    out += b"xref\n0 %d\n" % size
    out += b"0000000000 65535 f \n"
    for num in range(1, size):
        if num in offsets:
            out += b"%010d 00000 n \n" % offsets[num]
        else:
            out += b"0000000000 65535 f \n"
    out += (
        b"trailer\n<< /Size %d /Root %d 0 R >>\nstartxref\n%d\n%%%%EOF\n"
        % (size, root, xref_at)
    )
    return bytes(out)


def _base_objects(text: str, content_extra: bytes = b"") -> dict[int, bytes]:
    content = _content(text) + content_extra
    return {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        3: (b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            b"/Resources << /Font << /F1 5 0 R >> >> /Contents 4 0 R >>"),
        4: b"<< /Length %d >>\nstream\n" % len(content) + content
           + b"\nendstream",
        5: (b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica "
            b"/Encoding /WinAnsiEncoding >>"),
    }


def test_handbuilt_baseline_extracts():
    pdf = _classic_pdf(_base_objects("plain baseline"))
    r = extract_pdf(pdf)
    assert r.error is None and not r.recovered
    assert r.text == "plain baseline"


def test_linearized_header_object():
    """Linearization parameter dict as the FIRST object in the file
    (ISO 32000-1 Annex F): a reader must treat it as an ordinary,
    unreferenced object — not a catalog, not an error."""
    objs = _base_objects("linearized body")
    body_len = 2048  # approximate /L is legal; hints are advisory
    objs_lin = {
        6: (b"<< /Linearized 1 /L %d /H [0 0] /O 3 /E 512 /N 1 /T 1024 >>"
            % body_len),
    }
    # linearized files put the param dict first: emit object 6 first by
    # assembling manually with 6 lowest in file order
    out = bytearray(b"%PDF-1.4\n")
    offsets = {}
    for num in [6, 1, 2, 3, 4, 5]:
        offsets[num] = len(out)
        out += b"%d 0 obj\n" % num + {**objs, **objs_lin}[num] + b"\nendobj\n"
    xref_at = len(out)
    out += b"xref\n0 7\n0000000000 65535 f \n"
    for num in range(1, 7):
        out += b"%010d 00000 n \n" % offsets[num]
    out += (b"trailer\n<< /Size 7 /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n"
            % xref_at)
    r = extract_pdf(bytes(out))
    assert r.error is None and not r.recovered
    assert r.text == "linearized body"


def test_filter_cascade_flate_then_ascii85():
    """/Filter [/ASCII85Decode /FlateDecode] — encoded as deflate
    wrapped in ascii85, decoded in array order (§7.4): a shape mixed-
    generator corpora hit but single-filter writers never emit."""
    content = _content("cascade text")
    enc = base64.a85encode(zlib.compress(content)) + b"~>"
    objs = _base_objects("ignored")
    objs[4] = (b"<< /Length %d /Filter [/ASCII85Decode /FlateDecode] >>"
               b"\nstream\n" % len(enc) + enc + b"\nendstream")
    r = extract_pdf(_classic_pdf(objs))
    assert r.error is None and not r.recovered
    assert r.text == "cascade text"


def test_filter_cascade_runlength_then_flate_via_names():
    """Cascade spelled with abbreviated /DP + single-name /Filter list
    [/RunLengthDecode /FlateDecode]."""
    from pdf_parser_spark.pdfcore.filters import runlength_encode

    content = _content("rle cascade")
    enc = runlength_encode(zlib.compress(content))
    objs = _base_objects("ignored")
    objs[4] = (b"<< /Length %d /Filter [/RunLengthDecode /FlateDecode] >>"
               b"\nstream\n" % len(enc) + enc + b"\nendstream")
    r = extract_pdf(_classic_pdf(objs))
    assert r.error is None and not r.recovered
    assert r.text == "rle cascade"


def test_multigeneration_incremental_chain():
    """Two incremental updates; the second frees the original content
    stream and reuses its object NUMBER at generation 1 (the free-list
    reuse real multi-writer chains produce). The page is updated to
    reference `4 1 R`; extraction must show the newest text, and the
    original bytes must still be verbatim at the front (§7.5.6)."""
    base = _classic_pdf(_base_objects("generation zero"))
    # ---- update 1: override content (still gen 0)
    c1 = _content("generation zero prime")
    upd1 = bytearray(base)
    off4 = len(upd1)
    upd1 += b"4 0 obj\n<< /Length %d >>\nstream\n" % len(c1) + c1
    upd1 += b"\nendstream\nendobj\n"
    import re

    x1 = len(upd1)
    prev0 = int(re.search(rb"startxref\s+(\d+)", base).group(1))
    upd1 += b"xref\n4 1\n%010d 00000 n \n" % off4
    upd1 += (b"trailer\n<< /Size 6 /Root 1 0 R /Prev %d >>\n"
             b"startxref\n%d\n%%%%EOF\n" % (prev0, x1))
    r1 = extract_pdf(bytes(upd1))
    assert r1.error is None and r1.text == "generation zero prime"
    # ---- update 2: free object 4, recreate it at GENERATION 1, and
    # point the updated page at `4 1 R`
    c2 = _content("generation one wins")
    upd2 = bytearray(upd1)
    off4g1 = len(upd2)
    upd2 += b"4 1 obj\n<< /Length %d >>\nstream\n" % len(c2) + c2
    upd2 += b"\nendstream\nendobj\n"
    off3 = len(upd2)
    upd2 += (b"3 0 obj\n<< /Type /Page /Parent 2 0 R "
             b"/MediaBox [0 0 612 792] "
             b"/Resources << /Font << /F1 5 0 R >> >> /Contents 4 1 R >>"
             b"\nendobj\n")
    x2 = len(upd2)
    upd2 += b"xref\n3 2\n"
    upd2 += b"%010d 00000 n \n" % off3
    upd2 += b"%010d 00001 n \n" % off4g1
    upd2 += (b"trailer\n<< /Size 6 /Root 1 0 R /Prev %d >>\n"
             b"startxref\n%d\n%%%%EOF\n" % (x1, x2))
    final = bytes(upd2)
    assert final.startswith(base)  # incremental chain preserved
    r2 = extract_pdf(final)
    assert r2.error is None and not r2.recovered
    assert r2.text == "generation one wins"
    assert PdfDocument(final).object_generation(4) == 1
    # the recovery scan must agree with the xref chain on this file:
    # last-occurrence-wins replays the same precedence
    broken = re.sub(rb"startxref\s+\d+(?=\s*%%EOF\s*$)",
                    b"startxref\n999999999", final)
    rb_ = extract_pdf(broken)
    assert rb_.recovered and rb_.text == "generation one wins"


def test_utf16be_outline_titles():
    """Outline tree with UTF-16BE /Title strings (BOM FE FF, §7.9.2.2)
    whose payload bytes include ')' and '\\\\' — strings a naive
    paren-counter mis-parses. The lexer must track escapes correctly
    and extraction of page text must be unaffected."""
    title = "Chapter ±1 — naïve)"
    enc = b"\xfe\xff" + title.encode("utf-16-be")
    esc = (enc.replace(b"\\", b"\\\\")
              .replace(b"(", b"\\(")
              .replace(b")", b"\\)"))
    objs = _base_objects("outline body")
    objs[1] = b"<< /Type /Catalog /Pages 2 0 R /Outlines 6 0 R >>"
    objs[6] = b"<< /Type /Outlines /First 7 0 R /Last 7 0 R /Count 1 >>"
    objs[7] = (b"<< /Title (" + esc + b") /Parent 6 0 R "
               b"/Dest [3 0 R /XYZ 0 792 null] >>")
    pdf = _classic_pdf(objs)
    r = extract_pdf(pdf)
    assert r.error is None and not r.recovered
    assert r.text == "outline body"
    # and the lexer round-trips the title bytes exactly
    doc = PdfDocument(pdf)
    t = doc.resolve(doc.resolve(
        doc.resolve(doc.trailer["Root"])["Outlines"])["First"])["Title"]
    raw = t.encode("latin1") if isinstance(t, str) else bytes(t)
    assert raw == enc


def test_header_not_at_byte_zero():
    """%PDF header preceded by junk (HTTP banner / shell noise —
    §7.5.2 allows the header within the first 1024 bytes, and real
    crawl payloads show it). Offsets in such files are usually written
    relative to the %PDF position; both fixups must extract."""
    junk = b"<!-- proxy banner -->\r\n\r\n"
    base = _classic_pdf(_base_objects("offset header"))
    r = extract_pdf(junk + base)
    assert r.error is None
    assert r.text == "offset header"


def test_stream_length_as_indirect_ref():
    """/Length as an indirect reference (extremely common in the wild;
    our writer always inlines it)."""
    content = _content("indirect length")
    objs = _base_objects("ignored")
    objs[4] = (b"<< /Length 6 0 R >>\nstream\n" + content + b"\nendstream")
    objs[6] = b"%d" % len(content)
    r = extract_pdf(_classic_pdf(objs))
    assert r.error is None and not r.recovered
    assert r.text == "indirect length"


def test_comments_and_whitespace_noise():
    """Comments between objects and inside dicts (§7.2.4), CRLF mixed
    with LF, and extra whitespace in the xref keyword lines."""
    objs = _base_objects("comment noise")
    objs[3] = (b"<< % page dict\r\n /Type /Page /Parent 2 0 R\r\n"
               b" /MediaBox [0 0 612 792] % letter\n"
               b" /Resources << /Font << /F1 5 0 R >> >>"
               b" /Contents 4 0 R >>")
    r = extract_pdf(_classic_pdf(objs))
    assert r.error is None
    assert r.text == "comment noise"


def test_reference_cycle_degrades_not_hangs():
    """A self-referential object (4 0 obj 4 0 R) and a 2-cycle (5<->6)
    must raise/degrade, never spin: pre-guard, resolve() looped forever
    on these, stalling an executor core on one malformed crawl row."""
    objs = _base_objects("unused")
    objs[3] = (b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
               b"/Contents 6 0 R >>")
    objs[4] = b"4 0 R"
    objs[5] = b"6 0 R"
    objs[6] = b"5 0 R"
    pdf = _classic_pdf(objs)
    import pytest

    from pdf_parser_spark.pdfcore.document import PdfError, Ref

    doc = PdfDocument(pdf)
    with pytest.raises(PdfError, match="reference cycle"):
        doc.resolve(Ref(4, 0))
    with pytest.raises(PdfError, match="reference cycle"):
        doc.resolve(Ref(5, 0))
    # the full extraction surface degrades to an error row
    r = extract_pdf(pdf)
    assert r.text == "" and "reference cycle" in (r.error or "")


def test_multi_hop_reference_chain_still_resolves():
    """Legal (acyclic) multi-hop indirection keeps working: /Contents
    -> 6 0 R -> 7 0 R -> the real stream."""
    content = _content("three hops")
    objs = _base_objects("ignored")
    objs[3] = (b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
               b"/Resources << /Font << /F1 5 0 R >> >> /Contents 6 0 R >>")
    objs[6] = b"7 0 R"
    objs[7] = b"<< /Length %d >>\nstream\n" % len(content) + content + b"\nendstream"
    del objs[4]
    r = extract_pdf(_classic_pdf(objs))
    assert r.error is None
    assert r.text == "three hops"


def test_objstm_containing_itself_degrades():
    """An xref stream whose index claims an object stream is stored
    compressed inside ITSELF (type-2 entry pointing at its own number)
    must raise PdfError, not recurse until the interpreter dies."""
    import pytest

    from pdf_parser_spark.pdfcore.document import PdfError

    header = b"%PDF-1.5\n%\xe2\xe3\xcf\xd3\n"
    out = bytearray(header)
    offsets = {}

    def emit(num, body):
        offsets[num] = len(out)
        out.extend(b"%d 0 obj\n" % num + body + b"\nendobj\n")

    emit(1, b"<< /Type /Catalog /Pages 2 0 R >>")
    emit(2, b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>")
    emit(3, b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            b"/Contents 4 0 R >>")
    # objects 4 and 6: claimed compressed in container 6 (see xref below)
    xref_num = 7
    xref_at = len(out)
    rows = []

    def row(t, a, b):
        rows.append(bytes([t]) + a.to_bytes(2, "big") + bytes([b]))

    row(0, 0, 255)                 # obj 0: free
    row(1, offsets[1], 0)          # 1-3: in file
    row(1, offsets[2], 0)
    row(1, offsets[3], 0)
    row(2, 6, 0)                   # obj 4: "inside container 6"
    row(0, 0, 255)                 # obj 5: free
    row(2, 6, 1)                   # obj 6: "inside container 6" (itself!)
    row(1, xref_at, 0)             # obj 7: this xref stream
    data = b"".join(rows)
    emit(xref_num,
         b"<< /Type /XRef /Size 8 /W [1 2 1] /Root 1 0 R /Length %d >>\n"
         b"stream\n" % len(data) + data + b"\nendstream")
    out.extend(b"startxref\n%d\n%%%%EOF\n" % xref_at)
    pdf = bytes(out)

    doc = PdfDocument(pdf)
    with pytest.raises(PdfError, match="contains itself"):
        doc.get_object(6)
    r = extract_pdf(pdf)
    assert r.text == "" and r.error is not None


def test_regex_backtracking_bounded():
    """Pathological inputs that made the C-level matchers exponential
    pre-fix (possessive quantifiers): a long whitespace run in a dict,
    a numeric array with the closing bracket corrupted, and 6-operand
    Tm commands with long numbers and a failing keyword. Each took
    seconds-to-unbounded before; bound them generously at 2s."""
    import time

    from pdf_parser_spark.pdfcore.lexer import _DICT_ENTRY_RE, _NUMARRAY_RE
    from pdf_parser_spark.pdfcore.tokenizer import _FAST_CMD_RE

    t0 = time.perf_counter()
    _DICT_ENTRY_RE.match(b" " * 50_000 + b"\x80")
    _NUMARRAY_RE.match(b"[" + b"123 " * 20_000 + b"\x80")
    num = b"9" * 20
    _FAST_CMD_RE.match(b" ".join([num] * 6) + b" Tx")
    assert time.perf_counter() - t0 < 2.0

    # a full document built around the hostile shapes still degrades
    # (or parses) promptly end-to-end
    objs = _base_objects("bounded")
    objs[3] = (b"<< /Type /Page /Parent 2 0 R" + b" " * 10_000 +
               b" /MediaBox [0 0 612 792] /Resources << /Font "
               b"<< /F1 5 0 R >> >> /Contents 4 0 R >>")
    t0 = time.perf_counter()
    r = extract_pdf(_classic_pdf(objs))
    assert time.perf_counter() - t0 < 2.0
    assert r.text == "bounded"


def test_flate_bomb_rejected_without_materializing():
    """A ~2 MB flate stream declaring 2 GiB of zeros must raise
    ValueError via the output cap (decompressobj max_length), not
    inflate: one hostile stream per core would OOM a 32-task stage."""
    import time
    import zlib

    import pytest

    from pdf_parser_spark.pdfcore.filters import (
        MAX_DECODED_STREAM_BYTES,
        flate_decode,
        lzw_decode,
        runlength_decode,
    )

    comp = zlib.compressobj(9)
    parts = [comp.compress(b"\x00" * (1 << 20)) for _ in range(2048)]
    parts.append(comp.flush())
    bomb = b"".join(parts)
    t0 = time.perf_counter()
    with pytest.raises(ValueError, match="exceeds"):
        flate_decode(bomb)
    with pytest.raises(ValueError, match="exceeds"):
        runlength_decode(b"\x81\x00" * (3 * 1024 * 1024))
    # Bound is generous on purpose: the guard itself is O(cap), but
    # faulting the 256 MiB capped buffer varies 0.7-13s on this
    # container (raw zlib.decompressobj().decompress(data, cap+1) of
    # the identical bytes measured at both extremes back-to-back).
    # Pre-fix behavior — materializing the full 2 GiB — takes minutes
    # and still trips this.
    assert time.perf_counter() - t0 < 60.0
    # tolerance behaviors preserved: trailing garbage and missing adler
    data = b"hello world " * 1000
    assert flate_decode(zlib.compress(data) + b"JUNK") == data
    assert flate_decode(zlib.compress(data)[:-4]) == data
    assert MAX_DECODED_STREAM_BYTES >= 64 * 1024 * 1024


def test_page_tree_shared_kid_explosion_bounded():
    """A Pages chain whose every node lists the same child TWICE is
    2^40 page-tree VISITS from 40 objects — it passes the depth guard
    (depth 41) and hung the walk pre-budget. Must degrade fast."""
    import time

    N = 40
    objs = {1: b"<< /Type /Catalog /Pages 2 0 R >>"}
    for k in range(2, 2 + N):
        objs[k] = (b"<< /Type /Pages /Kids [%d 0 R %d 0 R] /Count 2 >>"
                   % (k + 1, k + 1))
    leaf = 2 + N
    objs[leaf] = b"<< /Type /Page /MediaBox [0 0 612 792] >>"
    pdf = _classic_pdf(objs)
    t0 = time.perf_counter()
    r = extract_pdf(pdf)
    assert time.perf_counter() - t0 < 30.0
    assert "page tree too large" in (r.error or "")


def test_contents_array_amplification_bounded():
    """A /Contents array referencing the same stream thousands of times
    amplifies one stream into an unbounded concat; the per-page cap
    degrades the page instead (error recorded, doc-level walk survives)."""
    import zlib

    content = _content("amplified")
    # a ~1 MB decoded stream, flate-packed small
    big = b"% pad\n" * 200_000 + content
    comp = zlib.compress(big)
    objs = _base_objects("ignored")
    objs[3] = (b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
               b"/Resources << /Font << /F1 5 0 R >> >> /Contents 6 0 R >>")
    # 300 refs x ~1.4 MB decoded = ~420 MB > 256 MiB cap
    objs[6] = b"[" + b" ".join(b"7 0 R" for _ in range(300)) + b"]"
    objs[7] = (b"<< /Length %d /Filter /FlateDecode >>\nstream\n" % len(comp)
               + comp + b"\nendstream")
    del objs[4]
    import time

    t0 = time.perf_counter()
    r = extract_pdf(_classic_pdf(objs))
    assert time.perf_counter() - t0 < 30.0
    assert "contents array too large" in (r.error or "")
