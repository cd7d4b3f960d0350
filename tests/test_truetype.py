"""Glyph-program embedding on the auto-insert write path (VERDICT r3
item 3 — the last reference-parity gap, fonts/embedding.py:91-127):
the pure-Python sfnt kernel (pdfcore/truetype.py) and its integration
into replace_text(allow_auto_insert=True).

Criterion (from the verdict): the updated font's glyph tables parse
and contain an outline for every newly-allocated code.
"""

import struct

import pytest

from pdf_parser_spark.pdfcore.document import PdfDocument
from pdf_parser_spark.pdfcore.extract import extract_pdf
from pdf_parser_spark.pdfcore.rewrite import replace_text
from pdf_parser_spark.pdfcore.truetype import (
    TrueTypeError,
    add_glyphs,
    cmap_coverage,
    glyph_has_outline,
    parse_ttf,
    synthesize_ttf,
)
from pdf_parser_spark.pdfgen import text_to_pdf


def _font_program(data: bytes, page: int = 0) -> tuple[dict, bytes]:
    """(font dict, decoded /FontFile2 bytes) of the first page font."""
    doc = PdfDocument(data)
    ref = list(doc.page_font_refs(doc.pages()[page]).values())[0]
    fdict = doc.resolve(ref)
    desc = doc.resolve(fdict.get("FontDescriptor"))
    assert isinstance(desc, dict), "font has no /FontDescriptor"
    ff = doc.resolve(desc.get("FontFile2"))
    assert ff is not None, "descriptor has no /FontFile2"
    return fdict, doc.stream_bytes(ff)


# ------------------------------------------------------------ kernel


class TestKernel:
    def test_synthesize_parses_and_covers(self):
        chars = {"A": 600, "±": 500, "€": 750, "§": 450, "z": 400}
        ttf = synthesize_ttf(chars)
        font = parse_ttf(ttf)
        assert font.units_per_em == 1000
        # .notdef + one glyph per char
        assert len(font.glyphs) == 1 + len(chars)
        for ch, width in chars.items():
            gid = font.cmap[ord(ch)]
            assert font.has_outline(gid)
            assert font.hmetrics[gid][0] == width
        # .notdef itself has a visible box
        assert font.has_outline(0)

    def test_synthesize_deterministic(self):
        chars = {"q": 500, "Ω": 700}
        assert synthesize_ttf(chars) == synthesize_ttf(chars)

    def test_whole_font_checksum(self):
        """head.checkSumAdjustment must make the whole-file checksum
        0xB1B0AFBA (sfnt spec) — the validity check real shapers run."""
        ttf = synthesize_ttf({"a": 500, "b": 600})
        data = ttf + b"\x00" * ((-len(ttf)) % 4)
        s = 0
        for (w,) in struct.iter_unpack(">I", data):
            s = (s + w) & 0xFFFFFFFF
        assert s == 0xB1B0AFBA

    def test_cmap_format4_roundtrip_scattered(self):
        """Scattered, non-contiguous codes through build → parse."""
        chars = {chr(c): 400 + (c % 7) * 10 for c in
                 [0x20, 0x21, 0x41, 0x5A, 0xB1, 0xA7, 0x20AC, 0x4E2D, 0xFB01]}
        cov = cmap_coverage(synthesize_ttf(chars))
        assert set(cov) == {ord(c) for c in chars}
        # distinct chars map to distinct glyph ids
        assert len(set(cov.values())) == len(cov)

    def test_add_glyphs_retain_gids(self):
        base = synthesize_ttf({"a": 500, "b": 600})
        f0 = parse_ttf(base)
        grown = add_glyphs(base, {"€": 750, "±": 450})
        f1 = parse_ttf(grown)
        # existing ids/outlines/metrics byte-preserved, new appended
        assert f1.glyphs[: len(f0.glyphs)] == f0.glyphs
        assert f1.hmetrics[: len(f0.hmetrics)] == f0.hmetrics
        assert len(f1.glyphs) == len(f0.glyphs) + 2
        for ch in "€±ab":
            assert glyph_has_outline(grown, ord(ch))

    def test_add_glyphs_existing_covered_untouched(self):
        base = synthesize_ttf({"a": 500})
        assert add_glyphs(base, {"a": 999}) == add_glyphs(base, {"a": 500})
        assert parse_ttf(add_glyphs(base, {"a": 999})).hmetrics[1] == (500, 50)

    def test_add_glyphs_scales_widths_to_upm(self):
        """PDF /Widths are 1/1000 text-space; a 2048-upm font must get
        advances scaled by upm/1000."""
        base = synthesize_ttf({"a": 500})
        f = parse_ttf(base)
        f2048 = bytearray(base)
        # patch unitsPerEm in head: find head table offset
        (n,) = struct.unpack_from(">H", base, 4)
        for i in range(n):
            tag, _cs, off, _l = struct.unpack_from(">4sIII", base, 12 + 16 * i)
            if tag == b"head":
                struct.pack_into(">H", f2048, off + 18, 2048)
        grown = parse_ttf(add_glyphs(bytes(f2048), {"€": 750}))
        gid = grown.cmap[ord("€")]
        assert grown.hmetrics[gid][0] == round(750 * 2048 / 1000)

    def test_parse_rejects_garbage(self):
        with pytest.raises(TrueTypeError):
            parse_ttf(b"not a font at all---")
        with pytest.raises(TrueTypeError):
            parse_ttf(b"\x00\x01\x00\x00" + b"\x00" * 8)  # no tables


# ----------------------------------------------------- write-path hook


class TestAutoInsertEmbedding:
    def test_synthesized_program_for_nonembedded_font(self):
        """Base-14 font (no descriptor): auto-insert must attach a
        complete synthesized /FontFile2 + /FontDescriptor and flip
        /Subtype to /TrueType; every allocated code has an outline."""
        pdf = text_to_pdf("Hello World\nsecond line")
        r = replace_text(pdf, "Hello World", "Hello ±§ World",
                         allow_auto_insert=True)
        assert r.success, r.log
        assert extract_pdf(r.data).text == "Hello ±§ World\nsecond line"
        fdict, ttf = _font_program(r.data)
        assert str(fdict.get("Subtype")) == "TrueType"
        for ch in "±§":
            assert glyph_has_outline(ttf, ord(ch)), ch
        # the program covers the font's whole merged CMap domain, so
        # the document is self-contained for every decodable char
        doc = PdfDocument(r.data)
        cov = cmap_coverage(ttf)
        assert ord("H") in cov and ord("d") in cov

    def test_append_into_existing_program(self):
        """Second auto-insert on the now-embedded font must take the
        add_glyphs subset-append path: old outlines byte-identical at
        the same glyph ids, the new code appended with an outline."""
        pdf = text_to_pdf("Hello World\nsecond line")
        r1 = replace_text(pdf, "Hello World", "Hello ± World",
                          allow_auto_insert=True)
        assert r1.success, r1.log
        r2 = replace_text(r1.data, "Hello ± World", "Hello ±€ World",
                          allow_auto_insert=True)
        assert r2.success, r2.log
        assert extract_pdf(r2.data).text == "Hello ±€ World\nsecond line"
        _, t1 = _font_program(r1.data)
        _, t2 = _font_program(r2.data)
        f1, f2 = parse_ttf(t1), parse_ttf(t2)
        assert f2.glyphs[: len(f1.glyphs)] == f1.glyphs
        assert f2.hmetrics[: len(f1.hmetrics)] == f1.hmetrics
        assert glyph_has_outline(t2, ord("€"))

    def test_malformed_program_degrades_to_bookkeeping(self):
        """A corrupt embedded /FontFile2 must NOT cancel the rewrite:
        the r3 bookkeeping-only merge still lands and extraction
        round-trips (the descriptor keeps the old program)."""
        pdf = text_to_pdf("Hello World\nsecond line")
        r1 = replace_text(pdf, "Hello World", "Hello ± World",
                          allow_auto_insert=True)
        assert r1.success
        # clobber the program bytes inside the update body
        doc = PdfDocument(r1.data)
        ref = list(doc.page_font_refs(doc.pages()[0]).values())[0]
        desc = doc.resolve(doc.resolve(ref)["FontDescriptor"])
        ffref = desc["FontFile2"]
        # locate the deflate payload by its compressed bytes and flip a
        # byte IN PLACE (same length — xref offsets stay valid); the
        # program then fails to inflate, the hardest corruption class
        obj = doc.resolve(ffref)
        comp = obj.raw
        bad = r1.data.replace(
            comp, comp[:10] + bytes([comp[10] ^ 0xFF]) + comp[11:]
        )
        assert bad != r1.data, "could not locate program bytes"
        r2 = replace_text(bad, "Hello ± World", "Hello ±€ World",
                          allow_auto_insert=True)
        assert r2.success, r2.log
        assert extract_pdf(r2.data).text == "Hello ±€ World\nsecond line"

    def test_encrypted_autoinsert_embeds(self):
        """Auto-insert into an ENCRYPTED document: the glyph-program
        stream is encrypted by the incremental writer and decrypts
        back to a parsable font."""
        from pdf_parser_spark.pdfgen import make_text_pdf

        pdf = make_text_pdf([["Hello World", "second line"]],
                            encrypted=True, encrypt_revision=4)
        r = replace_text(pdf, "Hello World", "Hello ± World",
                         allow_auto_insert=True)
        assert r.success, r.log
        assert "Hello ± World" in extract_pdf(r.data).text
        _, ttf = _font_program(r.data)
        assert glyph_has_outline(ttf, ord("±"))
