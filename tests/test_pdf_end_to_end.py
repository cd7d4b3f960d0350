"""End-to-end golden tests: synthetic PDFs through the full kernel
(lexer → xref → filters → page tree → tokenizer → cmap), covering the
north-star axes: embedded-font ToUnicode (bfchar/bfrange), CID-code
skip, multi-column layout, /Contents arrays, object streams, xref
streams, FlateDecode."""

import pytest

from pdf_parser_spark.pdfcore import extract_pdf
from pdf_parser_spark.pdfgen import (
    FontSpec,
    build_pdf,
    expected_text_from_source,
    make_text_pdf,
    text_to_pdf,
)

VARIANTS = [
    ("classic", True, False),
    ("classic", False, False),
    ("xrefstream", True, False),
    ("xrefstream", True, True),
]


@pytest.mark.parametrize("variant,compress,objstm", VARIANTS)
def test_roundtrip_all_storage_variants(variant, compress, objstm):
    src = "Hello World\nsecond line\n\n  trimmed  \nnon-ascii: café\n(x) \\y\\"
    pdf = text_to_pdf(src, variant=variant, compress=compress, use_objstm=objstm)
    r = extract_pdf(pdf)
    assert r.error is None
    assert r.text == expected_text_from_source(src)


def test_multipage_and_instance_index():
    src = "\n".join(["repeat me"] * 3 + ["unique"])
    pdf = text_to_pdf(src, lines_per_page=2)
    r = extract_pdf(pdf)
    assert r.n_pages == 2
    assert r.text == expected_text_from_source(src)
    # instance_index: running count per distinct text across the doc
    # (reference api.py:136-149 semantics)
    idx = [(t, i) for (_, _, t, _, i) in r.items]
    assert idx == [("repeat me", 0), ("repeat me", 1), ("repeat me", 2), ("unique", 0)]


def test_contents_array_concatenation():
    pdf = make_text_pdf([["one", "two", "three", "four"]], contents_array=True)
    r = extract_pdf(pdf)
    assert r.text == "one\ntwo\nthree\nfour"


def test_two_column_stream_order_not_reading_order():
    lines = [f"L{i}" for i in range(6)]
    pdf = make_text_pdf([lines], two_column=True)
    r = extract_pdf(pdf)
    # right column (second half) is emitted first in the content stream
    assert r.text.split("\n") == ["L3", "L4", "L5", "L0", "L1", "L2"]


BFCHAR_CMAP = """/CIDInit /ProcSet findresource begin
begincmap
1 begincodespacerange
<00> <FF>
endcodespacerange
3 beginbfchar
<41> <0048>
<42> <0069>
<43> <0021>
endbfchar
endcmap
end
"""


def test_embedded_tounicode_bfchar():
    font = FontSpec(tounicode=BFCHAR_CMAP)
    pdf = make_text_pdf([["ABC"]], font=font)
    r = extract_pdf(pdf)
    assert r.text == "Hi!"


BFRANGE_CMAP = """begincmap
2 beginbfrange
<61> <7A> <0041>
<30> <39> <FF10>
endbfrange
endcmap
"""


def test_embedded_tounicode_bfrange():
    font = FontSpec(tounicode=BFRANGE_CMAP)
    pdf = make_text_pdf([["abc 09"]], font=font)
    r = extract_pdf(pdf)
    # a-z → A-Z, digits → fullwidth digits, space unmapped → '?'
    assert r.text == "ABC?０９"


CID_CMAP = """begincmap
2 beginbfchar
<0041> <4E2D>
<41> <0058>
endbfchar
1 beginbfrange
<0100> <0105> <0041>
endbfrange
endcmap
"""


def test_cid_keyed_codes_are_skipped():
    # >0xFF source codes silently dropped (reference cmap.py:24-26,35-37):
    # only the single-byte <41> entry survives
    font = FontSpec(tounicode=CID_CMAP)
    pdf = make_text_pdf([["AB"]], font=font)
    r = extract_pdf(pdf)
    assert r.text == "X?"


def test_font_without_tounicode_synthesizes_winansi():
    font = FontSpec(tounicode=None, encoding="WinAnsiEncoding")
    pdf = make_text_pdf([["plain ascii text!"]], font=font)
    r = extract_pdf(pdf)
    assert r.text == "plain ascii text!"


def test_not_a_pdf_reports_error():
    r = extract_pdf(b"<html><body>nope</body></html>")
    assert r.error is not None
    assert r.text == ""
    assert r.n_items == 0


def test_truncated_pdf_never_raises():
    """Half-truncation kills the xref tail; the recovery scan either
    salvages what parses (recovered=True) or reports a typed error —
    it must NEVER raise. (The pre-recovery contract was error-always;
    recovery upgraded salvageable truncations to empty-but-audited.)"""
    good = text_to_pdf("hello world")
    r = extract_pdf(good[: len(good) // 2])
    assert r.error is not None or r.recovered


class TestXrefRecovery:
    """Whole-document recovery scan (document.py _reconstruct — the
    qpdf-style reconstruction crawl PDFs routinely need; VERDICT r3
    item 7). Each corruption class must extract the SAME text as the
    pristine file and surface recovered=True for the audit table."""

    SRC = "alpha beta gamma\ndelta epsilon zeta"

    def _expect(self, broken: bytes, want: str):
        r = extract_pdf(broken)
        assert r.error is None, r.error
        assert r.recovered is True
        assert r.text == want

    def test_missing_startxref(self):
        good = text_to_pdf(self.SRC)
        want = extract_pdf(good).text
        self._expect(good[: good.rfind(b"startxref")], want)

    def test_bogus_startxref_offset(self):
        import re

        good = text_to_pdf(self.SRC)
        want = extract_pdf(good).text
        bad = re.sub(rb"startxref\s+\d+", b"startxref\n999999999", good)
        self._expect(bad, want)

    def test_clobbered_xref_keyword(self):
        good = text_to_pdf(self.SRC)
        want = extract_pdf(good).text
        xi = good.rfind(b"xref")
        self._expect(good[:xi] + b"xxxx" + good[xi + 4 :], want)

    def test_xrefstream_objstm_recovery(self):
        """Catalog inside an /ObjStm: the scan must register object-
        stream members (their headers live inside compressed
        containers, invisible to the file-level header walk)."""
        import re

        good = text_to_pdf(self.SRC, variant="xrefstream", use_objstm=True)
        want = extract_pdf(good).text
        bad = re.sub(rb"startxref\s+\d+", b"startxref\n999999999", good)
        self._expect(bad, want)

    def test_incremental_chain_last_occurrence_wins(self):
        """Recovery precedence must match incremental-update semantics:
        the LAST header for an object number in the file is the live
        one, so a recovered rewritten doc shows the NEW text."""
        import re

        from pdf_parser_spark.pdfcore.rewrite import replace_text

        good = text_to_pdf("Hello World\nkeep this line")
        res = replace_text(good, "Hello World", "Hollo Werld")
        assert res.success, res.log
        bad = re.sub(rb"startxref\s+\d+", b"startxref\n999999999", res.data)
        self._expect(bad, "Hollo Werld\nkeep this line")

    def test_header_shaped_literal_inside_content_stream(self):
        """'5 0 obj' as page TEXT must not fool the scan: headers found
        inside a previous object's parsed extent are skipped."""
        import re

        good = text_to_pdf("5 0 obj\nendobj\nreal text line")
        want = extract_pdf(good).text
        assert "5 0 obj" in want
        bad = re.sub(rb"startxref\s+\d+", b"startxref\n999999999", good)
        self._expect(bad, want)

    def test_encrypted_doc_not_spuriously_recovered(self):
        """Encrypted xref-stream + ObjStm docs resolve their catalog
        through the decryptor — an intact file must extract with
        recovered=False (regression: root-usability probed before
        encryption setup forced bogus reconstruction)."""
        for rev in (3, 4, 6):
            pdf = make_text_pdf(
                [["hello enc world"]],
                variant="xrefstream",
                use_objstm=True,
                encrypted=True,
                encrypt_revision=rev,
            )
            r = extract_pdf(pdf)
            assert r.error is None and not r.recovered, (rev, r.error)
            assert "hello enc world" in r.text

    def test_pristine_docs_not_recovered(self):
        for variant, compress, objstm in VARIANTS:
            pdf = text_to_pdf(
                self.SRC, variant=variant, compress=compress, use_objstm=objstm
            )
            r = extract_pdf(pdf)
            assert r.recovered is False and r.error is None


def test_cid_text_pdf_roundtrip():
    """make_cid_text_pdf (2-byte code units + codespacerange CMap):
    multibyte decode restores the text exactly — including escaped
    delimiters — while the flag-off path diverges (its exact
    reference-quirk output is pinned by the flag golden below)."""
    from pdf_parser_spark.pdfgen.writer import make_cid_text_pdf

    src = ["alpha (beta) \\ gamma", "second line"]
    pdf = make_cid_text_pdf([src])
    on = extract_pdf(pdf, multibyte_cmaps=True)
    assert on.error is None
    assert on.text == "\n".join(src)
    assert extract_pdf(pdf).text != on.text


def test_mutation_fuzz_never_raises():
    """Deterministic corruption sweep over every storage variant:
    single-byte flips on a grid of offsets plus progressive
    truncations. At 10^12-document scale every corruption that can
    exist will exist; the kernel contract is that a result object
    always comes back (text possibly empty, .error possibly set) and
    NOTHING escapes as an exception — failures must become audit
    counts, not task retries."""
    from pdf_parser_spark.pdfgen.writer import make_cid_text_pdf

    src = "alpha beta gamma\ndelta epsilon zeta\n(paren) \\esc café"
    subjects = [
        text_to_pdf(src, variant=v, use_objstm=o)
        for v, o in [
            ("classic", False),
            ("xrefstream", False),
            ("xrefstream", True),
        ]
    ]
    subjects.append(make_cid_text_pdf([src.split("\n")]))
    # encrypted (RC4 + both AES flavours) and alt-filter variants: a
    # flipped byte inside ciphertext/compressed data must surface as an
    # audit error or garbage text, never an uncaught exception
    from pdf_parser_spark.pdfgen.writer import build_pdf, make_text_pdf

    subjects.append(make_text_pdf([src.split("\n")], encrypted=True))
    subjects.append(
        make_text_pdf([src.split("\n")], encrypted=True, encrypt_revision=4)
    )
    subjects.append(
        make_text_pdf([src.split("\n")], encrypted=True, encrypt_revision=6)
    )
    content = b"BT\n/F1 12 Tf\n1 0 0 1 72 720 Tm\n(fuzz me) Tj\nET"
    subjects.append(build_pdf([[content]], content_encoding="lzw"))
    subjects.append(build_pdf([[content]], content_encoding="rl"))
    for good in subjects:
        n = len(good)
        for off in range(0, n, max(1, n // 40)):
            bad = bytearray(good)
            bad[off] ^= 0xFF
            for mb in (False, True):
                r = extract_pdf(bytes(bad), multibyte_cmaps=mb)
                assert r.text is not None  # must not raise
        for cut in range(0, n, max(1, n // 20)):
            r = extract_pdf(good[:cut])
            assert r.text is not None


def test_spans_geometry_matches_layout():
    pdf = make_text_pdf([["first", "second"]], font_size=10)
    r = extract_pdf(pdf)
    assert [(s.text, s.x, s.y, s.size) for s in r.spans] == [
        ("first", 72.0, 720.0, 10.0),
        ("second", 72.0, 706.0, 10.0),
    ]
    assert all(p == 0 for p in r.span_pages)


def test_inherited_resources_from_pages_node():
    # fonts declared on the /Pages parent must be inherited by the page
    # (ISO 32000 §7.7.3.4; reference parent-walk pdf_gui.py:1515-1521)
    from pdf_parser_spark.pdfgen.writer import Raw, StreamObj, _emit_classic

    content = b"BT /F1 12 Tf (inherited) Tj ET"
    objects = {
        1: {"Type": Raw("/Catalog"), "Pages": Raw("2 0 R")},
        2: {
            "Type": Raw("/Pages"),
            "Kids": [Raw("3 0 R")],
            "Count": 1,
            "Resources": {
                "Font": {
                    "F1": {
                        "Type": Raw("/Font"),
                        "Subtype": Raw("/Type1"),
                        "BaseFont": Raw("/Helvetica"),
                        "Encoding": Raw("/WinAnsiEncoding"),
                    }
                }
            },
        },
        3: {"Type": Raw("/Page"), "Parent": Raw("2 0 R"), "Contents": Raw("4 0 R")},
        4: StreamObj({}, content, compress=False),
    }
    pdf = _emit_classic(objects, root=1)
    r = extract_pdf(pdf)
    assert r.text == "inherited"


def test_cid_two_byte_cmap_flag_end_to_end():
    """CID extension golden: same PDF, flag off → reference-identical
    '?' per byte; flag on → real 2-byte decode (SURVEY §2.2 T7)."""
    from pdf_parser_spark.pdfcore.extract import extract_pdf
    from pdf_parser_spark.pdfgen.writer import FontSpec, build_pdf

    cmap_src = (
        "1 begincodespacerange\n<0000> <FFFF>\nendcodespacerange\n"
        "2 beginbfchar\n<4E2D> <4E2D>\n<6587> <6587>\nendbfchar"
    )
    content = b"BT /F1 12 Tf 1 0 0 1 72 720 Tm (\x4e\x2d\x65\x87) Tj ET"
    pdf = build_pdf([[content]], fonts={"F1": FontSpec(tounicode=cmap_src)})
    assert extract_pdf(pdf).text == "????"
    assert extract_pdf(pdf, multibyte_cmaps=True).text == "中文"


def test_cid_array_form_and_mixed_codespace_goldens():
    """CJK-style goldens for the round-3 CID extension: the SAME source
    decodes byte-exactly through all four ToUnicode shapes (bfchar /
    array-form bfrange × uniform / SJIS-like mixed codespace), and
    flag-off stays reference-identically degraded."""
    from pdf_parser_spark.pdfcore.extract import extract_pdf
    from pdf_parser_spark.pdfgen.writer import make_cid_text_pdf

    pages = [["Hello 世界!", "naïve café 東京"], ["second page 行"]]
    want = "Hello 世界!\nnaïve café 東京\nsecond page 行"
    for array_form in (False, True):
        for mixed in (False, True):
            pdf = make_cid_text_pdf(pages, array_form=array_form, mixed=mixed)
            r = extract_pdf(pdf, multibyte_cmaps=True)
            assert r.text == want, (array_form, mixed)
            assert r.error is None
            assert "世" not in extract_pdf(pdf).text  # flag-off degrades


def test_encrypted_pdf_detected_as_typed_error():
    """/Encrypt in the trailer → classified error='encrypted' (not a
    generic parse failure, never an exception); clean docs unaffected."""
    import re

    from pdf_parser_spark.pdfcore.extract import extract_pdf
    from pdf_parser_spark.pdfgen.writer import text_to_pdf

    pdf = text_to_pdf("secret line")
    # splice an /Encrypt entry into the trailer dict
    enc = re.sub(rb"trailer\s*<<", b"trailer\n<< /Encrypt << /Filter /Standard /V 1 >>", pdf, count=1)
    assert enc != pdf
    r = extract_pdf(enc)
    assert r.error == "encrypted" and r.text == "" and r.n_items == 0
    assert extract_pdf(pdf).error is None  # clean path unchanged
