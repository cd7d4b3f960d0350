"""Write-path kernel: replace_text + incremental-update K2 sink.

Each test pins a reference semantic from core/replacer.py (cited in
pdf_parser_spark/pdfcore/rewrite.py's module doc) and round-trips the
rewritten bytes through this repo's own reader."""

import pytest

from pdf_parser_spark.pdfcore.extract import extract_pdf
from pdf_parser_spark.pdfcore.rewrite import (
    ReplaceResult,
    allocate_safe_code,
    avg_width_ratio,
    encode_pdf_string,
    escape_pdf_string,
    is_safe_code,
    merge_cmaps,
    replace_text,
)
from pdf_parser_spark.pdfgen.writer import make_text_pdf, text_to_pdf

SRC = "Hello World\nkeep this line\nHello World"


def test_simple_replace_roundtrip():
    pdf = text_to_pdf(SRC)
    r = replace_text(pdf, "Hello World", "Jelly Wordl!")
    # '!' not in census and not in WinAnsi-synth reverse? it IS in the
    # synthesized printable-ASCII CMap reverse domain → supported
    assert r.success and r.changed and r.replacements == 2
    out = extract_pdf(r.data)
    assert out.text == "Jelly Wordl!\nkeep this line\nJelly Wordl!"
    assert out.error is None
    # incremental update: original bytes preserved verbatim as prefix
    assert r.data.startswith(pdf)


def test_instance_selector_gate():
    pdf = text_to_pdf(SRC)
    r = replace_text(pdf, "Hello World", "Howdy Earth", instance_index=1)
    assert r.success and r.replacements == 1
    assert extract_pdf(r.data).text == "Hello World\nkeep this line\nHowdy Earth"
    r0 = replace_text(pdf, "Hello World", "Howdy Earth", instance_index=0)
    assert extract_pdf(r0.data).text == "Howdy Earth\nkeep this line\nHello World"


def test_identity_guard():
    pdf = text_to_pdf(SRC)
    r = replace_text(pdf, "Hello World", "Hello World")
    assert not r.changed and not r.success and r.data == pdf
    assert r.log[0][0] == "WARNING"


def test_unsupported_char_cancels():
    pdf = text_to_pdf(SRC)
    r = replace_text(pdf, "Hello World", "日本語")
    assert not r.changed and not r.success and r.data == pdf
    assert any("missing character" in m for _, m in r.log)


def test_text_not_found():
    pdf = text_to_pdf(SRC)
    r = replace_text(pdf, "absent text", "whatever")
    assert not r.changed and not r.success and r.data == pdf


def test_replace_on_xrefstream_and_objstm_pdf():
    for variant, objstm in [("xrefstream", False), ("xrefstream", True)]:
        pdf = text_to_pdf(SRC, variant=variant, use_objstm=objstm)
        r = replace_text(pdf, "keep this line", "swap this line")
        assert r.success, (variant, objstm)
        assert (
            extract_pdf(r.data).text
            == "Hello World\nswap this line\nHello World"
        )


def test_replace_contents_array_page():
    # /Contents as array → new stream object + rewritten page object
    pdf = make_text_pdf([["alpha one", "beta two", "gamma three", "delta four"]],
                        contents_array=True)
    r = replace_text(pdf, "beta two", "BETA TWO!")
    assert r.success
    assert extract_pdf(r.data).text == "alpha one\nBETA TWO!\ngamma three\ndelta four"


def test_replace_second_page():
    pdf = make_text_pdf([["page one text"], ["page two text"]])
    r = replace_text(pdf, "page two text", "PAGE TWO NEW!", page_num=1)
    assert r.success
    assert extract_pdf(r.data).text == "page one text\nPAGE TWO NEW!"
    # page_num=0 does not see page 1's text
    r0 = replace_text(pdf, "page two text", "PAGE TWO NEW!", page_num=0)
    assert not r0.success


def test_escaped_parens_roundtrip():
    # pdf_escape writes \( \); replace-path T5 strips backslashes, so
    # the census/decode sees '(x)' — target must match that form
    pdf = text_to_pdf("before (x) after\nplain")
    r = replace_text(pdf, "before (x) after", "after (y) before")
    assert r.success
    assert extract_pdf(r.data).text == "after (y) before\nplain"


def test_repeated_replacement_chains():
    pdf = text_to_pdf(SRC)
    r1 = replace_text(pdf, "Hello World", "Round One A")
    r2 = replace_text(r1.data, "Round One A", "Round Two B")
    assert r2.success
    assert extract_pdf(r2.data).text == "Round Two B\nkeep this line\nRound Two B"


# ---------------------------------------------------------------- scalars


def test_escape_pdf_string_reference_set():
    # reference cmap.py:80-104
    assert escape_pdf_string("a(b)c\\d\r\n\t\b\f") == (
        "a\\(b\\)c\\\\d\\r\\n\\t\\b\\f"
    )


def test_encode_pdf_string_reverse_and_raise():
    from pdf_parser_spark.pdfcore.cmap import parse_cmap

    cm = parse_cmap("2 beginbfchar\n<41> <0061>\n<42> <0062>\nendbfchar")
    assert encode_pdf_string("ab", cm) == b"\x41\x42"
    with pytest.raises(ValueError):
        encode_pdf_string("z", cm)


def test_is_safe_code_blocklist():
    # reference fonts/analysis.py:70-100
    for bad in (0x00, 0x1F, 0x20, 0x22, 0x27, 0x28, 0x29, 0x2C, 0x2E,
                0x3A, 0x3B, 0x3F, 0x5B, 0x5D, 0x7B, 0x7D):
        assert not is_safe_code(bad)
    for ok in (0x41, 0x61, 0xB0, 0xFF):
        assert is_safe_code(ok)


def test_allocate_safe_code():
    # scans 0xB0..0xFF, skipping used/already/encoding-map codes (E1)
    assert allocate_safe_code(set()) == 0xB0
    assert allocate_safe_code({0xB0}, {0xB1}) == 0xB2
    assert allocate_safe_code({0xB0}, None, {"/F1": {0xB1: "/x"}}) == 0xB2
    # exhausted range → None (reference's &0xFF extended-range bug is
    # deliberately NOT reproduced)
    assert allocate_safe_code(set(range(0xB0, 0x100))) is None


def test_merge_cmaps_and_width_ratio():
    assert merge_cmaps({1: "a", 2: "b"}, {2: "B", 3: "c"}) == {
        1: "a", 2: "B", 3: "c",
    }
    # reference embedding.py:168-171: mean ratio × 0.97
    assert avg_width_ratio([(500, 1000), (600, 1000)]) == pytest.approx(
        ((0.5 + 0.6) / 2) * 0.97
    )
    assert avg_width_ratio([]) == 0.0


# ----------------------------------------------------- J4/S5 batch + K4 draw


def test_batch_replace_columns(tmp_path):
    """J4 (pdf_gui.py:1689-1758): one output per column, sequential
    chained replacement, empty pairs skipped, sanitized tags."""
    from pdf_parser_spark.pdfcore.rewrite import batch_replace, load_replacement_table

    pdf = text_to_pdf("name here\ncity here\nfixed line")
    csv_path = tmp_path / "repl.csv"
    csv_path.write_text(
        "name here,Ada L.,Grace H.\ncity here,London,New-York\nfixed line,,\n"
    )
    template, columns = load_replacement_table(str(csv_path))
    assert template == ["name here", "city here", "fixed line"]
    outs = batch_replace(pdf, template, columns)
    assert set(outs) == {"AdaL", "GraceH"}  # sanitized first values
    assert extract_pdf(outs["AdaL"].data).text == "Ada L.\nLondon\nfixed line"
    assert extract_pdf(outs["GraceH"].data).text == "Grace H.\nNew-York\nfixed line"
    assert outs["AdaL"].replacements == 2


def test_rewrite_tolerates_junk_prefix():
    """The reader strips up to 1 KiB before %PDF-; the rewriter must
    emit xref offsets in the SAME stripped coordinates or the output
    is unreadable (regression: offsets were computed against the
    unstripped buffer)."""
    pdf = b"\xef\xbb\xbfGARBAGE-" + text_to_pdf("Hello World\nHello World")
    r = replace_text(pdf, "Hello World", "Howdy Globe")
    assert r.success and r.replacements == 2
    out = extract_pdf(r.data)
    assert out.error is None
    assert out.text == "Howdy Globe\nHowdy Globe"


def test_rewrite_shared_contents_scoped_to_page():
    """Two pages sharing ONE /Contents stream object (legal boilerplate
    reuse): editing page 0 must not rewrite page 1 (regression: the
    in-place override branch rewrote the shared object)."""
    from pdf_parser_spark.pdfgen.writer import Raw, StreamObj, _emit_classic

    font = {
        "Type": Raw("/Font"),
        "Subtype": Raw("/Type1"),
        "BaseFont": Raw("/Helvetica"),
        "Encoding": Raw("/WinAnsiEncoding"),
    }
    content = b"BT /F1 12 Tf 72 720 Td (shared text) Tj ET"
    objects = {
        1: {"Type": Raw("/Catalog"), "Pages": Raw("2 0 R")},
        2: {
            "Type": Raw("/Pages"),
            "Kids": [Raw("3 0 R"), Raw("4 0 R")],
            "Count": 2,
            "Resources": {"Font": {"F1": font}},
        },
        3: {"Type": Raw("/Page"), "Parent": Raw("2 0 R"), "Contents": Raw("5 0 R")},
        4: {"Type": Raw("/Page"), "Parent": Raw("2 0 R"), "Contents": Raw("5 0 R")},
        5: StreamObj({}, content, compress=False),
    }
    pdf = _emit_classic(objects, root=1)
    base = extract_pdf(pdf)
    assert base.text == "shared text\nshared text"
    r = replace_text(pdf, "shared text", "edited text", page_num=0)
    assert r.success
    out = extract_pdf(r.data)
    assert out.text == "edited text\nshared text"


def test_batch_replace_colliding_tags_keep_both_outputs():
    """Two columns whose tags sanitize to the same key must both
    survive (regression: dict overwrite dropped the first)."""
    from pdf_parser_spark.pdfcore.rewrite import batch_replace

    pdf = text_to_pdf("NAME\nother line")
    outs = batch_replace(pdf, ["NAME"], [["Ada L."], ["AdaL."]])
    assert len(outs) == 2
    texts = sorted(extract_pdf(r.data).text for r in outs.values())
    assert texts == ["Ada L.\nother line", "AdaL.\nother line"]


def test_render_parse_svg():
    """K4: SVG plot sink — red rects, blue labels, y flipped."""
    from pdf_parser_spark.api import parse_page_text
    from pdf_parser_spark.draw import render_parse_svg

    pdf = text_to_pdf("top line\nnext <tag> & more")
    svg = render_parse_svg(parse_page_text(pdf, 0))
    assert svg.startswith("<svg") and svg.endswith("</svg>")
    assert svg.count('stroke="red"') == 2
    assert "top line" in svg
    assert "&lt;tag&gt; &amp; more" in svg  # XML-escaped label
    # y flipped: the top PDF line (y1=732) sits at svg y = 792-732 = 60
    assert 'y="60"' in svg


# --------------------------------------------------------------------------
# auto-insert (the reference's intended update_pdf_font_mapping flow,
# fonts/embedding.py:11-230, made to work — minus glyph-program embedding)


def test_autoinsert_roundtrip():
    """A replacement char missing from census ∪ reverse domain gets a
    safe code, a merged ToUnicode, and round-trips byte-exactly."""
    pdf = text_to_pdf(SRC)
    r = replace_text(pdf, "Hello World", "Hej Världen", allow_auto_insert=True)
    assert r.success and r.replacements == 2
    out = extract_pdf(r.data)
    assert out.error is None
    assert out.text == "Hej Världen\nkeep this line\nHej Världen"
    assert r.data.startswith(pdf)  # still an incremental update
    assert any("Auto-insert" in m for _, m in r.log)


def test_autoinsert_default_off_unchanged():
    """Flag off → reference-identical cancel (regression guard)."""
    pdf = text_to_pdf(SRC)
    r = replace_text(pdf, "Hello World", "Hej Världen")
    assert not r.changed and r.data == pdf


def test_autoinsert_beyond_latin1_and_differences():
    """CJK chars (> U+00FF) map through single-byte safe codes; the
    font dict gains /Differences uniXXXX entries (AGL convention)."""
    from pdf_parser_spark.pdfcore.document import PdfDocument

    pdf = text_to_pdf("Hello World\nkeep this line")
    r = replace_text(pdf, "Hello World", "日本語 rocks", allow_auto_insert=True)
    assert r.success
    out = extract_pdf(r.data)
    assert out.text == "日本語 rocks\nkeep this line"
    d = PdfDocument(r.data)
    f = d.page_fonts(d.pages()[0])["/F1"]
    enc = d.resolve(f.get("Encoding"))
    diffs = d.resolve(enc.get("Differences"))
    names = [str(x) for x in diffs if not isinstance(x, (int, float))]
    assert names == ["uni65E5", "uni672C", "uni8A9E"]


def test_autoinsert_extends_widths():
    """A font declaring /Widths gets its range extended to cover the
    allocated code; gap codes get the average width (A6 analog)."""
    from pdf_parser_spark.pdfcore.document import PdfDocument
    from pdf_parser_spark.pdfgen.writer import FontSpec, make_text_pdf

    font = FontSpec(first_char=32, widths=[500] * 95)  # 32..126
    pdf = make_text_pdf([["Hello World", "keep this line"]], font=font)
    r = replace_text(pdf, "Hello World", "Hëllo World", allow_auto_insert=True)
    assert r.success
    out = extract_pdf(r.data)
    assert out.text == "Hëllo World\nkeep this line"
    d = PdfDocument(r.data)
    f = d.page_fonts(d.pages()[0])["/F1"]
    first, last = int(d.resolve(f["FirstChar"])), int(d.resolve(f["LastChar"]))
    widths = d.resolve(f["Widths"])
    assert first == 32 and last >= 0xB0
    assert len(widths) == last - first + 1


def test_autoinsert_chains_and_reuses_distinct_codes():
    """Sequential auto-inserting rewrites chain (update on update);
    codes already consumed by an earlier update are not re-allocated."""
    pdf = text_to_pdf("alpha line\nbeta line")
    r1 = replace_text(pdf, "alpha line", "älpha line", allow_auto_insert=True)
    r2 = replace_text(r1.data, "beta line", "bëta line", allow_auto_insert=True)
    assert r1.success and r2.success
    out = extract_pdf(r2.data)
    assert out.text == "älpha line\nbëta line"


def test_build_tounicode_stream_exact_roundtrip():
    """parse_cmap(build_tounicode_stream(m)) == m exactly — including
    the absence of the 0x00→'ÿ' ghost (two-line codespacerange form)."""
    from pdf_parser_spark.pdfcore.cmap import parse_cmap
    from pdf_parser_spark.pdfcore.rewrite import build_tounicode_stream

    m = {65: "A", 0xB0: "ä", 0xB1: "日"}
    parsed = parse_cmap(build_tounicode_stream(m))
    assert parsed.mapping == m


def test_incremental_update_carries_generation():
    """An overridden object whose original xref generation is > 0 keeps
    that generation in the appended body and xref entry — a
    spec-conforming reader resolving 'n g R' (g>0) must see the update."""
    import re

    from pdf_parser_spark.pdfgen.writer import Raw, StreamObj, _emit_classic

    font = {
        "Type": Raw("/Font"),
        "Subtype": Raw("/Type1"),
        "BaseFont": Raw("/Helvetica"),
        "Encoding": Raw("/WinAnsiEncoding"),
    }
    content = b"BT /F1 12 Tf 72 720 Td (old text here) Tj ET"
    objects = {
        1: {"Type": Raw("/Catalog"), "Pages": Raw("2 0 R")},
        2: {
            "Type": Raw("/Pages"),
            "Kids": [Raw("3 0 R")],
            "Count": 1,
            "Resources": {"Font": {"F1": font}},
        },
        # the page references its contents at generation 7
        3: {"Type": Raw("/Page"), "Parent": Raw("2 0 R"), "Contents": Raw("5 7 R")},
        5: StreamObj({}, content, compress=False),
    }
    pdf = _emit_classic(objects, root=1)
    # rewrite the xref table entry for object 5 to generation 00007
    # (the writer emits 00000; patch both the entry and keep offsets)
    m = re.search(rb"(\d{10}) 00000 n \n$", pdf[: pdf.rfind(b"trailer")], re.M)
    assert m is not None
    pdf = pdf.replace(m.group(0), m.group(1) + b" 00007 n \n")
    assert extract_pdf(pdf).text == "old text here"
    r = replace_text(pdf, "old text here", "new text here")
    assert r.success
    assert b"5 7 obj" in r.data[len(pdf):]
    assert re.search(rb"\d{10} 00007 n \n", r.data[len(pdf):])
    assert extract_pdf(r.data).text == "new text here"


def test_batch_replace_from_real_xlsx(tmp_path):
    """S5 end-to-end: a REAL .xlsx fixture (zip + sharedStrings XML,
    written by our own minimal writer — no openpyxl anywhere) drives
    batch_replace exactly like the CSV path."""
    from pdf_parser_spark.pdfcore.rewrite import (
        batch_replace,
        load_replacement_table,
    )
    from pdf_parser_spark.sources.xlsx import read_xlsx, write_xlsx

    rows = [
        ["Hello World", "Howdy Earth", "Salut Monde"],
        ["keep this line", "", "kept by col2"],
    ]
    path = str(tmp_path / "table.xlsx")
    write_xlsx(path, rows)
    assert read_xlsx(path) == rows  # reader round-trips the writer
    template, columns = load_replacement_table(path)
    assert template == ["Hello World", "keep this line"]
    assert columns == [["Howdy Earth", ""], ["Salut Monde", "kept by col2"]]
    pdf = text_to_pdf(SRC)
    outs = batch_replace(pdf, template, columns)
    texts = {k: extract_pdf(r.data).text for k, r in outs.items()}
    assert texts["HowdyEarth"] == "Howdy Earth\nkeep this line\nHowdy Earth"
    assert texts["SalutMonde"] == "Salut Monde\nkept by col2\nSalut Monde"


def test_read_xlsx_inline_strings_and_sparse_cells(tmp_path):
    """Reader coverage beyond our writer's flavour: inline strings,
    sparse rows, numeric cells."""
    import zipfile

    sheet = (
        '<?xml version="1.0"?>'
        '<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
        "<sheetData>"
        '<row r="1"><c r="A1" t="inlineStr"><is><t>tpl</t></is></c>'
        '<c r="C1" t="inlineStr"><is><t>skip b</t></is></c></row>'
        '<row r="3"><c r="B3"><v>42</v></c></row>'
        "</sheetData></worksheet>"
    )
    path = str(tmp_path / "inline.xlsx")
    with zipfile.ZipFile(path, "w") as zf:
        zf.writestr("xl/worksheets/sheet1.xml", sheet)
    from pdf_parser_spark.sources.xlsx import read_xlsx

    assert read_xlsx(path) == [
        ["tpl", "", "skip b"],
        ["", "", ""],
        ["", "42", ""],
    ]
