"""Reference-compatible API surface: parse_page_text /
search_text_in_pdf / PDFTextReplacer (pure-Python, no Spark)."""

import pytest

from pdf_parser_spark.api import (
    PDFTextReplacer,
    parse_page_text,
    replace_pdf_text,
    search_text_in_pdf,
)
from pdf_parser_spark.pdfgen.writer import text_to_pdf

SRC = "Hello World\nthe quick brown fox\nHello World"


@pytest.fixture(scope="module")
def pdf_bytes():
    return text_to_pdf(SRC)


def test_parse_page_text_shape(pdf_bytes):
    items = parse_page_text(pdf_bytes, 0)
    # area-DESC return order (reference api.py:352-377): the wide fox
    # line first, then the two equal-area Hello lines in document order
    # (stable sort)
    assert [it["text"] for it in items] == [
        "the quick brown fox", "Hello World", "Hello World",
    ]
    first = items[0]
    assert set(first) == {"text", "rect", "font", "encoded_bytes", "instance_index"}
    assert first["font"] == "/F1"
    assert bytes.fromhex(first["encoded_bytes"])  # valid hex
    # repeated text gets increasing instance indices (reference A1)
    assert [it["instance_index"] for it in items] == [0, 0, 1]
    # geometry intact: the two Hello lines sit at top and bottom
    ys = [it["rect"]["y0"] for it in items if it["rect"]]
    assert len(ys) == 3 and ys[1] > ys[0] > ys[2]


def test_parse_page_out_of_range(pdf_bytes):
    with pytest.raises(ValueError):
        parse_page_text(pdf_bytes, 7)


def test_parse_accepts_path(tmp_path, pdf_bytes):
    p = tmp_path / "doc.pdf"
    p.write_bytes(pdf_bytes)
    assert parse_page_text(str(p), 0) == parse_page_text(pdf_bytes, 0)


def test_search_hits_and_order(pdf_bytes):
    hits = search_text_in_pdf(pdf_bytes, "Hello")
    assert len(hits) == 2
    assert [h["block_order"] for h in hits] == [0, 2]
    h = hits[0]
    assert h["page"] == 0 and h["text"] == "Hello"
    assert h["context"].startswith("Hello World")
    # substring rect: narrower than the whole span, positive width
    assert 0 < h["rect"]["x1"] - h["rect"]["x0"]
    full = next(
        it["rect"]
        for it in parse_page_text(pdf_bytes, 0)
        if it["text"] == "Hello World"
    )
    assert h["rect"]["x1"] - h["rect"]["x0"] < full["x1"] - full["x0"]


def test_search_case_insensitive_default(pdf_bytes):
    # reference default is case-INSENSITIVE (api.py:395)
    assert len(search_text_in_pdf(pdf_bytes, "HELLO")) == 2
    assert search_text_in_pdf(pdf_bytes, "HELLO", case_sensitive=True) == []
    hits = search_text_in_pdf(pdf_bytes, "HELLO", case_sensitive=False)
    assert len(hits) == 2
    assert search_text_in_pdf(pdf_bytes, "") == []


def test_replacer_facade(pdf_bytes):
    r = PDFTextReplacer(pdf_bytes)
    assert r.parse_page_text(0) == parse_page_text(pdf_bytes, 0)
    assert r.search_text("fox")[0]["block_order"] == 1
    cmaps = r.get_font_cmaps(0)
    assert "/F1" in cmaps
    assert cmaps["/F1"][f"{ord('H'):02x}"] == "H"
    census = r.analyze_fonts()
    assert set("Helo Wrd") <= set(census["/F1"]["chars"]) | {" "}
    assert ord("H") in census["/F1"]["char_codes"]["H"]
    assert ord("H") in census["/F1"]["used_codes"]


def test_containment_filter_drops_nested(pdf_bytes):
    """F1 golden (reference api.py:337-390): an element whose rect is
    fully inside a larger element's rect is dropped; equal-rect
    duplicates collapse to the first; rect-less rows survive."""
    from pdf_parser_spark.api import _containment_filter

    def row(t, x0, y0, x1, y1):
        return {"text": t, "rect": {"x0": x0, "y0": y0, "x1": x1, "y1": y1}}

    big = row("big", 0, 0, 100, 100)
    inner = row("inner", 10, 10, 50, 50)
    edge = row("edge", 0, 0, 100, 100)  # exact duplicate of big
    outside = row("outside", 90, 90, 150, 150)
    norect = {"text": "norect", "rect": None}
    out = _containment_filter([inner, big, edge, outside, norect])
    texts = [r["text"] for r in out]
    # big kept (largest), edge dropped (identical dup), inner dropped
    # (contained), outside kept (partial overlap), norect kept
    assert texts == ["big", "outside", "norect"]
    assert all("_area" not in r for r in out)


def test_parse_page_fallback_sweep():
    """Fontless PDF → degraded literal-sweep rows with source marker
    (the reference's PyMuPDF-fallback analog, api.py:197-264)."""
    from pdf_parser_spark.pdfgen.writer import make_text_pdf

    pdf = make_text_pdf([["plain line", "café au lait"]], fontless=True)
    items = parse_page_text(pdf, 0)
    assert {it["text"] for it in items} == {"plain line", "café au lait"}
    assert all(it["source"] == "literal_sweep" for it in items)
    assert all("font" not in it and "encoded_bytes" not in it for it in items)
    assert [it["instance_index"] for it in items] == [0, 0]


def test_fallback_only_when_page_empty():
    from pdf_parser_spark.pdfcore.extract import extract_pdf
    from pdf_parser_spark.pdfgen.writer import make_text_pdf

    normal = make_text_pdf([["decodes fine"]])
    r = extract_pdf(normal)
    assert r.fallback_pages == 0 and r.text == "decodes fine"
    fontless = make_text_pdf([["only literals"]], fontless=True)
    r2 = extract_pdf(fontless)
    assert r2.fallback_pages == 1 and r2.text == "only literals"
    assert r2.items[0][1] is None  # no font on fallback items


def test_write_path_api(tmp_path, pdf_bytes):
    """Write surface (since r2): class method returns a ReplaceResult;
    module function mirrors the reference's path-based bool shape."""
    res = PDFTextReplacer(pdf_bytes).replace_text("Hello World", "Howdy Globe")
    assert res.success and res.replacements == 2
    from pdf_parser_spark.pdfcore.extract import extract_pdf

    assert "Howdy Globe" in extract_pdf(res.data).text
    out = tmp_path / "out.pdf"
    ok = replace_pdf_text(pdf_bytes, str(out), "Hello World", "Howdy Globe")
    assert ok and extract_pdf(out.read_bytes()).text.startswith("Howdy Globe")
    # failure path writes the original through unchanged (reference copy)
    ok2 = replace_pdf_text(pdf_bytes, str(out), "absent", "x")
    assert not ok2 and out.read_bytes() == pdf_bytes
    # auto-insert flag reaches the WORKING rewrite path (r4): chars
    # absent from the font are allocated, merged, and embedded
    res2 = PDFTextReplacer(pdf_bytes).replace_text(
        "Hello World", "Héllo Wörld", allow_auto_insert=True
    )
    assert res2.success
    assert "Héllo Wörld" in extract_pdf(res2.data).text


def test_font_encoding_differences_map():
    """/Differences parity (reference fonts/analysis.py:31-67): ints
    reset the running code, names consume consecutive codes; text
    decoding is NOT affected (reference parity — WinAnsi synthesis
    still applies)."""
    from pdf_parser_spark.pdfgen.writer import FontSpec, make_text_pdf

    spec = FontSpec(
        encoding={
            "BaseEncoding": "WinAnsiEncoding",
            "Differences": [65, "Alpha", "Beta", 200, "Gamma"],
        }
    )
    pdf = make_text_pdf([["ABC"]], font=spec)
    r = PDFTextReplacer(pdf)
    enc = r.get_font_encodings(0)
    assert enc["/F1"] == {65: "/Alpha", 66: "/Beta", 200: "/Gamma"}
    # named-encoding fonts yield {} (reference TODO branch)
    plain = PDFTextReplacer(make_text_pdf([["x"]]))
    assert plain.get_font_encodings(0) == {"/F1": {}}
    # decode unchanged: dict /Encoding falls back to WinAnsi synthesis
    assert [i["text"] for i in parse_page_text(pdf, 0)] == ["ABC"]
