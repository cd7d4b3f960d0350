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
    assert [it["text"] for it in items] == [
        "Hello World", "the quick brown fox", "Hello World",
    ]
    first = items[0]
    assert set(first) == {"text", "rect", "font", "encoded_bytes", "instance_index"}
    assert first["font"] == "/F1"
    assert bytes.fromhex(first["encoded_bytes"])  # valid hex
    # repeated text gets increasing instance indices (reference A1)
    assert [it["instance_index"] for it in items] == [0, 0, 1]
    # geometry: later lines sit lower on the page (y decreases)
    ys = [it["rect"]["y0"] for it in items if it["rect"]]
    assert len(ys) == 3 and ys[0] > ys[1] > ys[2]


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
    full = parse_page_text(pdf_bytes, 0)[0]["rect"]
    assert h["rect"]["x1"] - h["rect"]["x0"] < full["x1"] - full["x0"]


def test_search_case_insensitive(pdf_bytes):
    assert search_text_in_pdf(pdf_bytes, "HELLO") == []
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


def test_write_path_raises(pdf_bytes):
    with pytest.raises(NotImplementedError):
        PDFTextReplacer(pdf_bytes).replace_text("a", "b")
    with pytest.raises(NotImplementedError):
        replace_pdf_text("in.pdf", "out.pdf", "a", "b")
