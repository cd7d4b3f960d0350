"""Golden tests for CMap semantics — each pins a reference quirk
(/root/reference/pdf_parser/core/cmap.py, cited per-test)."""

from pdf_parser_spark.pdfcore.cmap import (
    parse_cmap,
    synthesize_tounicode_cmap,
)


def test_bfchar_basic():
    # cmap.py:30-38
    cm = parse_cmap("2 beginbfchar\n<41> <0061>\n<42> <4E2D>\nendbfchar")
    assert cm.decode(b"\x41\x42") == "a中"


def test_bfrange_basic():
    # cmap.py:17-27
    cm = parse_cmap("1 beginbfrange\n<20> <22> <0041>\nendbfrange")
    assert cm.decode(b"\x20\x21\x22") == "ABC"


def test_multibyte_codes_skipped():
    # quirk: source codes > 0xFF silently dropped — cmap.py:24-26,35-37
    cm = parse_cmap(
        "beginbfchar\n<0141> <0061>\nendbfchar\n"
        "beginbfrange\n<0100> <0102> <0041>\nendbfrange"
    )
    assert cm.mapping == {}
    assert cm.decode(b"\x41") == "?"


def test_bfrange_straddling_0xff_keeps_low_codes():
    # range FE..101: only FE,FF kept, 100,101 skipped — cmap.py:23-26
    cm = parse_cmap("<FE> <0101> <0041>")
    assert cm.mapping == {0xFE: "A", 0xFF: "B"}


def test_unmapped_byte_decodes_to_question_mark():
    # cmap.py:54
    cm = parse_cmap("<41> <0061>")
    assert cm.decode(b"\x41\x99\x41") == "a?a"


def test_codespacerange_line_ghost_entry():
    # quirk: the single-line codespacerange '<00> <FF>' in a synthesized
    # CMap matches the bfchar rule → byte 0x00 maps to U+00FF 'ÿ'
    # (cmap.py:151 feeding cmap.py:30-38)
    cm = parse_cmap(synthesize_tounicode_cmap())
    assert cm.mapping[0x00] == "ÿ"


def test_synthesized_winansi_covers_printable_ascii_only():
    # cmap.py:119-135: ASCII 32..126 and nothing else (bar the ghost entry)
    cm = parse_cmap(synthesize_tounicode_cmap())
    for code in range(32, 127):
        assert cm.mapping[code] == chr(code)
    assert 127 not in cm.mapping
    assert 31 not in cm.mapping
    assert set(cm.mapping) == {0} | set(range(32, 127))


def test_unknown_encoding_falls_back_to_winansi():
    # cmap.py:137-142
    a = synthesize_tounicode_cmap("/MacRomanEncoding")
    b = synthesize_tounicode_cmap("/WinAnsiEncoding")
    assert a == b


def test_bfrange_takes_precedence_over_bfchar_on_same_line():
    # a line with three hex groups is a range even inside a bfchar section
    # (the reference tries range_match first — cmap.py:17-27)
    cm = parse_cmap("beginbfchar\n<41> <42> <0061>\nendbfchar")
    assert cm.mapping[0x41] == "a"
    assert cm.mapping[0x42] == "b"
