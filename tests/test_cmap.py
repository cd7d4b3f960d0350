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


# --- CID 2-byte extension (flag ON; SURVEY §2.2 T7 north-star) --------------


def test_multibyte_flag_decodes_two_byte_codes():
    src = (
        "1 begincodespacerange\n<0000> <FFFF>\nendcodespacerange\n"
        "2 beginbfchar\n<4E2D> <4E2D>\n<6587> <6587>\nendbfchar"
    )
    cm = parse_cmap(src, multibyte=True)
    assert cm.decode(b"\x4e\x2d\x65\x87") == "中文"
    # reference mode on the same source: codes skipped, bytes fall to '?'
    ref = parse_cmap(src)
    assert ref.decode(b"\x4e\x2d\x65\x87") == "????"


def test_multibyte_bfrange_and_mixed_width():
    src = (
        "beginbfrange\n<4E00> <4E02> <0041>\nendbfrange\n"
        "beginbfchar\n<61> <0062>\nendbfchar"
    )
    cm = parse_cmap(src, multibyte=True)
    # 2-byte range decodes; single-byte entries still work in the walk
    assert cm.decode(b"\x4e\x01\x61") == "Bb"


def test_multibyte_hex_width_not_magnitude():
    # <0041> declares a TWO-byte code (00 41), not single-byte 0x41
    cm = parse_cmap("beginbfchar\n<0041> <0063>\nendbfchar", multibyte=True)
    assert cm.decode(b"\x00\x41") == "c"
    assert cm.mapping == {}


def test_multibyte_codespacerange_no_ghost():
    # section-aware parse: the <00> <FF> codespacerange line no longer
    # fabricates the 0x00→'ÿ' ghost entry (reference quirk, flag OFF only)
    src = synthesize_tounicode_cmap()
    ghost = parse_cmap(src)
    assert ghost.mapping[0x00] == "\xff"
    clean = parse_cmap(src, multibyte=True)
    assert 0x00 not in clean.mapping
