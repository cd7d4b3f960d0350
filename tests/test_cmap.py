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


# --------------------------------------------------------------------------
# CID extension round 3: array-destination bfrange, mixed codespaces,
# multi-unit destinations (reference skips all of this; flag-off
# behavior is pinned above)


def test_cid_array_destination_bfrange():
    from pdf_parser_spark.pdfcore.cmap import parse_cmap

    src = (
        "1 begincodespacerange\n<0000> <FFFF>\nendcodespacerange\n"
        "1 beginbfrange\n<8140> <8142> [<3042> <30443046> <00660069>]\nendbfrange"
    )
    cm = parse_cmap(src, multibyte=True)
    assert cm.multi[b"\x81\x40"] == "あ"
    assert cm.multi[b"\x81\x41"] == "いう"  # multi-unit UTF-16BE dst
    assert cm.multi[b"\x81\x42"] == "fi"  # ligature dst
    # default mode: the scalar-triple rule eats the first element —
    # reference-identical line-oriented quirk, unchanged
    cm0 = parse_cmap(src)
    assert not cm0.multi


def test_cid_mixed_codespaces_drive_code_width():
    from pdf_parser_spark.pdfcore.cmap import parse_cmap

    src = (
        "2 begincodespacerange\n<00> <7F>\n<8140> <FEFF>\nendcodespacerange\n"
        "3 beginbfchar\n<41> <0041>\n<8150> <4E00>\n<8152> <4E16>\nendbfchar"
    )
    cm = parse_cmap(src, multibyte=True)
    assert cm.spaces == [(1, 0x00, 0x7F), (2, 0x8140, 0xFEFF)]
    # 1-byte and 2-byte codes interleave unambiguously
    assert cm.decode(b"\x41\x81\x50\x41\x81\x52") == "A一A世"
    # in-codespace unmapped 2-byte code → exactly ONE '?'
    assert cm.decode(b"\x81\x60") == "?"


def test_cid_surrogate_pair_and_wide_codespace():
    from pdf_parser_spark.pdfcore.cmap import parse_cmap

    cm = parse_cmap(
        "1 beginbfchar\n<0041> <D835DC00>\nendbfchar", multibyte=True
    )
    assert cm.multi[b"\x00\x41"] == "\U0001D400"
    cm3 = parse_cmap(
        "1 begincodespacerange\n<000000> <FFFFFF>\nendcodespacerange\n"
        "1 beginbfchar\n<010203> <0042>\nendbfchar",
        multibyte=True,
    )
    assert cm3.decode(b"\x01\x02\x03") == "B"


def test_cid_range_increments_last_unit():
    from pdf_parser_spark.pdfcore.cmap import parse_cmap

    cm = parse_cmap(
        "1 beginbfrange\n<8150> <8152> <4E00>\nendbfrange", multibyte=True
    )
    assert cm.multi[b"\x81\x50"] == "一"
    assert cm.multi[b"\x81\x52"] == "丂"


def test_cid_three_and_four_byte_codespaces():
    """Codespace widths beyond 2 bytes decode code-by-code: a 3-byte
    space consumes 3 bytes per code ('?' per unmapped CODE, not per
    byte); a 4-byte space with a bfrange walks in 4-byte steps."""
    src3 = (
        "1 begincodespacerange\n<000000> <FFFFFF>\nendcodespacerange\n"
        "1 beginbfchar\n<010203> <0041>\nendbfchar"
    )
    cm3 = parse_cmap(src3, multibyte=True)
    assert cm3.decode(b"\x01\x02\x03") == "A"
    assert cm3.decode(b"\x01\x02\x03\x09\x08\x07") == "A?"
    src4 = (
        "1 begincodespacerange\n<00000000> <FFFFFFFF>\nendcodespacerange\n"
        "1 beginbfrange\n<00010000> <00010002> <0061>\nendbfrange"
    )
    cm4 = parse_cmap(src4, multibyte=True)
    assert cm4.decode(b"\x00\x01\x00\x02") == "c"


def test_odd_width_hex_entry_skipped_not_overflow():
    """A malformed bfchar like <ABC> declares width 1 (3 hex digits //
    2) while its value exceeds one byte; pre-guard this raised
    OverflowError through extract_pdf (found by the round-5 CID fuzz).
    Must be skipped silently; well-formed entries on other lines keep
    working."""
    cm = parse_cmap(
        "begincodespacerange\n<0000> <FFFF>\nendcodespacerange\n"
        "beginbfchar\n<ABC> <0041>\n<0042> <0043>\nendbfchar",
        multibyte=True,
    )
    assert cm.decode(b"\x00\x42") == "C"
