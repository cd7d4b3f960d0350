"""Golden tests for the content-stream text pass — pins the reference's
tokenizer quirks (/root/reference/pdf_parser/api.py:90-128)."""

from pdf_parser_spark.pdfcore.cmap import CMap, parse_cmap, synthesize_tounicode_cmap
from pdf_parser_spark.pdfcore.tokenizer import (
    extract_spans,
    extract_text_items,
    flatten_tj_array,
    normalize_escapes,
)

WINANSI = parse_cmap(synthesize_tounicode_cmap())
CMAPS = {"/F1": WINANSI, "/F2": WINANSI}


def texts(content: bytes, cmaps=CMAPS):
    return [t for _, t, _ in extract_text_items(content, cmaps)]


def test_simple_tj():
    assert texts(b"BT /F1 12 Tf (Hello) Tj ET") == ["Hello"]


def test_text_before_any_font_is_dropped():
    # api.py:104: current_font must be in font_cmaps
    assert texts(b"BT (orphan) Tj /F1 12 Tf (kept) Tj ET") == ["kept"]


def test_unknown_font_drops_text():
    assert texts(b"BT /F9 12 Tf (lost) Tj ET") == []


def test_fractional_font_size_does_not_switch_font():
    # quirk: the font regex is /Name \d+ Tf — api.py:91,95; '12.5 Tf'
    # never matches, so the previous font stays current
    out = extract_text_items(
        b"BT /F1 12 Tf (a) Tj /F2 12.5 Tf (b) Tj ET", CMAPS
    )
    assert [(f, t) for f, t, _ in out] == [("/F1", "a"), ("/F1", "b")]


def test_tj_array_with_literal_strings_is_invisible():
    # quirk: the reference's array branch char class excludes unescaped
    # parens (api.py:95: [^][\\()]), so a TJ array containing literal
    # (..) strings never matches AT ALL — the text is silently dropped.
    # Verified against the reference regex directly.
    assert texts(b"BT /F1 12 Tf [(Hel) -20 (lo)] TJ ET") == []


def test_tj_array_with_escaped_parens_survives():
    # escaped parens are allowed by the class via \\. — the flatten then
    # keeps the raw text (no token starts '(' ends ')'), and escape
    # normalization turns \( \) back into parens (api.py:109-122)
    assert texts(rb"BT /F1 12 Tf [\(esc\) -9] TJ ET") == ["(esc) -9"]


def test_tj_array_hex_strings_decode_as_literal_chars():
    # hex strings pass the array class but fail the '('..')' token test,
    # so the raw '<41>' text itself is decoded char-by-char
    assert texts(b"BT /F1 12 Tf [<41> -5] TJ ET") == ["<41> -5"]


def test_tj_array_lossy_space_quirk():
    # quirk: '(a b)' splits into '(a' and 'b)' — neither both starts '('
    # AND ends ')', so the space-bearing segment is garbled exactly like
    # the reference (api.py:112-114)
    assert flatten_tj_array("(a b) -5 (c)") == "c"


def test_tj_array_empty_flatten_keeps_raw():
    # quirk: when no token survives, the ORIGINAL array text is decoded
    # (api.py:115-116 only replaces when processed is non-empty)
    assert flatten_tj_array("-250") == "-250"
    # '-250' then decodes through the cmap as literal chars
    assert texts(b"BT /F1 12 Tf [-250] TJ ET") == ["-250"]


def test_escape_order():
    # api.py:121: \( → ( , \) → ) , then \\ → \
    assert normalize_escapes(r"a\(b\)c\\d") == rb"a(b)c\d"


def test_tj_vs_TJ_detection_is_case_based():
    # api.py:105: .endswith('TJ') decides array handling
    assert texts(b"BT /F1 12 Tf (x y) Tj ET") == ["x y"]  # Tj: no flatten


def test_strip_and_empty_filter():
    # api.py:127-128
    assert texts(b"BT /F1 12 Tf (   ) Tj (  pad  ) Tj ET") == ["pad"]


def test_unmapped_bytes_decode_to_question():
    assert texts(b"BT /F1 12 Tf (caf\xe9) Tj ET") == ["caf?"]


def test_content_stream_order_preserved():
    # multi-column: emission order is stream order, not reading order
    # (SURVEY.md §7.3.5; api.py:94-128 walks linearly)
    c = b"BT /F1 12 Tf (right col) Tj (left col) Tj ET"
    assert texts(c) == ["right col", "left col"]


# ---------------------------------------------------------------- span pass


def test_spans_track_tm_td_and_size():
    c = (
        b"BT /F1 10 Tf 1 0 0 1 100 700 Tm (abc) Tj "
        b"0 -14 Td (def) Tj ET"
    )
    spans = extract_spans(c, CMAPS)
    assert [(s.text, s.x, s.y, s.size) for s in spans] == [
        ("abc", 100.0, 700.0, 10.0),
        ("def", 100.0, 686.0, 10.0),
    ]


def test_spans_fractional_size_tracked():
    # the span pass is a real interpreter — fractional Tf sizes work here
    # (unlike the reference text pass; this is the T13 upgrade, SURVEY §2.2)
    spans = extract_spans(b"BT /F1 9.5 Tf (x) Tj ET", CMAPS)
    assert spans[0].size == 9.5


def test_spans_char_advances_from_widths():
    from pdf_parser_spark.pdfcore.tokenizer import FontMetrics

    fm = {"/F1": FontMetrics(first_char=97, widths=[500, 600])}  # a, b
    spans = extract_spans(b"BT /F1 10 Tf 1 0 0 1 0 0 Tm (ab) Tj (c) Tj ET", CMAPS, fm)
    # a: 5.0 wide, b: 6.0 wide, c: default 500 → 5.0
    assert spans[0].char_xs == [0.0, 5.0]
    assert spans[0].width == 11.0
    assert spans[1].x == 11.0


def test_spans_tj_kerning_moves_cursor():
    spans = extract_spans(
        b"BT /F1 10 Tf 1 0 0 1 0 0 Tm [(a) -100 (b)] TJ ET", CMAPS
    )
    # a advances 5.0 (default 500), kern -100 → +1.0, b at 6.0
    assert spans[0].char_xs == [0.0, 6.0]


def test_spans_t_star_uses_leading():
    spans = extract_spans(
        b"BT /F1 10 Tf 14 TL 1 0 0 1 50 100 Tm (a) Tj T* (b) Tj ET", CMAPS
    )
    assert [(s.x, s.y) for s in spans] == [(50.0, 100.0), (50.0, 86.0)]


def test_spans_char_and_word_spacing():
    # Tc adds per glyph, Tw only on byte 0x20 (ISO 32000-1 §9.3.2-9.3.3)
    content = b"BT /F1 10 Tf 2 Tc 5 Tw 1 0 0 1 100 700 Tm (a b) Tj ET"
    (s,) = extract_spans(content, CMAPS)
    # advances: 'a'=5+2, ' '=5+2+5, 'b'=5+2  (500/1000*10 = 5 base)
    assert s.x == 100 and s.y == 700
    assert s.width == (5 + 2) + (5 + 2 + 5) + (5 + 2)
    assert s.char_xs == [100, 107, 119]


def test_spans_horizontal_scaling_tz():
    content = b"BT /F1 10 Tf 50 Tz (ab) Tj ET"
    (s,) = extract_spans(content, CMAPS)
    assert s.width == 5.0  # 2 glyphs * 5pt * 50%


def test_spans_tm_scale_applies_to_advances():
    # Tm scale a=2: origin at e/f, advances doubled in device space
    content = b"BT /F1 10 Tf 2 0 0 2 30 40 Tm (ab) Tj ET"
    (s,) = extract_spans(content, CMAPS)
    assert (s.x, s.y) == (30, 40)
    assert s.width == 20.0  # 2 glyphs * 5pt * a=2


def test_spans_td_composes_with_tm_scale():
    # Td translation maps through the line matrix: dx=10 with a=2 → +20
    content = b"BT /F1 10 Tf 2 0 0 2 0 0 Tm 10 5 Td (x) Tj ET"
    (s,) = extract_spans(content, CMAPS)
    assert (s.x, s.y) == (20, 10)


def test_spans_quote_op_sets_spacing_operands():
    # "aw ac string" sets Tw/Tc then shows on the next line (§9.4.3)
    content = b'BT /F1 10 Tf 14 TL 1 0 0 1 50 700 Tm (a) Tj 5 2 (b c) " ET'
    spans = extract_spans(content, CMAPS)
    assert [s.text for s in spans] == ["a", "b c"]
    s = spans[1]
    assert s.y == 686  # dropped one leading
    # 'b'=5+2, ' '=5+2+5, 'c'=5+2
    assert s.width == 7 + 12 + 7


class TestFastSpanPath:
    """The fused command matcher must be invisible: identical spans to
    the general interpreter on in-alphabet streams, and a clean abort
    (interpreter output) on everything else."""

    CMAPS = {"/F1": CMap({c: chr(c) for c in range(0x20, 0x7F)})}

    def _both(self, content: bytes):
        fast = extract_spans(content, self.CMAPS)
        slow = extract_spans(content, self.CMAPS, use_fast=False)
        return fast, slow

    def assert_same(self, content: bytes):
        fast, slow = self._both(content)
        assert [
            (s.seq, s.text, s.x, s.y, s.font, s.size, s.width, s.char_xs)
            for s in fast
        ] == [
            (s.seq, s.text, s.x, s.y, s.font, s.size, s.width, s.char_xs)
            for s in slow
        ]

    def test_corpus_shape(self):
        self.assert_same(
            b"BT\n/F1 12 Tf\n1 0 0 1 72 720 Tm\n(hello world) Tj\n"
            b"1 0 0 1 72 706 Tm\n(second line) Tj\nET"
        )

    def test_td_tl_tstar_tc_tw_tz(self):
        self.assert_same(
            b"BT /F1 10.5 Tf 14 TL 0.5 Tc 1.5 Tw 80 Tz "
            b"72 700 Td (one) Tj 0 -14 TD (two) Tj T* (three) Tj ET"
        )

    def test_escapes_in_string(self):
        self.assert_same(rb"BT /F1 12 Tf (a\(b\)c \\ \101 \n x) Tj ET")

    def test_line_continuation_aborts_or_matches(self):
        # backslash-LF inside a literal: either path must agree
        self.assert_same(b"BT /F1 12 Tf (split\\\nline) Tj ET")

    def test_abort_on_tj_array(self):
        # TJ arrays are outside the fast alphabet: abort must yield the
        # interpreter's exact kerned output
        self.assert_same(
            b"BT /F1 12 Tf 1 0 0 1 10 10 Tm [(ab) -120 (cd)] TJ ET"
        )

    def test_abort_on_hex_string_and_quote(self):
        self.assert_same(b"BT /F1 12 Tf <4142> Tj ET")
        self.assert_same(b"BT /F1 12 Tf 14 TL (x) ' (y) ' ET")

    def test_abort_on_graphics_ops(self):
        self.assert_same(
            b"q 0.5 0 0 0.5 0 0 cm BT /F1 12 Tf 5 5 Td (g) Tj ET Q"
        )

    def test_abort_midstream_resets_spans(self):
        # fast path emits (a) then hits the unknown op: the fallback
        # must not double-emit
        self.assert_same(b"BT /F1 12 Tf 5 5 Td (a) Tj 1 0 rg (b) Tj ET")

    def test_nested_paren_string(self):
        self.assert_same(b"BT /F1 12 Tf (outer (inner) tail) Tj ET")

    def test_rotated_tm(self):
        self.assert_same(
            b"BT /F1 12 Tf 0 1 -1 0 100 100 Tm (rot) Tj ET"
        )

    def test_fuzz_mixed_commands(self):
        import random

        rng = random.Random(20260819)
        ops = [
            lambda: f"{rng.randint(-5,5)} {rng.randint(-20,20)} Td",
            lambda: f"{rng.randint(-5,5)} {rng.randint(-20,20)} TD",
            lambda: "1 0 0 1 %d %d Tm" % (rng.randint(0, 600), rng.randint(0, 790)),
            lambda: f"{rng.randint(5,30)} TL",
            lambda: f"{rng.uniform(-1,1):.2f} Tc",
            lambda: f"{rng.uniform(-1,1):.2f} Tw",
            lambda: f"{rng.choice([50,100,120])} Tz",
            lambda: "T*",
            lambda: "(%s) Tj" % "".join(
                rng.choice("abc XYZ09\\(\\)") for _ in range(rng.randint(0, 12))
            ),
            lambda: "/F1 %d Tf" % rng.randint(6, 24),
            lambda: "BT",
            lambda: "ET",
            lambda: rng.choice(["0.3 g", "<41> Tj", "[(q) 5 (r)] TJ", "q", "Q"]),
        ]
        for _ in range(300):
            body = " ".join(rng.choice(ops)() for _ in range(rng.randint(1, 25)))
            self.assert_same(("BT /F1 12 Tf " + body + " ET").encode("latin1"))
