"""Property-based tests (SURVEY.md §5.2 item 4): random documents
round-trip through the full generate→parse pipeline byte-identically,
for every PDF storage variant and for HTML.
"""

from hypothesis import given, settings, strategies as st

from pdf_parser_spark.htmlcore.extract import extract_html
from pdf_parser_spark.htmlcore.gen import (
    expected_text_from_html_source,
    text_to_html,
)
from pdf_parser_spark.pdfcore.cmap import CMap, parse_cmap
from pdf_parser_spark.pdfcore.extract import extract_pdf
from pdf_parser_spark.pdfgen.writer import (
    expected_text_from_source,
    text_to_pdf,
)

# printable ASCII incl. the escaping-sensitive chars ( ) \
_line = st.text(
    alphabet=st.characters(min_codepoint=0x20, max_codepoint=0x7E),
    max_size=60,
)
_doc = st.lists(_line, min_size=1, max_size=8).map("\n".join)
_variant = st.sampled_from(
    [("classic", False), ("xrefstream", False), ("xrefstream", True)]
)


@settings(max_examples=60, deadline=None)
@given(text=_doc, variant=_variant)
def test_pdf_roundtrip_property(text, variant):
    v, objstm = variant
    r = extract_pdf(text_to_pdf(text, variant=v, use_objstm=objstm))
    assert r.error is None
    assert r.text == expected_text_from_source(text)


@settings(max_examples=60, deadline=None)
@given(text=_doc)
def test_html_roundtrip_property(text):
    assert extract_html(text_to_html(text)) == expected_text_from_html_source(
        text
    )


@settings(max_examples=60, deadline=None)
@given(
    entries=st.dictionaries(
        st.integers(min_value=0, max_value=0x1FF),  # incl. >0xFF codes
        st.characters(min_codepoint=0x20, max_codepoint=0x2FFF),
        max_size=20,
    )
)
def test_cmap_bfchar_parse_property(entries):
    """parse_cmap keeps exactly the single-byte entries (reference
    cmap.py:35-37 drops codes > 0xFF) and decodes with '?' fallback."""
    body = "\n".join(
        f"<{code:04x}> <{ord(ch):04x}>" for code, ch in entries.items()
    )
    cmap_str = (
        "begincmap\n2 beginbfchar\n" + body + "\nendbfchar\nendcmap"
    )
    cmap = parse_cmap(cmap_str)
    expected = {c: ch for c, ch in entries.items() if c <= 0xFF}
    assert cmap.mapping == expected
    raw = bytes(range(0, 256, 7))
    decoded = cmap.decode(raw)
    assert decoded == "".join(expected.get(b, "?") for b in raw)


@settings(max_examples=40, deadline=None)
@given(
    lo=st.integers(min_value=0, max_value=0xF0),
    span=st.integers(min_value=0, max_value=0x1F),
    dst=st.integers(min_value=0x41, max_value=0x2000),
)
def test_cmap_bfrange_parse_property(lo, span, dst):
    hi = lo + span
    cmap_str = (
        f"1 beginbfrange\n<{lo:02x}> <{hi:02x}> <{dst:04x}>\nendbfrange"
    )
    cmap = parse_cmap(cmap_str)
    assert cmap.mapping == {
        c: chr(dst + (c - lo)) for c in range(lo, hi + 1) if c <= 0xFF
    }


@settings(max_examples=40, deadline=None)
@given(mapping=st.dictionaries(
    st.integers(min_value=0, max_value=255),
    st.characters(min_codepoint=0x20, max_codepoint=0x7E),
    max_size=30,
))
def test_cmap_decode_reverse_consistency(mapping):
    cmap = CMap(mapping)
    rev = cmap.reverse()
    # every (code→char) that survives inversion decodes back to itself
    for ch, code in rev.items():
        assert cmap.decode(bytes([code]))[0] == ch


# --- lexer differential property: the C-level dict-entry / numeric-array
# fast paths (lexer._DICT_ENTRY_RE / _NUMARRAY_RE) must parse every
# serialized COS value identically to the per-byte recursive parser the
# fast paths short-circuit. Values are rendered with randomized PDF
# whitespace so the token-boundary lookaheads are exercised.

from pdf_parser_spark.pdfcore.lexer import Name, PdfLexer, Ref  # noqa: E402

_ws = st.sampled_from([" ", "\n", "\r\n", "\t", "  ", " % comment\n"])
_scalar = st.one_of(
    st.integers(min_value=-(10**9), max_value=10**9),
    st.decimals(
        min_value=-1000, max_value=1000, places=3
    ).map(lambda d: float(d)),
    st.booleans(),
    st.none(),
    st.from_regex(r"[A-Za-z0-9.+-]{0,12}", fullmatch=True).map(Name),
    st.builds(
        Ref,
        st.integers(min_value=0, max_value=99999),
        st.integers(min_value=0, max_value=99),
    ),
)
_value = st.recursive(
    _scalar, lambda inner: st.lists(inner, max_size=6), max_leaves=12
)


def _render(v, ws: str) -> str:
    if isinstance(v, Ref):
        return f"{v.num}{ws}{v.gen}{ws}R"
    if isinstance(v, Name):
        return "/" + str(v)
    if v is True:
        return "true"
    if v is False:
        return "false"
    if v is None:
        return "null"
    if isinstance(v, float):
        return repr(v)
    if isinstance(v, list):
        return "[" + ws.join(_render(x, ws) for x in v) + "]"
    return str(v)


def _norm(v):
    # the lexer returns ints for dot-less numerics; mirror that on the
    # expected side (e.g. float 5.0 rendered by repr as "5.0" stays
    # float — only Decimal-sourced whole floats rendered "5" collapse)
    if isinstance(v, list):
        return [_norm(x) for x in v]
    if isinstance(v, float) and "." not in repr(v) and "e" not in repr(v):
        return int(v)
    return v


@settings(max_examples=120, deadline=None)
@given(
    entries=st.dictionaries(
        st.from_regex(r"[A-Za-z0-9]{1,10}", fullmatch=True),
        _value,
        max_size=6,
    ),
    ws=_ws,
)
def test_lexer_dict_differential(entries, ws):
    body = ws.join(f"/{k}{ws}{_render(v, ws)}" for k, v in entries.items())
    data = f"<<{ws}{body}{ws}>>".encode("latin1")
    parsed = PdfLexer(data).parse_object()
    assert parsed == {k: _norm(v) for k, v in entries.items()}
