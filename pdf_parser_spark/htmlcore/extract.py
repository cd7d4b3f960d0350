"""HTML boilerplate stripping: tag-density + text-block scoring.

Pure Python, regex/stack tokenizer (no lxml/bs4 — not in the container
and not needed at this fidelity). Two-stage classifier:

1. **semantic-first**: if the page declares ``<article>`` or ``<main>``
   regions, the main content is exactly the text blocks inside them
   (scripts/styles excluded). This mirrors readability's preference for
   semantic containers and makes extraction exactly invertible for the
   synthetic corpus (the DuckDB oracle for the HTML flagship query).
2. **density fallback**: otherwise keep blocks whose normalized text is
   ≥ MIN_BLOCK_CHARS with link density ≤ MAX_LINK_DENSITY — the classic
   boilerpipe NumWords/LinkDensity rule reduced to characters.

Whitespace normalization is ASCII-only ([ \\t\\r\\n\\f\\v]) on purpose:
the same class exists verbatim in RE2/DuckDB, keeping the SQL oracle
bit-identical (python's \\s would also eat U+00A0 etc.).
"""

from __future__ import annotations

import html as _html
import re
from dataclasses import dataclass

_TOKEN_RE = re.compile(r"<!--.*?-->|<!\[CDATA\[.*?\]\]>|<[^>]*>|[^<]+", re.S)
_TAG_RE = re.compile(r"<\s*(/?)\s*([a-zA-Z][a-zA-Z0-9:-]*)")
# single-pass tokenizer: same alternatives and order as _TOKEN_RE, but
# named tags capture (closing, name) directly so the hot loop never
# re-matches _TAG_RE; group(3) present = text, group(2) = named tag,
# neither = comment/CDATA/nameless markup (skipped, uncounted — same
# as _TAG_RE failing to match)
_TOKEN_TAG_RE = re.compile(
    r"<!--.*?-->|<!\[CDATA\[.*?\]\]>"
    r"|<\s*(/?)\s*([a-zA-Z][a-zA-Z0-9:-]*)[^>]*>"
    r"|<[^>]*>"
    r"|([^<]+)",
    re.S,
)
_WS_RE = re.compile(r"[ \t\r\n\f\v]+")
_ASCII_WS = " \t\r\n\f\v"

BLOCK_TAGS = frozenset(
    """p div h1 h2 h3 h4 h5 h6 li ul ol dl dt dd td th tr table thead tbody
    article section header footer nav aside main blockquote pre br hr form
    fieldset figure figcaption address body html head title""".split()
)
SKIP_TAGS = frozenset("script style noscript template svg iframe".split())
SEMANTIC_MAIN = frozenset(("article", "main"))
BOILERPLATE_CONTAINERS = frozenset(("nav", "footer", "aside", "header", "form"))

MIN_BLOCK_CHARS = 25
MAX_LINK_DENSITY = 0.33


def normalize_ws(text: str) -> str:
    return _WS_RE.sub(" ", text).strip(_ASCII_WS)


@dataclass
class Block:
    text: str  # normalized
    in_main: bool  # inside <article>/<main>
    in_boiler: bool  # inside nav/footer/aside/header/form
    link_chars: int
    total_chars: int
    tag_count: int

    @property
    def link_density(self) -> float:
        return self.link_chars / self.total_chars if self.total_chars else 0.0


def html_blocks(html_text: str) -> list[Block]:
    """Segment an HTML document into normalized text blocks with features."""
    blocks: list[Block] = []
    buf: list[str] = []
    buf_link_chars = 0
    buf_tag_count = 0
    skip_depth = 0
    main_depth = 0
    boiler_depth = 0
    a_depth = 0

    def flush() -> None:
        nonlocal buf, buf_link_chars, buf_tag_count
        if not buf:  # nothing buffered: only the tag counter can be set
            buf_tag_count = 0
            return
        raw = "".join(buf)
        text = normalize_ws(raw)
        if text:
            blocks.append(
                Block(
                    text=text,
                    in_main=main_depth > 0,
                    in_boiler=boiler_depth > 0,
                    link_chars=buf_link_chars,
                    total_chars=len(text),
                    tag_count=buf_tag_count,
                )
            )
        buf = []
        buf_link_chars = 0
        buf_tag_count = 0

    for m in _TOKEN_TAG_RE.finditer(html_text):
        text = m.group(3)
        if text is not None:
            if skip_depth > 0:
                continue
            text = _html.unescape(text)
            buf.append(text)
            if a_depth > 0:
                buf_link_chars += len(normalize_ws(text))
            continue
        name = m.group(2)
        if name is None:  # comment / CDATA / nameless markup
            continue
        closing = m.group(1) == "/"
        tag = name.lower()
        self_closing = m.group(0).endswith("/>") or tag in ("br", "hr", "img", "input", "meta", "link")
        buf_tag_count += 1
        if tag in SKIP_TAGS:
            if not self_closing:
                skip_depth = max(0, skip_depth - 1) if closing else skip_depth + 1
            continue
        if tag in BLOCK_TAGS:
            flush()
        if tag in SEMANTIC_MAIN and not self_closing:
            main_depth = max(0, main_depth - 1) if closing else main_depth + 1
        if tag in BOILERPLATE_CONTAINERS and not self_closing:
            boiler_depth = max(0, boiler_depth - 1) if closing else boiler_depth + 1
        if tag == "a":
            a_depth = max(0, a_depth - 1) if closing else a_depth + 1
    flush()
    return blocks


def extract_html(html_text: str) -> str:
    """Main-content text of an HTML document (blocks joined by newline)."""
    blocks = html_blocks(html_text)
    main = [b for b in blocks if b.in_main]
    if main:
        return "\n".join(b.text for b in main)
    kept = [
        b
        for b in blocks
        if not b.in_boiler
        and b.total_chars >= MIN_BLOCK_CHARS
        and b.link_density <= MAX_LINK_DENSITY
    ]
    return "\n".join(b.text for b in kept)
