"""Deterministic HTML page generator for the synthetic web corpus.

Wraps source text in a realistic page shell — nav with links, sidebar,
ad divs, footer — with one ``<p>`` per source line inside ``<article>``.
``expected_text_from_html_source`` is the exact inverse under
``htmlcore.extract_html`` and is SQL-expressible for the DuckDB oracle.
"""

from __future__ import annotations

import html as _html
import re

_WS_RE = re.compile(r"[ \t\r\n\f\v]+")

_SHELL_TOP = """<!DOCTYPE html>
<html lang="{lang}">
<head>
<meta charset="utf-8">
<title>{title}</title>
<style>body {{ font-family: sans-serif; }}</style>
<script>var trackingId = "{tid}";</script>
</head>
<body>
<header>
<nav><ul>
<li><a href="/">Home</a></li>
<li><a href="/about">About our site and mission statement</a></li>
<li><a href="/products">Products and services catalog</a></li>
<li><a href="/contact">Contact the team</a></li>
</ul></nav>
</header>
<aside class="sidebar">
<div class="ad">Buy one get one free — limited time offer, click here now!</div>
<ul class="related">
<li><a href="/post/1">Ten things you never knew about parsing</a></li>
<li><a href="/post/2">The definitive guide to nothing in particular</a></li>
</ul>
</aside>
<article>
"""

_SHELL_BOTTOM = """</article>
<footer>
<p>Copyright 2024 Example Site. All rights reserved. Terms of service apply.</p>
<nav><a href="/privacy">Privacy</a> | <a href="/terms">Terms</a> | <a href="/rss">RSS</a></nav>
<nav class="partners">{partners}</nav>
</footer>
</body>
</html>
"""


def _host_of(x: int) -> str:
    """Same host formula as engine.corpus.host_for (kept inline —
    importing engine from htmlcore would be circular)."""
    if x % 10 < 4:
        return "heavy.example.org"
    return f"site-{x % 97}.example.com"


def related_targets(doc_id: int) -> list[int]:
    """Deterministic cross-document outlink target ids for a page.
    Shared contract with the linkgraph oracle SQL (queries.py): the
    k-th footer partner link of page ``doc_id`` points at document
    ``doc_id * 31 + k`` on that document's host."""
    return [doc_id * 31 + k for k in (1, 2, 3)]


def related_links(doc_id: int) -> list[str]:
    """Absolute cross-host partner URLs emitted in the page footer —
    the only ``https?://`` hrefs in a generated page, so outlink
    extraction over the raw payload recovers exactly these."""
    return [f"https://{_host_of(t)}/doc/{t}" for t in related_targets(doc_id)]


def text_to_html(text: str, lang: str = "en", doc_id: int = 0) -> str:
    """Corpus transform: source text → boilerplate-wrapped HTML page."""
    lines = text.split("\n")
    title = _html.escape(lines[0][:60]) if lines and lines[0] else "Untitled"
    body = "\n".join(f"<p>{_html.escape(line)}</p>" for line in lines)
    # anchor text carries the target id ("Partner <t>") so anchor-text
    # extraction (functions/linkgraph.py extract_anchors) has real,
    # target-derived content to recover — still an all-link nav block,
    # so the boilerplate stripper drops it from extracted text
    partners = " | ".join(
        f'<a href="{u}">Partner {u.rsplit("/", 1)[1]}</a>'
        for u in related_links(doc_id)
    )
    return (
        _SHELL_TOP.format(lang=lang, title=title, tid=f"tid-{doc_id}")
        + body
        + "\n"
        + _SHELL_BOTTOM.format(partners=partners)
    )


def expected_text_from_html_source(text: str) -> str:
    """What ``extract_html(text_to_html(text))`` must return: per line,
    collapse ASCII whitespace runs to a single space, strip, drop empties,
    join with newline. DuckDB oracle equivalent:

        trim(regexp_replace(line, '[ \\t\\r\\f\\v]+', ' ', 'g')) per line
    """
    out = []
    for line in text.split("\n"):
        norm = _WS_RE.sub(" ", line).strip(" \t\r\f\v")
        if norm:
            out.append(norm)
    return "\n".join(out)
