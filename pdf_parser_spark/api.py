"""Reference-compatible single-document API.

Drop-in equivalents of the reference's public surface
(/root/reference/pdf_parser/api.py) so an existing user can switch:

- ``parse_page_text(pdf, page_num)``        (api.py:6-390)
- ``search_text_in_pdf(pdf, text, ...)``    (api.py:395-484)
- ``PDFTextReplacer``                       (api.py:486-576)

Differences, by design (SURVEY.md §7.3):

- input is a filesystem path *or* raw bytes — the engine is
  bytes-first (documents live in table columns, not local files);
- geometry comes from this engine's own Tm/Td//Widths interpreter
  (tokenizer.extract_spans) instead of PyMuPDF's layout engine: rects
  are the text-space bbox (x, y, x+width, y+size). Text output is
  byte-identical to the reference; rect values are self-consistent but
  not PyMuPDF-identical (SURVEY.md §7.3 item 3);
- the rewrite path (``replace_text`` / ``replace_pdf_text``) is
  supported via the from-scratch kernel in ``pdfcore/rewrite.py``:
  census → validation → segment splice → INCREMENTAL-update output
  (original bytes preserved, ISO 32000-1 §7.5.6) instead of a pikepdf
  re-save. ``allow_auto_insert=True`` runs the WORKING form of the
  reference's auto-insert (safe-code allocation, CMap/Widths merge,
  glyph program embedding) — the reference's own path is broken
  (embedding.py:68 imports a function that does not exist;
  SURVEY.md §3.3).

Spark is intentionally not imported here: this is the per-document
kernel surface, usable inside UDFs or standalone.
"""

from __future__ import annotations

import os

from .pdfcore.document import PdfDocument
from .pdfcore.extract import _font_cmaps_and_metrics, extract_pdf
from .pdfcore.tokenizer import Span

__all__ = [
    "parse_page_text",
    "search_text_in_pdf",
    "replace_pdf_text",
    "PDFTextReplacer",
]


def _as_bytes(pdf) -> bytes:
    if isinstance(pdf, (bytes, bytearray)):
        return bytes(pdf)
    if isinstance(pdf, (str, os.PathLike)):
        with open(pdf, "rb") as fh:
            return fh.read()
    raise TypeError(f"pdf must be bytes or path, got {type(pdf).__name__}")


def _span_rect(span: Span) -> dict:
    return {
        "x0": span.x,
        "y0": span.y,
        "x1": span.x + span.width,
        "y1": span.y + span.size,
    }


def _containment_filter(results: list[dict]) -> list[dict]:
    """Reference F1 nested-bbox filter (api.py:337-388), semantics-exact:

    - every result gets area = rect area (0 when rect is None);
    - stable sort by area DESC — the returned order IS this order, not
      document order;
    - rect-less results are always kept;
    - a result is dropped iff its rect is fully contained (>=/<= on all
      four edges) in the rect of ANY earlier entry of the sorted list —
      which includes equal-area duplicates, so exact-duplicate rects
      collapse to the first.
    """
    if not results:
        return results
    for result in results:
        rect = result.get("rect")
        result["_area"] = (
            (rect["x1"] - rect["x0"]) * (rect["y1"] - rect["y0"]) if rect else 0
        )
    sorted_results = sorted(results, key=lambda x: x["_area"], reverse=True)
    filtered: list[dict] = []
    kept_rects: list[dict] = []
    for result in sorted_results:
        rect1 = result.get("rect")
        if not rect1:
            filtered.append(result)
            continue
        # the reference checks against ALL earlier sorted entries (kept
        # or dropped, api.py:365-377); containment is transitive and
        # every dropped entry sits inside some kept one, so checking
        # kept rects only is result-identical and O(kept) not O(n).
        contained = any(
            rect1["x0"] >= r2["x0"]
            and rect1["y0"] >= r2["y0"]
            and rect1["x1"] <= r2["x1"]
            and rect1["y1"] <= r2["y1"]
            for r2 in kept_rects
        )
        if not contained:
            filtered.append(result)
            kept_rects.append(rect1)
    for result in filtered:
        result.pop("_area", None)
    return filtered


def parse_page_text(pdf, page_num: int = 0) -> list[dict]:
    """Parse one page into the reference's result-dict list.

    Output shape mirrors api.py:189-195 / README.md:228-245:
    ``{text, rect, font, encoded_bytes, instance_index}`` per element.
    ``rect`` is None when no span aligned with the decoded item (the
    reference's unmatched-geometry case — its left-outer J1 semantics,
    api.py:151-169). Like the reference, the returned list passes the
    nested-bbox containment filter and arrives in rect-area-descending
    order (api.py:337-390), NOT document order. Page elements produced
    by the degraded fallback sweep carry ``source='literal_sweep'``
    and no font/encoded_bytes (mirroring the reference's
    ``source='pymupdf_basic'`` fallback rows, api.py:235-258).
    """
    r = extract_pdf(_as_bytes(pdf))
    if r.error and not r.items:
        raise ValueError(f"failed to parse PDF: {r.error}")
    if page_num < 0 or page_num >= max(r.n_pages, 1):
        raise ValueError(f"page {page_num} out of range (0..{r.n_pages - 1})")

    page_spans = [s for s, pg in zip(r.spans, r.span_pages) if pg == page_num]
    results: list[dict] = []
    cursor = 0  # forward-only span consumption (reference F4 semantics)
    for pno, font, text, encoded, instance_index in r.items:
        if pno != page_num:
            continue
        rect = None
        for i in range(cursor, len(page_spans)):
            if page_spans[i].text.strip() == text:
                rect = _span_rect(page_spans[i])
                cursor = i + 1
                break
        if font is None:  # degraded fallback row
            results.append(
                {
                    "text": text,
                    "rect": rect,
                    "source": "literal_sweep",
                    "instance_index": instance_index,
                }
            )
        else:
            results.append(
                {
                    "text": text,
                    "rect": rect,
                    "font": font,
                    "encoded_bytes": encoded.hex(),
                    "instance_index": instance_index,
                }
            )
    return _containment_filter(results)


def search_text_in_pdf(
    pdf, search_text: str, page_num: int | None = None, case_sensitive: bool = False
) -> list[dict]:
    """Find occurrences of *search_text* across one page or all pages.

    Output shape mirrors api.py:462-473 / README.md:206-224:
    ``{page, text, context, rect, block_order}`` per hit, ordered by
    (page, block_order). ``block_order`` is the span's sequence number
    within its page (the content-stream block ordinal); ``context`` is
    the span text truncated to 100 chars (example.py:249-252). The hit
    rect uses per-character x positions from the span interpreter, so
    it covers just the matched substring.
    """
    if not search_text:
        return []
    r = extract_pdf(_as_bytes(pdf))
    if r.error and not r.spans:
        raise ValueError(f"failed to parse PDF: {r.error}")

    needle = search_text if case_sensitive else search_text.lower()
    hits: list[dict] = []
    for span, pg in zip(r.spans, r.span_pages):
        if page_num is not None and pg != page_num:
            continue
        hay = span.text if case_sensitive else span.text.lower()
        start = hay.find(needle)
        while start != -1:
            end = start + len(needle)
            if len(span.char_xs) == len(span.text) and span.char_xs:
                x0 = span.char_xs[start]
                x1 = (
                    span.char_xs[end]
                    if end < len(span.char_xs)
                    else span.x + span.width
                )
            else:  # multi-byte decode widths unavailable: whole-span rect
                x0, x1 = span.x, span.x + span.width
            hits.append(
                {
                    "page": pg,
                    "text": search_text,
                    "context": span.text[:100],
                    "rect": {"x0": x0, "y0": span.y, "x1": x1, "y1": span.y + span.size},
                    "block_order": span.seq,
                }
            )
            start = hay.find(needle, start + 1)
    hits.sort(key=lambda h: (h["page"], h["block_order"]))
    return hits


class PDFTextReplacer:
    """Facade mirroring the reference's class surface (api.py:486-576).

    Read-side methods are fully supported; the write side
    (replace_text) rewrites via the incremental-update engine
    (pdfcore.rewrite). Auto-insert of missing glyph codes remains
    unsupported and is documented as such in replace_text.
    """

    def __init__(self, pdf):
        self._data = _as_bytes(pdf)
        self._doc = PdfDocument(self._data)

    # -- read surface -------------------------------------------------

    def parse_page_text(self, page_num: int = 0) -> list[dict]:
        return parse_page_text(self._data, page_num)

    def search_text(
        self, search_text: str, page_num: int | None = None,
        case_sensitive: bool = False,
    ) -> list[dict]:
        return search_text_in_pdf(self._data, search_text, page_num, case_sensitive)

    def get_font_cmaps(self, page_num: int = 0) -> dict[str, dict[str, str]]:
        """Per-font code→char maps for one page (analysis.py:103-140):
        ``{font_name: {byte_code_hex: unicode_char}}``."""
        pages = self._doc.pages()
        if page_num < 0 or page_num >= len(pages):
            raise ValueError(f"page {page_num} out of range")
        cmaps, _ = _font_cmaps_and_metrics(self._doc, pages[page_num])
        return {
            font: {f"{code:02x}": ch for code, ch in cmap.mapping.items()}
            for font, cmap in cmaps.items()
        }

    def get_font_encodings(self, page_num: int = 0) -> dict[str, dict[int, str]]:
        """Per-font code→glyph-name maps from /Encoding /Differences
        arrays (reference fonts/analysis.py:31-67): ``{font_name:
        {code: '/GlyphName'}}``. Fonts without a custom encoding
        dictionary map to {} — like the reference, standard named
        encodings are not expanded."""
        from .pdfcore.extract import font_encoding_differences

        pages = self._doc.pages()
        if page_num < 0 or page_num >= len(pages):
            raise ValueError(f"page {page_num} out of range")
        return {
            fname: font_encoding_differences(self._doc, fdict)
            for fname, fdict in self._doc.page_fonts(pages[page_num]).items()
        }

    def analyze_fonts(self) -> dict[str, dict]:
        """Whole-document font census (replacer.py:119-221 semantics):
        per font, the set of decoded chars used and the byte codes that
        encode them — the reference's A2/A3/A4 aggregations."""
        r = extract_pdf(self._data)
        chars: dict[str, set] = {}
        codes: dict[str, dict[str, set]] = {}
        used: dict[str, set] = {}
        pages = self._doc.pages()
        page_cmaps = [
            _font_cmaps_and_metrics(self._doc, p)[0] for p in pages
        ]
        for pno, font, text, encoded, _ in r.items:
            cmap = page_cmaps[pno].get(font) if pno < len(page_cmaps) else None
            mapping = cmap.mapping if cmap is not None else {}
            chars.setdefault(font, set()).update(text)
            used.setdefault(font, set()).update(encoded)
            fc = codes.setdefault(font, {})
            for b in encoded:
                ch = mapping.get(b)
                if ch is not None:
                    fc.setdefault(ch, set()).add(b)
        return {
            font: {
                "chars": sorted(chars[font]),
                "char_codes": {c: sorted(v) for c, v in codes.get(font, {}).items()},
                "used_codes": sorted(used.get(font, set())),
            }
            for font in chars
        }

    # -- write surface ------------------------------------------------

    def replace_text(
        self,
        target_text: str,
        replacement_text: str,
        page_num: int = 0,
        instance_index: int = -1,
        allow_auto_insert: bool = False,
    ):
        """Replace text on one page; returns a ``ReplaceResult`` whose
        ``.data`` holds the rewritten document (an incremental update —
        original bytes preserved as a prefix).

        Bytes-first divergence from the reference (api.py:500): its
        class method takes input/output *paths*; this engine's document
        already lives in ``self._data``. The path-based reference shape
        is module-level :func:`replace_pdf_text`. ``allow_auto_insert``
        enables the WORKING form of the reference's auto-insert
        (safe-code allocation + CMap/Widths/Differences merge + glyph
        program embedding; the reference's own path is broken —
        embedding.py:68 imports a nonexistent function)."""
        from .pdfcore.rewrite import replace_text as _replace

        return _replace(
            self._data,
            target_text,
            replacement_text,
            page_num,
            instance_index,
            allow_auto_insert=allow_auto_insert,
        )


def replace_pdf_text(
    input_pdf,
    output_pdf,
    target_text: str,
    replacement_text: str,
    page_num: int = 0,
    instance_index: int = -1,
    debug: bool = False,
    allow_auto_insert: bool = False,
    verbose: int = 1,
) -> bool:
    """Reference api.py:581-613 shape: read *input_pdf* (path or
    bytes), replace, write *output_pdf* (path; pass None to skip the
    write), return success bool. On cancellation/failure the reference
    copies the input through unchanged — mirrored here by writing the
    original bytes."""
    from .pdfcore.rewrite import replace_text as _replace

    data = _as_bytes(input_pdf)
    result = _replace(
        data,
        target_text,
        replacement_text,
        page_num,
        instance_index,
        allow_auto_insert=allow_auto_insert,
    )
    if output_pdf is not None:
        with open(output_pdf, "wb") as fh:
            fh.write(result.data)
    return result.success
