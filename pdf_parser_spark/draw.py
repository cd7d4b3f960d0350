"""K4 plot sink: render parse results as SVG (dependency-free).

The reference's manual-verification aid draws red rectangles with blue
text labels over the parse output via matplotlib, y-axis inverted to
PDF page orientation (/root/reference/draw.py:735-772). matplotlib is
not in this environment, and a debug overlay does not need it — SVG is
plain text. Same visual semantics: one red outline per rect, the text
label in blue at the rect's top-left, page-style coordinates (origin
top-left, y flipped from PDF space).
"""

from __future__ import annotations

from xml.sax.saxutils import escape


def render_parse_svg(
    results: list[dict], page_width: float = 612.0, page_height: float = 792.0
) -> str:
    """parse_page_text output → SVG document string.

    Rect-less rows (the reference skips them implicitly — it indexes
    ``entry['rect']`` only for present rects) are ignored.
    """
    parts = [
        f'<svg xmlns="http://www.w3.org/2000/svg" '
        f'width="{page_width:g}" height="{page_height:g}" '
        f'viewBox="0 0 {page_width:g} {page_height:g}">',
        f'<rect x="0" y="0" width="{page_width:g}" height="{page_height:g}" '
        'fill="white"/>',
    ]
    for item in results:
        rect = item.get("rect")
        if not rect:
            continue
        x0, y0, x1, y1 = rect["x0"], rect["y0"], rect["x1"], rect["y1"]
        w, h = x1 - x0, y1 - y0
        # PDF origin is bottom-left; SVG's is top-left → flip y
        y_svg = page_height - y1
        parts.append(
            f'<rect x="{x0:g}" y="{y_svg:g}" width="{w:g}" height="{h:g}" '
            'fill="none" stroke="red" stroke-width="1"/>'
        )
        label = escape(str(item.get("text", "")))
        parts.append(
            f'<text x="{x0:g}" y="{y_svg + 8:g}" font-size="8" '
            f'fill="blue">{label}</text>'
        )
    parts.append("</svg>")
    return "\n".join(parts)


def save_parse_svg(results: list[dict], path: str, **kwargs) -> None:
    with open(path, "w", encoding="utf-8") as fh:
        fh.write(render_parse_svg(results, **kwargs))
