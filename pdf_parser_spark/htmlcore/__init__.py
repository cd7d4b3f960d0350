"""DOM-heuristic HTML main-content extraction (north rule requirement).

The reference handles only PDFs; the north rule adds boilerplate
stripping for non-PDF payloads. The design follows public techniques
(Arc90 readability / boilerpipe): tokenize → block segmentation at
block-level tags → per-block features (text length, link density, tag
density) → semantic-tag-first classifier → concatenate main blocks.
"""

from .extract import extract_html, html_blocks  # noqa: F401
from .gen import text_to_html, expected_text_from_html_source  # noqa: F401
