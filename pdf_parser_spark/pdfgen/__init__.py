"""Deterministic synthetic PDF writer — test/corpus infrastructure only.

Never imported by the extraction path; exists so golden tests and the
synthetic Common-Crawl-style corpus can cover the kernel's surface
(classic xref, xref streams, object streams, FlateDecode, /Contents
arrays, ToUnicode bfchar/bfrange, CID-code skip, multi-column layouts)
without any third-party PDF library.
"""

from .writer import (  # noqa: F401
    FontSpec,
    build_pdf,
    make_text_pdf,
    pdf_escape,
    text_to_pdf,
    expected_text_from_source,
)
