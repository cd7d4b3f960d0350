"""Minimal .xlsx reader (S5) — zip + worksheet XML + shared strings.

The reference loads its replacement table with ``pd.read_excel``
(openpyxl underneath, /root/reference/pdf_gui.py:1671-1694); openpyxl
is absent in this container, and an xlsx file is just a zip of small
XML parts (ECMA-376), so this module reads the subset a replacement
table actually uses: the first worksheet's cells with shared-string
(``t="s"``), inline-string (``t="inlineStr"``), formula-string
(``t="str"``) and numeric values. Dates/styles/formulas-as-values are
out of scope — the batch-replace table is text.

At corpus scale the same table loads once on the driver and broadcasts
(it parameterizes the rewrite, it is not data).
"""

from __future__ import annotations

import re
import zipfile
from xml.etree import ElementTree

_NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
_COL_RE = re.compile(r"([A-Z]+)(\d+)")


def _col_index(ref: str) -> tuple[int, int]:
    """'B3' → (row 2, col 1), zero-based."""
    m = _COL_RE.match(ref)
    if not m:
        raise ValueError(f"bad cell reference {ref!r}")
    col = 0
    for ch in m.group(1):
        col = col * 26 + (ord(ch) - 64)
    return int(m.group(2)) - 1, col - 1


def _shared_strings(zf: zipfile.ZipFile) -> list[str]:
    try:
        raw = zf.read("xl/sharedStrings.xml")
    except KeyError:
        return []
    root = ElementTree.fromstring(raw)
    out = []
    for si in root.findall(f"{_NS}si"):
        # plain <t> or rich-text runs <r><t>…</t></r> — concatenate
        out.append("".join(t.text or "" for t in si.iter(f"{_NS}t")))
    return out


def _first_sheet_name(zf: zipfile.ZipFile) -> str:
    names = sorted(
        n
        for n in zf.namelist()
        if n.startswith("xl/worksheets/") and n.endswith(".xml")
    )
    if not names:
        raise ValueError("xlsx has no worksheets")
    return names[0]


def read_xlsx(path: str) -> list[list[str]]:
    """First worksheet as a dense list of string rows (sparse cells
    become '' — the replacement-table convention for empty slots)."""
    cells: dict[tuple[int, int], str] = {}
    with zipfile.ZipFile(path) as zf:
        shared = _shared_strings(zf)
        root = ElementTree.fromstring(zf.read(_first_sheet_name(zf)))
        for c in root.iter(f"{_NS}c"):
            ref = c.get("r")
            if not ref:
                continue
            row, col = _col_index(ref)
            ctype = c.get("t", "n")
            if ctype == "inlineStr":
                is_el = c.find(f"{_NS}is")
                val = (
                    "".join(t.text or "" for t in is_el.iter(f"{_NS}t"))
                    if is_el is not None
                    else ""
                )
            else:
                v = c.find(f"{_NS}v")
                raw = v.text if v is not None and v.text is not None else ""
                if ctype == "s":
                    val = shared[int(raw)] if raw else ""
                else:  # "str", "n", "b"
                    val = raw
            cells[(row, col)] = val
    if not cells:
        return []
    nrows = max(r for r, _ in cells) + 1
    ncols = max(c for _, c in cells) + 1
    return [
        [cells.get((r, c), "") for c in range(ncols)] for r in range(nrows)
    ]


def write_xlsx(path: str, rows: list[list[str]]) -> None:
    """Minimal valid .xlsx writer (shared-strings flavour) — lets tests
    and sinks produce real fixtures without openpyxl."""

    def esc(s: str) -> str:
        return (
            s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
        )

    strings: list[str] = []
    index: dict[str, int] = {}
    body = []
    for r, row in enumerate(rows, start=1):
        cs = []
        for ci, val in enumerate(row):
            col = ""
            n = ci + 1
            while n:
                n, rem = divmod(n - 1, 26)
                col = chr(65 + rem) + col
            if val == "":
                continue
            if val not in index:
                index[val] = len(strings)
                strings.append(val)
            cs.append(f'<c r="{col}{r}" t="s"><v>{index[val]}</v></c>')
        body.append(f'<row r="{r}">{"".join(cs)}</row>')
    sheet = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
        f'<sheetData>{"".join(body)}</sheetData></worksheet>'
    )
    sst = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" '
        f'count="{len(strings)}" uniqueCount="{len(strings)}">'
        + "".join(f"<si><t>{esc(s)}</t></si>" for s in strings)
        + "</sst>"
    )
    workbook = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" '
        'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">'
        '<sheets><sheet name="Sheet1" sheetId="1" r:id="rId1"/></sheets></workbook>'
    )
    wb_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
        '<Relationship Id="rId1" '
        'Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" '
        'Target="worksheets/sheet1.xml"/>'
        '<Relationship Id="rId2" '
        'Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/sharedStrings" '
        'Target="sharedStrings.xml"/></Relationships>'
    )
    rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
        '<Relationship Id="rId1" '
        'Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" '
        'Target="xl/workbook.xml"/></Relationships>'
    )
    ctypes = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
        '<Default Extension="rels" '
        'ContentType="application/vnd.openxmlformats-package.relationships+xml"/>'
        '<Default Extension="xml" ContentType="application/xml"/>'
        '<Override PartName="/xl/workbook.xml" '
        'ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
        '<Override PartName="/xl/worksheets/sheet1.xml" '
        'ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>'
        '<Override PartName="/xl/sharedStrings.xml" '
        'ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sharedStrings+xml"/>'
        "</Types>"
    )
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("[Content_Types].xml", ctypes)
        zf.writestr("_rels/.rels", rels)
        zf.writestr("xl/workbook.xml", workbook)
        zf.writestr("xl/_rels/workbook.xml.rels", wb_rels)
        zf.writestr("xl/sharedStrings.xml", sst)
        zf.writestr("xl/worksheets/sheet1.xml", sheet)
