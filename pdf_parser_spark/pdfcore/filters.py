"""PDF stream filters — FlateDecode (+PNG predictors), ASCIIHex, ASCII85.

The reference gets decompression for free from pikepdf's ``read_bytes()``
(/root/reference/pdf_parser/api.py:80-82); we implement the public-spec
filters directly (ISO 32000-1 §7.4, RFC 1950 zlib, PNG predictor spec).
"""

from __future__ import annotations

import zlib


def apply_png_predictor(data: bytes, colors: int, bpc: int, columns: int) -> bytes:
    """Undo PNG row predictors (ISO 32000-1 §7.4.4.4 / PNG spec §9)."""
    bpp = max(1, (colors * bpc) // 8)  # bytes per pixel
    rowlen = (columns * colors * bpc + 7) // 8
    out = bytearray()
    prev = bytearray(rowlen)
    pos = 0
    n = len(data)
    while pos + 1 <= n:
        ft = data[pos]
        pos += 1
        row = bytearray(data[pos : pos + rowlen])
        if len(row) < rowlen:
            row.extend(b"\x00" * (rowlen - len(row)))
        pos += rowlen
        if ft == 0:  # None
            pass
        elif ft == 1:  # Sub
            for i in range(bpp, rowlen):
                row[i] = (row[i] + row[i - bpp]) & 0xFF
        elif ft == 2:  # Up
            for i in range(rowlen):
                row[i] = (row[i] + prev[i]) & 0xFF
        elif ft == 3:  # Average
            for i in range(rowlen):
                left = row[i - bpp] if i >= bpp else 0
                row[i] = (row[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif ft == 4:  # Paeth
            for i in range(rowlen):
                a = row[i - bpp] if i >= bpp else 0
                b = prev[i]
                c = prev[i - bpp] if i >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                row[i] = (row[i] + pred) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter type {ft}")
        out.extend(row)
        prev = row
    return bytes(out)


def flate_decode(data: bytes, decode_parms: dict | None = None) -> bytes:
    """FlateDecode with optional /Predictor DecodeParms."""
    try:
        raw = zlib.decompress(data)
    except zlib.error:
        # tolerate trailing garbage / missing adler (seen in the wild)
        try:
            raw = zlib.decompressobj().decompress(data)
        except zlib.error as exc:
            # genuinely corrupt stream → ValueError, the kernel's
            # caught taxonomy ("never raises" extract_pdf contract)
            raise ValueError(f"FlateDecode failed: {exc}") from exc
    if decode_parms:
        predictor = int(decode_parms.get("Predictor", 1) or 1)
        if predictor >= 10:
            raw = apply_png_predictor(
                raw,
                int(decode_parms.get("Colors", 1) or 1),
                int(decode_parms.get("BitsPerComponent", 8) or 8),
                int(decode_parms.get("Columns", 1) or 1),
            )
        elif predictor == 2:
            raise ValueError("TIFF predictor 2 not supported")
    return raw


def asciihex_decode(data: bytes) -> bytes:
    body = data.split(b">", 1)[0]
    hexchars = bytes(c for c in body if c not in b"\x00\t\n\x0c\r ")
    if len(hexchars) % 2:
        hexchars += b"0"
    return bytes.fromhex(hexchars.decode("ascii"))


def ascii85_decode(data: bytes) -> bytes:
    import base64

    body = data.replace(b"<~", b"").split(b"~>", 1)[0]
    body = bytes(c for c in body if c not in b"\x00\t\n\x0c\r ")
    return base64.a85decode(body)


_FILTERS = {
    "FlateDecode": flate_decode,
    "Fl": flate_decode,
    "ASCIIHexDecode": lambda d, p=None: asciihex_decode(d),
    "AHx": lambda d, p=None: asciihex_decode(d),
    "ASCII85Decode": lambda d, p=None: ascii85_decode(d),
    "A85": lambda d, p=None: ascii85_decode(d),
}


def decode_stream(raw: bytes, stream_dict: dict, resolve=None) -> bytes:
    """Apply the stream's /Filter chain; *resolve* maps Refs → objects."""

    def rv(x):
        return resolve(x) if resolve is not None else x

    filters = rv(stream_dict.get("Filter"))
    if filters is None:
        return raw
    if not isinstance(filters, list):
        filters = [filters]
    parms = rv(stream_dict.get("DecodeParms") or stream_dict.get("DP"))
    if not isinstance(parms, list):
        parms = [parms] * len(filters)
    data = raw
    for f, p in zip(filters, parms):
        fname = str(f)
        fn = _FILTERS.get(fname)
        if fn is None:
            raise ValueError(f"unsupported stream filter /{fname}")
        data = fn(data, rv(p) if p is not None else None)
    return data
