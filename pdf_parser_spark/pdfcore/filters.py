"""PDF stream filters — FlateDecode (+PNG predictors), LZW, RunLength,
ASCIIHex, ASCII85.

The reference gets decompression for free from pikepdf's ``read_bytes()``
(/root/reference/pdf_parser/api.py:80-82); we implement the public-spec
filters directly (ISO 32000-1 §7.4, RFC 1950 zlib, PNG predictor spec,
TIFF/GIF-style LZW with PDF's EarlyChange default).
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


# Decompression-bomb ceiling for the amplifying filters (Flate ~1000:1,
# LZW ~1500:1, RunLength 128:1): a measured 2 MB flate stream inflates
# to 2 GiB in ~7 s — one hostile PDF per executor core OOMs the stage.
# 256 MiB passes any real content stream / CMap / ObjStm / xref stream
# by orders of magnitude; oversize decode raises ValueError (the
# kernel's caught taxonomy, so it becomes an audited error row).
MAX_DECODED_STREAM_BYTES = 256 * 1024 * 1024


def flate_decode(data: bytes, decode_parms: dict | None = None) -> bytes:
    """FlateDecode with optional /Predictor DecodeParms, output-capped
    (decompressobj + max_length — the bomb never materializes).
    Trailing garbage / missing adler are tolerated (seen in the wild);
    genuinely corrupt data raises ValueError."""
    try:
        d = zlib.decompressobj()
        raw = d.decompress(data, MAX_DECODED_STREAM_BYTES + 1)
    except zlib.error as exc:
        # genuinely corrupt stream → ValueError, the kernel's
        # caught taxonomy ("never raises" extract_pdf contract)
        raise ValueError(f"FlateDecode failed: {exc}") from exc
    if len(raw) > MAX_DECODED_STREAM_BYTES:
        raise ValueError(
            f"FlateDecode output exceeds {MAX_DECODED_STREAM_BYTES} bytes"
        )
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


def runlength_decode(data: bytes) -> bytes:
    """RunLengthDecode (ISO 32000-1 §7.4.5): length byte L then either
    L+1 literal bytes (L ≤ 127) or one byte repeated 257−L times
    (L ≥ 129); 128 = EOD."""
    out = bytearray()
    pos = 0
    n = len(data)
    while pos < n:
        length = data[pos]
        pos += 1
        if length == 128:  # EOD
            break
        if length < 128:
            chunk = data[pos : pos + length + 1]
            if len(chunk) < length + 1:
                raise ValueError("RunLengthDecode: truncated literal run")
            out += chunk
            pos += length + 1
        else:
            if pos >= n:
                raise ValueError("RunLengthDecode: truncated repeat run")
            out += bytes([data[pos]]) * (257 - length)
            pos += 1
        if len(out) > MAX_DECODED_STREAM_BYTES:
            raise ValueError(
                f"RunLengthDecode output exceeds {MAX_DECODED_STREAM_BYTES} bytes"
            )
    return bytes(out)


def lzw_decode(data: bytes, decode_parms: dict | None = None) -> bytes:
    """LZWDecode (ISO 32000-1 §7.4.4.2): MSB-first variable-width codes,
    9→12 bits, clear=256, EOD=257. PDF's /EarlyChange default (1) bumps
    the code width one code early — matching TIFF, not GIF."""
    early = 1
    if decode_parms:
        early = int(decode_parms.get("EarlyChange", 1) or 0)
    table: list[bytes] = [bytes([i]) for i in range(256)] + [b"", b""]
    out = bytearray()
    prev: bytes | None = None
    width = 9
    acc = 0
    nbits = 0
    for byte in data:
        acc = (acc << 8) | byte
        nbits += 8
        while nbits >= width:
            code = (acc >> (nbits - width)) & ((1 << width) - 1)
            nbits -= width
            if code == 256:  # clear table
                table = [bytes([i]) for i in range(256)] + [b"", b""]
                width = 9
                prev = None
                continue
            if code == 257:  # EOD
                if decode_parms and int(decode_parms.get("Predictor", 1) or 1) >= 10:
                    return apply_png_predictor(
                        bytes(out),
                        int(decode_parms.get("Colors", 1) or 1),
                        int(decode_parms.get("BitsPerComponent", 8) or 8),
                        int(decode_parms.get("Columns", 1) or 1),
                    )
                return bytes(out)
            if code < len(table):
                entry = table[code]
                if not entry and code >= 258:
                    raise ValueError(f"LZWDecode: reference to empty code {code}")
            elif code == len(table) and prev is not None:
                entry = prev + prev[:1]
            else:
                raise ValueError(f"LZWDecode: invalid code {code}")
            out += entry
            if len(out) > MAX_DECODED_STREAM_BYTES:
                raise ValueError(
                    f"LZWDecode output exceeds {MAX_DECODED_STREAM_BYTES} bytes"
                )
            if prev is not None:
                table.append(prev + entry[:1])
            prev = entry
            # EarlyChange=1 (default): widen one code early, when the
            # NEXT code to be assigned is 2^width − 1 (§7.4.4.2)
            if len(table) >= (1 << width) - early and width < 12:
                width += 1
    raise ValueError("LZWDecode: missing EOD marker")


def lzw_encode(data: bytes, early: int = 1) -> bytes:
    """LZW encoder (fixture/round-trip twin of :func:`lzw_decode`):
    MSB-first variable-width codes with the same EarlyChange width
    schedule, clear-and-reset when the table fills."""
    out = bytearray()
    acc = 0
    nbits = 0
    width = 9
    next_code = 258
    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}

    def emit(code: int) -> None:
        nonlocal acc, nbits
        acc = (acc << width) | code
        nbits += width
        while nbits >= 8:
            out.append((acc >> (nbits - 8)) & 0xFF)
            nbits -= 8

    def maybe_widen() -> None:
        nonlocal width
        # twin of the decoder rule: the code about to be emitted is read
        # by a decoder whose table holds next_code − 1 entries
        while width < 12 and next_code + early - 1 >= (1 << width):
            width += 1

    emit(256)  # leading clear (conventional; decoder tolerates it)
    w = b""
    for byte in data:
        k = w + bytes([byte])
        if k in table:
            w = k
            continue
        maybe_widen()
        emit(table[w])
        if next_code >= 4093:  # table nearly full: clear and restart
            maybe_widen()
            emit(256)
            table = {bytes([i]): i for i in range(256)}
            next_code = 258
            width = 9
        else:
            table[k] = next_code
            next_code += 1
        w = bytes([byte])
    if w:
        maybe_widen()
        emit(table[w])
        next_code += 1  # decoder will add an entry after this code
    maybe_widen()
    emit(257)  # EOD
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


def runlength_encode(data: bytes) -> bytes:
    """RunLength encoder twin: greedy runs ≥ 3 become repeats, the rest
    literal chunks of ≤ 128; terminated by the 128 EOD byte."""
    out = bytearray()
    pos = 0
    n = len(data)
    lit_start = pos
    while pos < n:
        run = 1
        while pos + run < n and run < 128 and data[pos + run] == data[pos]:
            run += 1
        if run >= 3:
            while lit_start < pos:
                take = min(128, pos - lit_start)
                out.append(take - 1)
                out += data[lit_start : lit_start + take]
                lit_start += take
            out.append(257 - run)
            out.append(data[pos])
            pos += run
            lit_start = pos
        else:
            pos += run
    while lit_start < pos:
        take = min(128, pos - lit_start)
        out.append(take - 1)
        out += data[lit_start : lit_start + take]
        lit_start += take
    out.append(128)  # EOD
    return bytes(out)


_FILTERS = {
    "FlateDecode": flate_decode,
    "Fl": flate_decode,
    "LZWDecode": lzw_decode,
    "LZW": lzw_decode,
    "RunLengthDecode": lambda d, p=None: runlength_decode(d),
    "RL": lambda d, p=None: runlength_decode(d),
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
