"""GIF decoder (GIF87a/GIF89a) — pure Python, from the public spec.

Closes the last raster-decode gap in the multimodal path: first frame
only (a training pipeline wants a representative raster, not the
animation), LZW decompression per the GIF spec's variable-code-width
scheme, global/local color tables, interlace, and GIF89a transparency
(transparent pixels keep the palette color; alpha is out of scope for
the 3-channel feature path).
"""

from __future__ import annotations


def _lzw_decode(min_code_size: int, data: bytes, expected: int) -> bytearray:
    """GIF-flavour LZW: variable code width from min_code_size+1 up to
    12 bits, CLEAR resets the table, EOI ends the stream."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    # bit reader: LSB-first across the concatenated sub-block bytes
    acc = 0
    nbits = 0
    pos = 0
    n = len(data)

    def init_table() -> tuple[dict[int, bytes], int, int]:
        table = {i: bytes([i]) for i in range(clear)}
        return table, clear + 2, min_code_size + 1

    table, next_code, width = init_table()
    prev: bytes | None = None
    while len(out) < expected:
        while nbits < width:
            if pos >= n:
                return out  # truncated stream: return what decoded
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table, next_code, width = init_table()
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            entry = table.get(code)
            if entry is None:
                raise ValueError("bad first LZW code")
        elif code in table:
            entry = table[code]
        elif code == next_code:
            entry = prev + prev[:1]  # the KwKwK case
        else:
            raise ValueError("LZW code out of range")
        out += entry
        if prev is not None and next_code < 4096:
            table[next_code] = prev + entry[:1]
            next_code += 1
            if next_code == (1 << width) and width < 12:
                width += 1
        prev = entry
    return out


def _color_table(data: bytes, pos: int, size_field: int) -> tuple[list[bytes], int]:
    n = 2 << size_field  # 2^(size+1) entries
    table = [data[pos + 3 * i : pos + 3 * i + 3] for i in range(n)]
    return table, pos + 3 * n


_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def decode_gif(data: bytes) -> tuple[int, int, int, bytes]:
    """First frame of a GIF → (width, height, 3, RGB pixels).

    The frame is composited onto the logical screen (background-filled)
    at its declared offset, so partial-canvas first frames come back at
    canvas size like any real renderer would produce."""
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    sw = int.from_bytes(data[6:8], "little")
    sh = int.from_bytes(data[8:10], "little")
    if sw == 0 or sh == 0:
        raise ValueError("zero logical screen size")
    from .multimodal import MAX_DECODE_PIXELS

    if sw * sh > MAX_DECODE_PIXELS:
        # decompression-bomb guard: LZW amplifies ~1500x, so a small
        # file can declare a canvas costing GBs — fail before allocating
        raise ValueError(f"image too large: {sw}x{sh}")
    packed = data[10]
    bg_index = data[11]
    pos = 13
    gct: list[bytes] = []
    if packed & 0x80:
        gct, pos = _color_table(data, pos, packed & 0x07)

    transparent: int | None = None
    while pos < len(data):
        b = data[pos]
        if b == 0x21:  # extension
            label = data[pos + 1]
            pos += 2
            if label == 0xF9 and data[pos] >= 4:  # graphic control
                flags = data[pos + 1]
                if flags & 0x01:
                    transparent = data[pos + 4]
            # skip sub-blocks
            while pos < len(data) and data[pos] != 0:
                pos += 1 + data[pos]
            pos += 1
        elif b == 0x2C:  # image descriptor — decode this (first) frame
            left = int.from_bytes(data[pos + 1 : pos + 3], "little")
            top = int.from_bytes(data[pos + 3 : pos + 5], "little")
            iw = int.from_bytes(data[pos + 5 : pos + 7], "little")
            ih = int.from_bytes(data[pos + 7 : pos + 9], "little")
            iflags = data[pos + 9]
            pos += 10
            lct = gct
            if iflags & 0x80:
                lct, pos = _color_table(data, pos, iflags & 0x07)
            if not lct:
                raise ValueError("no color table")
            min_code = data[pos]
            pos += 1
            blocks = bytearray()
            while pos < len(data) and data[pos] != 0:
                ln = data[pos]
                blocks += data[pos + 1 : pos + 1 + ln]
                pos += 1 + ln
            indices = _lzw_decode(min_code, bytes(blocks), iw * ih)
            if len(indices) < iw * ih:
                indices += bytes(iw * ih - len(indices))  # truncated: pad 0
            # de-interlace
            if iflags & 0x40:
                rows = [indices[r * iw : (r + 1) * iw] for r in range(ih)]
                ordered: list[bytes | None] = [None] * ih
                src = 0
                for start, step in _INTERLACE_PASSES:
                    for r in range(start, ih, step):
                        ordered[r] = rows[src]
                        src += 1
                indices = bytearray(b"".join(x or b"" for x in ordered))
            # composite onto the canvas
            bg = lct[bg_index] if bg_index < len(lct) else b"\x00\x00\x00"
            canvas = bytearray(bg * (sw * sh))
            ncol = len(lct)
            for r in range(min(ih, sh - top)):
                row_base = ((top + r) * sw + left) * 3
                src_base = r * iw
                for c in range(min(iw, sw - left)):
                    idx = indices[src_base + c]
                    if idx == transparent:
                        continue
                    px = lct[idx] if idx < ncol else b"\x00\x00\x00"
                    canvas[row_base + 3 * c : row_base + 3 * c + 3] = px
            return sw, sh, 3, bytes(canvas)
        elif b == 0x3B:  # trailer
            break
        else:
            raise ValueError(f"bad GIF block 0x{b:02X}")
    raise ValueError("GIF has no image data")


def encode_gif(
    pixels: bytes, width: int, height: int, channels: int = 3
) -> bytes:
    """Minimal GIF87a encoder (fixture path): quantizes to the ≤256
    distinct colors present (raises if more), emits uncompressed-style
    LZW (literal codes with periodic CLEAR — spec-valid, suboptimal)."""
    if channels != 3:
        raise ValueError("encode_gif takes RGB input")
    px = [pixels[i : i + 3] for i in range(0, len(pixels), 3)]
    palette = sorted(set(px))
    if len(palette) > 256:
        raise ValueError("more than 256 distinct colors")
    size_field = 0
    while (2 << size_field) < max(2, len(palette)):
        size_field += 1
    n_entries = 2 << size_field
    index = {c: i for i, c in enumerate(palette)}
    min_code = max(2, size_field + 1)
    clear = 1 << min_code
    eoi = clear + 1

    # literal-code LZW: emit CLEAR before every (2^width - table) fill
    out_bits = bytearray()
    acc = 0
    nbits = 0

    def put(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out_bits.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    width_bits = min_code + 1
    put(clear, width_bits)
    count = 0
    budget = (1 << width_bits) - clear - 2  # codes before width would grow
    for p in px:
        if count >= budget:
            put(clear, width_bits)
            count = 0
        put(index[p], width_bits)
        count += 1
    put(eoi, width_bits)
    if nbits:
        out_bits.append(acc & 0xFF)

    out = bytearray(b"GIF87a")
    out += width.to_bytes(2, "little") + height.to_bytes(2, "little")
    out += bytes([0x80 | size_field, 0, 0])  # GCT flag+size, bg 0, no aspect
    for i in range(n_entries):
        out += palette[i] if i < len(palette) else b"\x00\x00\x00"
    out += b"\x2c" + b"\x00" * 4
    out += width.to_bytes(2, "little") + height.to_bytes(2, "little")
    out += b"\x00"  # no LCT, not interlaced
    out += bytes([min_code])
    for i in range(0, len(out_bits), 255):
        chunk = out_bits[i : i + 255]
        out += bytes([len(chunk)]) + chunk
    out += b"\x00\x3b"
    return bytes(out)
