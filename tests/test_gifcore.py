"""GIF codec (functions/gifcore): LZW + palette + interlace decode,
lossless round-trip against our own spec-conforming encoder."""

import pytest

from pdf_parser_spark.functions.gifcore import decode_gif, encode_gif

COLORS = [b"\xff\x00\x00", b"\x00\xff\x00", b"\x00\x00\xff", b"\x10\x20\x30"]


def _checker(w: int, h: int) -> bytes:
    return b"".join(COLORS[(x + y) % 4] for y in range(h) for x in range(w))


def test_roundtrip_lossless():
    px = _checker(23, 11)
    blob = encode_gif(px, 23, 11)
    assert blob.startswith(b"GIF87a") and blob.endswith(b"\x3b")
    w, h, ch, out = decode_gif(blob)
    assert (w, h, ch) == (23, 11, 3)
    assert out == px  # GIF is lossless under 256 colors


def test_roundtrip_200_colors():
    pal = [bytes([i, 255 - i, (i * 3) % 256]) for i in range(200)]
    px = b"".join(pal[(x * 7 + y) % 200] for y in range(31) for x in range(19))
    blob = encode_gif(px, 19, 31)
    assert decode_gif(blob)[3] == px


def test_lzw_clear_and_width_growth():
    """A single-color image longer than one code-width budget exercises
    CLEAR handling; a wide palette exercises width growth."""
    px = b"\x05\x06\x07" * (64 * 64)
    blob = encode_gif(px, 64, 64)
    assert decode_gif(blob)[3] == px


def test_interlaced_frame():
    """Hand-build an interlaced image: same indices, interlaced row
    order; the decoder must undo the 4-pass order exactly."""
    w, h = 8, 8
    px = _checker(w, h)
    blob = bytearray(encode_gif(px, w, h))
    # set the interlace flag in the image descriptor (byte 9 after 0x2C)
    i = blob.index(0x2C)
    assert blob[i + 9] == 0x00
    blob[i + 9] = 0x40
    # re-order pixel rows into interlace pass order and re-encode
    rows = [px[r * w * 3 : (r + 1) * w * 3] for r in range(h)]
    order = [r for start, step in ((0, 8), (4, 8), (2, 4), (1, 2)) for r in range(start, h, step)]
    inter = b"".join(rows[r] for r in order)
    blob2 = bytearray(encode_gif(inter, w, h))
    j = blob2.index(0x2C)
    blob2[j + 9] = 0x40
    got = decode_gif(bytes(blob2))
    assert got[3] == px


def test_gif89a_transparency_and_offset():
    """GIF89a GCE transparency + a frame smaller than the canvas: the
    decoder composites onto a background-filled logical screen."""
    # canvas 6x4 palette {bg=white, fg=red}, frame 2x2 at (2,1)
    pal = b"\xff\xff\xff" + b"\xff\x00\x00"
    frame_indices = bytes([1, 0, 0, 1])  # index 0 transparent
    # LZW with min_code=2: CLEAR=4, EOI=5, width 3; CLEAR every two
    # literal codes so the table never reaches the width-growth point
    bits = []
    for code in [4, 1, 0, 4, 0, 1, 5]:
        bits.append((code, 3))
    acc = nb = 0
    out = bytearray()
    for code, wd in bits:
        acc |= code << nb
        nb += wd
        while nb >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nb -= 8
    if nb:
        out.append(acc & 0xFF)
    gif = (
        b"GIF89a" + (6).to_bytes(2, "little") + (4).to_bytes(2, "little")
        + bytes([0x80, 0, 0]) + pal
        + b"\x21\xf9\x04\x01\x00\x00\x00\x00"  # GCE: transparent idx 0
        + b"\x2c" + (2).to_bytes(2, "little") + (1).to_bytes(2, "little")
        + (2).to_bytes(2, "little") + (2).to_bytes(2, "little") + b"\x00"
        + bytes([2, len(out)]) + bytes(out) + b"\x00\x3b"
    )
    w, h, ch, px = decode_gif(gif)
    assert (w, h, ch) == (6, 4, 3)
    rows = [px[r * 18 : (r + 1) * 18] for r in range(4)]
    red, white = b"\xff\x00\x00", b"\xff\xff\xff"
    assert rows[1][6:9] == red and rows[1][9:12] == white
    assert rows[2][6:9] == white and rows[2][9:12] == red
    assert rows[0] == white * 6


def test_malformed():
    with pytest.raises(ValueError):
        decode_gif(b"GIF89a")  # truncated
    with pytest.raises(ValueError):
        decode_gif(b"NOTAGIF.....")
    too_many = b"".join(
        bytes([i & 0xFF, (i >> 8) & 0xFF, 7]) for i in range(300)
    )
    with pytest.raises(ValueError):
        encode_gif(too_many, 300, 1)  # > 256 distinct colors
