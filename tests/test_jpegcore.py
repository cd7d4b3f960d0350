"""Baseline JPEG codec (functions/jpegcore): spec-conformance probes +
encode→decode round-trip fidelity (the test oracle for a lossy format
is PSNR against the source raster, not byte equality)."""

import struct

import numpy as np
import pytest

from pdf_parser_spark.functions.jpegcore import (
    UNZIGZAG,
    ZIGZAG,
    decode_jpeg,
    encode_jpeg,
)


def _gradient_rgb(w: int, h: int) -> bytes:
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.stack(
        [xx * 255 // max(w - 1, 1), yy * 255 // max(h - 1, 1), (xx + yy) * 255 // max(w + h - 2, 1)],
        axis=-1,
    ).astype(np.uint8)
    return img.tobytes()


def _psnr(a: bytes, b: bytes) -> float:
    x = np.frombuffer(a, dtype=np.uint8).astype(np.float64)
    y = np.frombuffer(b, dtype=np.uint8).astype(np.float64)
    mse = ((x - y) ** 2).mean()
    return float("inf") if mse == 0 else 20 * np.log10(255.0 / np.sqrt(mse))


def test_zigzag_is_a_permutation_and_involutive():
    assert sorted(ZIGZAG) == list(range(64))
    assert all(ZIGZAG[UNZIGZAG[i]] == i for i in range(64))
    # spec anchor points: zigzag position 1 is (0,1), position 2 is (1,0)
    assert ZIGZAG[0] == 0 and ZIGZAG[1] == 1 and ZIGZAG[2] == 8


def test_roundtrip_rgb_smooth():
    px = _gradient_rgb(56, 40)
    blob = encode_jpeg(px, 56, 40, 3, quality=90)
    assert blob[:2] == b"\xff\xd8" and blob[-2:] == b"\xff\xd9"
    w, h, ch, out = decode_jpeg(blob)
    assert (w, h, ch) == (56, 40, 3)
    assert _psnr(px, out) > 35


def test_roundtrip_gray_odd_dims():
    h, w = 33, 17
    yy, xx = np.mgrid[0:h, 0:w]
    g = ((xx * 7 + yy * 3) % 256).astype(np.uint8)
    blob = encode_jpeg(g.tobytes(), w, h, 1, quality=95)
    w2, h2, ch, out = decode_jpeg(blob)
    assert (w2, h2, ch) == (w, h, 1)
    assert _psnr(g.tobytes(), out) > 30


def test_roundtrip_flat_color_near_exact():
    px = bytes([120, 30, 200]) * (24 * 24)
    blob = encode_jpeg(px, 24, 24, 3, quality=90)
    _, _, _, out = decode_jpeg(blob)
    assert _psnr(px, out) > 40


def test_quality_monotone_size():
    px = np.random.default_rng(7).integers(0, 256, 48 * 48 * 3, dtype=np.uint8)
    lo = encode_jpeg(px.tobytes(), 48, 48, 3, quality=20)
    hi = encode_jpeg(px.tobytes(), 48, 48, 3, quality=95)
    assert len(lo) < len(hi)
    # noise at q20 still decodes to the right shape
    w, h, ch, _ = decode_jpeg(lo)
    assert (w, h, ch) == (48, 48, 3)


def test_byte_stuffing_handled():
    """Force 0xFF bytes in the entropy stream (high-frequency noise at
    high quality produces them reliably) — decode must not desync."""
    px = np.random.default_rng(3).integers(0, 256, 64 * 64 * 3, dtype=np.uint8)
    blob = encode_jpeg(px.tobytes(), 64, 64, 3, quality=100)
    body = blob[2:-2]
    assert b"\xff\x00" in body  # stuffed bytes present
    w, h, ch, _ = decode_jpeg(blob)
    assert (w, h, ch) == (64, 64, 3)


def test_malformed_and_unsupported():
    with pytest.raises(ValueError):
        decode_jpeg(b"nota jpeg")
    with pytest.raises(ValueError):
        decode_jpeg(b"\xff\xd8\xff\xe0no tables")
    # progressive SOF2 → NotImplementedError
    sof2 = (
        b"\xff\xd8"
        + b"\xff\xc2"
        + struct.pack(">H", 11)
        + struct.pack(">BHHB", 8, 8, 8, 1)
        + bytes([1, 0x11, 0])
    )
    with pytest.raises(NotImplementedError):
        decode_jpeg(sof2)


def test_non_mcu_aligned_dims():
    px = _gradient_rgb(20, 12)  # forces edge-replication padding
    blob = encode_jpeg(px, 20, 12, 3, quality=92)
    w, h, ch, out = decode_jpeg(blob)
    assert (w, h, ch) == (20, 12, 3)
    assert _psnr(px, out) > 32


def test_roundtrip_420_subsampled():
    """4:2:0 stream (luma 2×2 factors, chroma quarter-res): the
    decoder's multi-block MCU walk + chroma upsample path."""
    px = _gradient_rgb(40, 24)
    blob = encode_jpeg(px, 40, 24, 3, quality=90, subsample="420")
    # SOF declares 2×2 luma factors
    sof = blob.find(b"\xff\xc0")
    assert blob[sof + 11] == 0x22
    w, h, ch, out = decode_jpeg(blob)
    assert (w, h, ch) == (40, 24, 3)
    assert _psnr(px, out) > 28  # chroma is quarter-res; smooth ramp survives


def test_roundtrip_420_odd_dims():
    px = _gradient_rgb(19, 13)  # not multiples of 16
    blob = encode_jpeg(px, 19, 13, 3, quality=90, subsample="420")
    w, h, ch, out = decode_jpeg(blob)
    assert (w, h, ch) == (19, 13, 3)
    assert _psnr(px, out) > 26


def test_restart_markers():
    """DRI/RSTn: encoder emits restarts, decoder resyncs + resets DC."""
    px = _gradient_rgb(48, 48)
    blob = encode_jpeg(px, 48, 48, 3, quality=90, restart_interval=2)
    assert b"\xff\xdd" in blob  # DRI present
    assert any(bytes([0xFF, 0xD0 + i]) in blob for i in range(8))
    w, h, ch, out = decode_jpeg(blob)
    assert (w, h, ch) == (48, 48, 3)
    assert _psnr(px, out) > 35
    # same image without restarts decodes to identical pixels
    plain = encode_jpeg(px, 48, 48, 3, quality=90)
    assert decode_jpeg(plain)[3] == out
