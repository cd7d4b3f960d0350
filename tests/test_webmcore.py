"""WebM/Matroska EBML walk (functions/webmcore.py): RFC 8794 vint
framing, CRC-32 element verification, Info/Tracks metadata recovery,
and the unknown-size Segment form."""

import struct
import zlib

import pytest

from pdf_parser_spark.functions.webmcore import (
    EbmlError,
    encode_webm,
    webm_feature,
    webm_stats,
)


def _sample(**kw):
    args = dict(
        duration_ms=90_000,
        width=1280,
        height=720,
        sample_rate=48000,
        channels=2,
        n_clusters=5,
    )
    args.update(kw)
    return encode_webm(**args)


def test_roundtrip_stats_integer_exact():
    s = webm_stats(_sample())
    assert s == {
        "duration_ms": 90_000,
        "width": 1280,
        "height": 720,
        "sample_rate": 48000,
        "channels": 2,
        "n_video": 1,
        "n_audio": 1,
        "n_clusters": 5,
    }


def test_unknown_size_segment():
    # live-streamed form: Segment size vint is all ones → extends to EOF
    s = webm_stats(_sample(unknown_segment_size=True))
    assert s["n_clusters"] == 5 and s["duration_ms"] == 90_000


def test_vint_boundaries():
    from pdf_parser_spark.functions.webmcore import _read_vint, _vint_size

    # encode/decode round-trip across width boundaries, incl. 127→128
    # (127 is all-ones in 1 byte, reserved, must widen to 2)
    for v in (0, 1, 126, 127, 128, 16382, 16383, 16384, 2**28, 2**35):
        data = _vint_size(v)
        got, pos, unknown = _read_vint(data, 0, keep_marker=False)
        assert got == v and pos == len(data) and not unknown, v
    assert len(_vint_size(127)) == 2
    # element IDs keep their marker bits
    got, _, _ = _read_vint(b"\x1a\x45\xdf\xa3", 0, keep_marker=True)
    assert got == 0x1A45DFA3


def test_crc_mismatch_detected():
    data = _sample()
    idx = data.find(b"\x44\x89")  # Duration element inside Info's CRC span
    b = bytearray(data)
    b[idx + 3] ^= 0x01
    with pytest.raises(EbmlError, match="CRC-32 mismatch"):
        webm_stats(bytes(b))


def test_crc_must_be_first_child():
    from pdf_parser_spark.functions.webmcore import _el, _el_uint

    # Info with a CRC element after another child is malformed
    body = _el_uint(0x2AD7B1, 1_000_000) + _el(
        0xBF, struct.pack("<I", zlib.crc32(b""))
    )
    hdr = _el(0x1A45DFA3, _el(0x4282, b"webm"))
    seg = _el(0x18538067, _el(0x1549A966, body))
    with pytest.raises(EbmlError, match="not the first child"):
        webm_stats(hdr + seg)


def test_not_ebml():
    with pytest.raises(EbmlError, match="not an EBML"):
        webm_stats(b"RIFF....WEBM")


def test_truncation():
    data = _sample()
    with pytest.raises(EbmlError):
        webm_stats(data[: len(data) // 2 - 3])


def test_overrun_child_rejected():
    from pdf_parser_spark.functions.webmcore import _el

    # child claims more payload than its parent holds
    hdr = _el(0x1A45DFA3, _el(0x4282, b"webm"))
    bad_child = b"\xae" + b"\x90" + b"x" * 4  # claims 16 bytes, has 4
    seg = _el(0x18538067, _el(0x1654AE6B, bad_child))
    with pytest.raises(EbmlError, match="overruns"):
        webm_stats(hdr + seg)


def test_foreign_doctype_rejected():
    data = bytearray(_sample())
    idx = data.find(b"webm")
    data[idx : idx + 4] = b"avif"
    # DocType sits in the (un-CRC'd) EBML header, so the walk reaches
    # the doctype check directly
    with pytest.raises(EbmlError, match="DocType"):
        webm_stats(bytes(data))


def test_clusters_counted_not_entered():
    # corrupt bytes INSIDE a cluster body must not affect the walk
    data = _sample(n_clusters=3)
    s0 = webm_stats(data)
    b = bytearray(data)
    b[-1] ^= 0xFF  # last byte of the last cluster's filler
    assert webm_stats(bytes(b)) == s0


def test_feature_vector_shape():
    f = webm_feature(_sample(), dim=8)
    assert len(f) == 8
    assert f[3] == 1.0  # 48000/48000
    assert f[6] == 1.0 and f[7] == 1.0  # one video + one audio track
    assert len(webm_feature(_sample(), dim=4)) == 4


def test_no_tracks_rejected():
    from pdf_parser_spark.functions.webmcore import _el

    hdr = _el(0x1A45DFA3, _el(0x4282, b"webm"))
    seg = _el(0x18538067, _el(0x1549A966, b""))
    with pytest.raises(EbmlError, match="no tracks"):
        webm_stats(hdr + seg)
