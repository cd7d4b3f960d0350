"""RIFF codecs (WAV PCM, AVI-MJPEG): round-trips, integer feature
exactness, error typing, and the extract_features pipeline wiring."""

import pytest

from pdf_parser_spark.functions import riffcore as r
from pdf_parser_spark.functions.jpegcore import encode_jpeg


def square(a: int, h: int, n: int) -> list[int]:
    return [a if (i // h) % 2 == 0 else -a for i in range(n)]


def test_wav_roundtrip_16bit_mono():
    s = square(750, 4, 437)
    rate, ch, bits, out = r.decode_wav(r.encode_wav(s, 8200))
    assert (rate, ch, bits) == (8200, 1, 16)
    assert out == s


def test_wav_roundtrip_8bit_stereo():
    samples = [10, 250, 20, 240] * 5
    rate, ch, bits, out = r.decode_wav(
        r.encode_wav(samples, 44100, channels=2, bits=8)
    )
    assert (rate, ch, bits) == (44100, 2, 8)
    assert out == [s - 128 for s in samples]


def test_audio_stats_square_wave_integer_exact():
    a, h, n, rate = 750, 4, 437, 8200
    st = r.audio_stats(r.encode_wav(square(a, h, n), rate))
    assert st == {
        "sample_rate": rate,
        "channels": 1,
        "n_samples": n,
        "duration_ms": n * 1000 // rate,
        "peak": a,
        "rms": a,  # |s| == a everywhere → RMS exactly a
        "zero_crossings": (n - 1) // h,
    }


def test_wav_error_typing():
    with pytest.raises(ValueError, match="not a RIFF WAVE"):
        r.decode_wav(b"RIFF\x04\x00\x00\x00AVI ")
    with pytest.raises(ValueError, match="missing fmt/data"):
        r.decode_wav(b"RIFF\x04\x00\x00\x00WAVE")
    # non-PCM format tag → NotImplementedError, not garbage samples
    import struct

    fmt = struct.pack("<HHIIHH", 85, 1, 8000, 8000, 1, 16)  # tag 85 = mp3
    body = b"WAVE" + b"fmt " + struct.pack("<I", 16) + fmt
    body += b"data" + struct.pack("<I", 0)
    with pytest.raises(NotImplementedError, match="format tag 85"):
        r.decode_wav(b"RIFF" + struct.pack("<I", len(body)) + body)


def _gray_frame(v: int) -> bytes:
    return encode_jpeg(bytes([v]) * 256, 16, 16, 1, quality=85)


def test_avi_roundtrip_and_frame_stats():
    frames = [_gray_frame(v) for v in (58, 128, 213)]
    avi = r.encode_avi_mjpeg(frames, 16, 16, fps=10)
    w, h, fps, n, out = r.decode_avi(avi)
    assert (w, h, fps, n) == (16, 16, 10, 3)
    assert out == frames  # byte-identical payload recovery
    assert [s["mean_luma"] for s in r.video_frame_stats(avi)] == [58, 128, 213]


def test_dc_exact_gray_family():
    # the synthesis contract of the video_frames oracle: every value
    # 128 + 5k in [3, 218] survives the q85 codec bit-exactly
    from pdf_parser_spark.functions.jpegcore import decode_jpeg

    for k in (-25, -10, 0, 7, 18):
        v = 128 + 5 * k
        _, _, ch, px = decode_jpeg(_gray_frame(v))
        assert ch == 1 and set(px) == {v}, v


def test_avi_frame_count_mismatch_is_error():
    avi = bytearray(r.encode_avi_mjpeg([_gray_frame(128)], 16, 16))
    # corrupt the avih dwTotalFrames field (offset: RIFF(12) + LIST hdr
    # (8) + 'hdrl'(4) + 'avih'+size(8) + 4 dwords = 48; field 5th dword)
    pos = avi.index(b"avih") + 8 + 16
    avi[pos : pos + 4] = (7).to_bytes(4, "little")
    with pytest.raises(ValueError, match="frame count mismatch"):
        r.decode_avi(bytes(avi))


def test_extract_features_real_audio_video(spark):
    from pdf_parser_spark.functions.multimodal import extract_features

    wav = r.encode_wav(square(1000, 3, 500), 8000)
    avi = r.encode_avi_mjpeg([_gray_frame(58), _gray_frame(213)], 16, 16)
    df = spark.createDataFrame(
        [
            ("u1", bytearray(wav)),
            ("u2", bytearray(avi)),
            ("u3", bytearray(b"ID3\x03garbage")),  # mp3: labeled fallback
        ],
        "url string, payload binary",
    )
    rows = {
        row["url"]: row
        for row in extract_features(df).collect()
    }
    assert rows["u1"]["content_type"] == "audio/x-wav"
    assert rows["u1"]["decode_error"] is None
    assert rows["u1"]["feature"][3] == pytest.approx(1000 / 32768.0)
    assert rows["u2"]["content_type"] == "video/x-msvideo"
    assert rows["u2"]["decode_error"] is None
    # sampled frame lumas land in the tail of the feature vector
    assert rows["u2"]["feature"][4] == pytest.approx(58 / 255.0)
    assert rows["u3"]["content_type"] == "audio/mpeg"
    assert "fallback_feature" in rows["u3"]["decode_error"]


def test_content_type_expr_sniffs_riff_jvm_side(spark):
    from pdf_parser_spark.functions.multimodal import with_media_meta

    wav = r.encode_wav([0, 1], 8000)
    avi = r.encode_avi_mjpeg([_gray_frame(128)], 16, 16)
    df = spark.createDataFrame(
        [("a", bytearray(wav)), ("b", bytearray(avi))],
        "url string, payload binary",
    )
    got = {
        row["url"]: row["content_type"]
        for row in with_media_meta(df).collect()
    }
    assert got == {"a": "audio/x-wav", "b": "video/x-msvideo"}
