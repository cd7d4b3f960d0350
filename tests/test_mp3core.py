"""MP3 frame-header metadata (functions/mp3core.py): framing arithmetic
from the public MPEG-1/2 audio layout, ID3 tag handling, VBR detection,
the Layer I/II guard, and the pipeline surface integration."""

import pytest

from pdf_parser_spark.functions.mp3core import (
    encode_mp3_frames,
    mp3_feature,
    mp3_stats,
)


def test_cbr_mpeg1_stats_integer_exact():
    # 38 frames @128kbps 44.1kHz stereo: 1152 samples/frame
    data = encode_mp3_frames([128] * 38, 44100, channels=2)
    s = mp3_stats(data)
    assert s == {
        "sample_rate": 44100,
        "channels": 2,
        "n_frames": 38,
        "duration_ms": 38 * 1152 * 1000 // 44100,
        "bitrate_kbps": 128,
        "vbr": 0,
    }
    # frame length arithmetic: 144 * 128000 / 44100 = 417 bytes/frame
    assert len(data) == 38 * (144 * 128 * 1000 // 44100)


def test_vbr_average_and_flag():
    brs = [64, 128, 192, 128]
    s = mp3_stats(encode_mp3_frames(brs, 44100))
    assert s["vbr"] == 1
    assert s["bitrate_kbps"] == sum(brs) // len(brs)
    assert s["n_frames"] == 4


def test_mpeg2_half_samples_per_frame():
    # MPEG2 Layer III: 576 samples/frame, coefficient 72
    data = encode_mp3_frames([64] * 20, 22050, channels=1)
    s = mp3_stats(data)
    assert s["sample_rate"] == 22050 and s["channels"] == 1
    assert s["duration_ms"] == 20 * 576 * 1000 // 22050
    assert len(data) == 20 * (72 * 64 * 1000 // 22050)


def test_id3v2_skip_and_id3v1_trailer():
    body = encode_mp3_frames([128] * 7, 44100, id3_payload=b"x" * 300)
    tagged = body + b"TAG" + b"\x00" * 125  # ID3v1 trailer
    assert mp3_stats(tagged)["n_frames"] == 7
    assert mp3_stats(body)["n_frames"] == 7


def test_garbage_and_tag_only_raise():
    with pytest.raises(ValueError):
        mp3_stats(b"ID3\x03garbage")
    with pytest.raises(ValueError):
        mp3_stats(b"\x00" * 64)


def test_layer2_guard():
    # hand-build a Layer II header: sync + version MPEG1 + layer bits 10
    h = bytes([0xFF, 0xE0 | (3 << 3) | (2 << 1) | 1, (9 << 4) | (0 << 2), 0])
    with pytest.raises(NotImplementedError):
        mp3_stats(h + b"\x00" * 400)


def test_feature_is_metadata_derived():
    f = mp3_feature(encode_mp3_frames([128] * 38, 44100), dim=8)
    assert f[1] == pytest.approx(128 / 320.0)
    assert f[2] == pytest.approx(44100 / 48000.0)
    assert f[3] == 1.0  # stereo
    assert f[5] == 0.0  # cbr


def test_pipeline_surface_mp3_metadata_and_fallback(spark):
    """extract_features: a parseable mp3 gets the metadata feature with
    the metadata_feature label; a tag-only stream keeps the labeled
    histogram fallback; untagged raw frames sniff as audio/mpeg."""
    from pdf_parser_spark.functions.multimodal import extract_features

    good = encode_mp3_frames([128] * 10, 44100, id3_payload=b"t" * 40)
    raw = encode_mp3_frames([64] * 5, 22050, channels=1)
    df = spark.createDataFrame(
        [
            ("m1", bytearray(good)),
            ("m2", bytearray(raw)),
            ("m3", bytearray(b"ID3\x03garbage")),
        ],
        "url string, payload binary",
    )
    rows = {r["url"]: r for r in extract_features(df).collect()}
    assert rows["m1"]["content_type"] == "audio/mpeg"
    assert "metadata_feature" in rows["m1"]["decode_error"]
    assert rows["m1"]["feature"][1] == pytest.approx(128 / 320.0)
    assert rows["m2"]["content_type"] == "audio/mpeg"
    assert "metadata_feature" in rows["m2"]["decode_error"]
    assert rows["m2"]["feature"][3] == pytest.approx(0.5)  # mono
    assert rows["m3"]["content_type"] == "audio/mpeg"
    assert "fallback_feature" in rows["m3"]["decode_error"]
