"""MP3 frame-header parsing: duration/bitrate metadata without PCM decode.

Written from the public MPEG-1/2 audio framing layout (ISO/IEC 11172-3
§2.4.1 / 13818-3): an MP3 stream is a sequence of frames, each opening
with an 11-bit sync word and four header bytes that encode version,
layer, bitrate index, sample-rate index, padding, and channel mode.
Frame byte length and samples-per-frame follow arithmetically, so a
pure header walk recovers the metadata a training pipeline needs —
duration, average bitrate, sample rate, channels, CBR/VBR — without
implementing the polyphase filterbank. PCM decode intentionally stops
here: :func:`mp3_feature` is a metadata feature, clearly labeled, and
the pipeline surface records that in ``decode_error``
(reference parity note: the reference repo has no audio handling at
all; this module exists for the LLM-data-pipeline multimodal surface).

An optional leading ID3v2 tag (10-byte header + syncsafe length) is
skipped; a trailing 128-byte ID3v1 ``TAG`` block ends the walk cleanly.

Layer III only (the "MP3" in MP3); Layer I/II streams raise
NotImplementedError — a tested guard, same policy as the other codecs.
"""

from __future__ import annotations

__all__ = ["mp3_stats", "mp3_feature", "encode_mp3_frames"]

# bitrate tables, kbps, index 1..14 (0 = "free", 15 = bad)
_BITRATES_V1_L3 = [
    None, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320,
]
_BITRATES_V2_L3 = [
    None, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160,
]
# sample-rate tables by version id (header bits): index 0..2
_RATES = {3: (44100, 48000, 32000), 2: (22050, 24000, 16000), 0: (11025, 12000, 8000)}


def _skip_id3v2(data: bytes) -> int:
    if data[:3] != b"ID3" or len(data) < 10:
        return 0
    size = 0
    for b in data[6:10]:
        if b & 0x80:
            return 0  # not syncsafe — treat as absent
        size = (size << 7) | b
    footer = 10 if (data[5] & 0x10) else 0
    return 10 + size + footer


def _parse_header(h: bytes) -> dict | None:
    """One 4-byte frame header → fields, or None if not a sync point."""
    if len(h) < 4 or h[0] != 0xFF or (h[1] & 0xE0) != 0xE0:
        return None
    version_id = (h[1] >> 3) & 0x3  # 3=MPEG1, 2=MPEG2, 0=MPEG2.5, 1=reserved
    layer_id = (h[1] >> 1) & 0x3  # 1=Layer III, 2=II, 3=I, 0=reserved
    if version_id == 1 or layer_id == 0:
        return None
    if layer_id != 1:
        raise NotImplementedError(
            f"Layer {'I' if layer_id == 3 else 'II'} audio (only Layer III supported)"
        )
    br_idx = (h[2] >> 4) & 0xF
    sr_idx = (h[2] >> 2) & 0x3
    if br_idx in (0, 15) or sr_idx == 3:
        return None  # free-format/bad bitrate or reserved rate
    bitrate = (_BITRATES_V1_L3 if version_id == 3 else _BITRATES_V2_L3)[br_idx]
    rate = _RATES[version_id][sr_idx]
    padding = (h[2] >> 1) & 0x1
    mono = ((h[3] >> 6) & 0x3) == 3
    coeff = 144 if version_id == 3 else 72  # Layer III frame-size coefficient
    frame_len = coeff * bitrate * 1000 // rate + padding
    return {
        "version_id": version_id,
        "bitrate_kbps": bitrate,
        "sample_rate": rate,
        "channels": 1 if mono else 2,
        "frame_len": frame_len,
        "samples": 1152 if version_id == 3 else 576,
    }


def mp3_stats(data: bytes) -> dict[str, int]:
    """Walk every frame header; integer-exact metadata.

    Raises ValueError when no valid Layer III frame sequence is found
    (the caller's cue to fall back to the labeled byte-histogram
    feature)."""
    pos = _skip_id3v2(data)
    frames = 0
    samples = 0
    bitrate_sum = 0
    bitrates: set[int] = set()
    rate = channels = 0
    while pos + 4 <= len(data):
        f = _parse_header(data[pos : pos + 4])
        if f is None:
            if data[pos : pos + 3] == b"TAG":  # trailing ID3v1
                pos += 128
                break
            break
        if frames and (f["sample_rate"] != rate or f["channels"] != channels):
            break  # stream parameters must not change mid-file
        rate, channels = f["sample_rate"], f["channels"]
        frames += 1
        samples += f["samples"]
        bitrate_sum += f["bitrate_kbps"]
        bitrates.add(f["bitrate_kbps"])
        pos += f["frame_len"]
    if frames == 0:
        raise ValueError("no MPEG audio frame sync found")
    return {
        "sample_rate": rate,
        "channels": channels,
        "n_frames": frames,
        "duration_ms": samples * 1000 // rate,
        "bitrate_kbps": bitrate_sum // frames,
        "vbr": 1 if len(bitrates) > 1 else 0,
    }


def mp3_feature(data: bytes, dim: int = 8) -> list[float]:
    """Deterministic metadata feature vector (duration, bitrate, rate,
    channels, frame count, vbr flag) — NOT decoded audio; the pipeline
    records that distinction in decode_error."""
    s = mp3_stats(data)
    feats = [
        min(s["duration_ms"] / 600_000.0, 1.0),  # clip at 10 min
        s["bitrate_kbps"] / 320.0,
        s["sample_rate"] / 48000.0,
        s["channels"] / 2.0,
        min(s["n_frames"] / 16384.0, 1.0),
        float(s["vbr"]),
    ]
    feats = feats[:dim]
    return feats + [0.0] * (dim - len(feats))


# --------------------------------------------------------------- writer


def _bitrate_index(bitrate_kbps: int, version_id: int) -> int:
    table = _BITRATES_V1_L3 if version_id == 3 else _BITRATES_V2_L3
    try:
        return table.index(bitrate_kbps)
    except ValueError:
        raise ValueError(f"bitrate {bitrate_kbps} not in the Layer III table")


def encode_mp3_frames(
    frame_bitrates: list[int],
    sample_rate: int = 44100,
    channels: int = 2,
    id3_payload: bytes = b"",
) -> bytes:
    """Synthesize a syntactically valid Layer III frame sequence — one
    frame per entry of *frame_bitrates* (mixing bitrates makes a VBR
    stream). Frame BODIES are deterministic filler (this is a framing
    writer for header-walk tests, not an audio encoder — the spec-level
    truth being tested is the header/length arithmetic)."""
    version_id = {
        44100: 3, 48000: 3, 32000: 3,
        22050: 2, 24000: 2, 16000: 2,
        11025: 0, 12000: 0, 8000: 0,
    }.get(sample_rate)
    if version_id is None:
        raise ValueError(f"sample rate {sample_rate} not in any MPEG table")
    sr_idx = _RATES[version_id].index(sample_rate)
    out = bytearray()
    if id3_payload:
        n = len(id3_payload)
        size = bytes(
            [(n >> 21) & 0x7F, (n >> 14) & 0x7F, (n >> 7) & 0x7F, n & 0x7F]
        )
        out += b"ID3\x04\x00\x00" + size + id3_payload
    coeff = 144 if version_id == 3 else 72
    for i, br in enumerate(frame_bitrates):
        br_idx = _bitrate_index(br, version_id)
        padding = 0
        h = bytes(
            [
                0xFF,
                0xE0 | (version_id << 3) | (1 << 1) | 1,  # Layer III, no CRC
                (br_idx << 4) | (sr_idx << 2) | (padding << 1),
                (0xC0 if channels == 1 else 0x00),
            ]
        )
        frame_len = coeff * br * 1000 // sample_rate + padding
        body = bytes((i + j) % 251 for j in range(frame_len - 4))
        out += h + body
    return bytes(out)
