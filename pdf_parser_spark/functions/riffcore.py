"""RIFF-container codecs: WAV (PCM audio) and AVI (MJPEG video).

Closes the last two multimodal stubs: audio and video payloads now
decode for real, from the public specs (RIFF/WAVE per the Microsoft
multimedia file format docs; AVI per the OpenDML/msdn AVI RIFF form;
MJPEG frames are baseline JPEG handled by :mod:`.jpegcore`). Pure
Python + numpy-free on the WAV path — no soundfile/ffmpeg needed.

Feature math is integer-exact on purpose (int sums, ``isqrt``,
truncating division) so the DuckDB oracles in queries.py
(``audio_features``, ``video_frames``) can recompute every output
arithmetically from doc_id — same discipline as the integer PageRank.

Reference analog: none — the reference repo is PDF-only; this family
comes from the training-data-pipeline brief (multimodal columns).
"""

from __future__ import annotations

import struct
from math import isqrt

# ---------------------------------------------------------------------------
# generic RIFF walk


def _riff_chunks(data: bytes, start: int, end: int):
    """Yield (fourcc, payload_start, payload_len) walking a chunk run;
    chunks are word-aligned (odd sizes carry a pad byte)."""
    pos = start
    while pos + 8 <= end:
        fcc = data[pos : pos + 4]
        ln = int.from_bytes(data[pos + 4 : pos + 8], "little")
        body = pos + 8
        if body + ln > end:
            raise ValueError("truncated RIFF chunk")
        yield fcc, body, ln
        pos = body + ln + (ln & 1)


def _riff_header(data: bytes, form: bytes) -> int:
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != form:
        raise ValueError(f"not a RIFF {form.decode()} file")
    ln = int.from_bytes(data[4:8], "little")
    return min(8 + ln, len(data))


# ---------------------------------------------------------------------------
# WAV (PCM)


def encode_wav(
    samples: list[int], rate: int, channels: int = 1, bits: int = 16
) -> bytes:
    """PCM WAVE writer. ``samples`` is interleaved; 16-bit signed or
    8-bit unsigned per the spec."""
    if bits == 16:
        frames = struct.pack(f"<{len(samples)}h", *samples)
    elif bits == 8:
        frames = bytes(samples)
    else:
        raise ValueError("bits must be 8 or 16")
    block = channels * bits // 8
    fmt = struct.pack("<HHIIHH", 1, channels, rate, rate * block, block, bits)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(frames)) + frames
    if len(frames) & 1:
        body += b"\x00"
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(data: bytes) -> tuple[int, int, int, list[int]]:
    """→ (rate, channels, bits, interleaved samples). PCM (format tag
    1) only; compressed tags raise NotImplementedError."""
    end = _riff_header(data, b"WAVE")
    fmt = pcm = None
    for fcc, body, ln in _riff_chunks(data, 12, end):
        if fcc == b"fmt " and ln >= 16:
            fmt = struct.unpack("<HHIIHH", data[body : body + 16])
        elif fcc == b"data":
            pcm = data[body : body + ln]
    if fmt is None or pcm is None:
        raise ValueError("WAV missing fmt/data chunk")
    tag, channels, rate, _br, _ba, bits = fmt
    if tag != 1:
        raise NotImplementedError(f"non-PCM WAV (format tag {tag})")
    if bits == 16:
        n = len(pcm) // 2
        samples = list(struct.unpack(f"<{n}h", pcm[: n * 2]))
    elif bits == 8:
        samples = [b - 128 for b in pcm]  # centre unsigned 8-bit
    else:
        raise NotImplementedError(f"{bits}-bit PCM")
    return rate, channels, bits, samples


def audio_stats(data: bytes) -> dict[str, int]:
    """Integer-exact audio descriptors from decoded PCM: the oracle-
    twinnable core of the audio feature vector. Mono analysis uses
    channel 0 of interleaved frames."""
    rate, channels, _bits, samples = decode_wav(data)
    mono = samples[::channels]
    n = len(mono)
    peak = max((abs(s) for s in mono), default=0)
    rms = isqrt(sum(s * s for s in mono) // n) if n else 0
    zc = sum(
        1
        for i in range(1, n)
        if (mono[i] >= 0) != (mono[i - 1] >= 0)
    )
    return {
        "sample_rate": rate,
        "channels": channels,
        "n_samples": n,
        "duration_ms": n * 1000 // rate if rate else 0,
        "peak": peak,
        "rms": rms,
        "zero_crossings": zc,
    }


def audio_feature(data: bytes, dim: int = 8) -> list[float]:
    """Bounded float feature vector for the pipeline surface."""
    s = audio_stats(data)
    feats = [
        min(s["duration_ms"] / 60_000.0, 1.0),
        min(s["sample_rate"] / 48_000.0, 1.0),
        s["channels"] / 2.0,
        s["peak"] / 32768.0,
        s["rms"] / 32768.0,
        min(s["zero_crossings"] / max(s["n_samples"], 1), 1.0),
        min(s["n_samples"] / 1e6, 1.0),
    ]
    feats = feats[:dim]
    return feats + [0.0] * (dim - len(feats))


# ---------------------------------------------------------------------------
# AVI (MJPEG)


def encode_avi_mjpeg(
    frames: list[bytes], width: int, height: int, fps: int = 10
) -> bytes:
    """Minimal spec-shaped AVI writer: hdrl(avih + one vids/MJPG strl)
    + movi of 00dc chunks. Enough structure that a conforming reader
    (and this module's own decoder) finds every field where the AVI
    RIFF form says it lives."""
    usec = 1_000_000 // fps
    maxbuf = max((len(f) for f in frames), default=0)
    avih = struct.pack(
        "<14I",
        usec, maxbuf * fps, 0, 0x10, len(frames), 0, 1, maxbuf,
        width, height, 0, 0, 0, 0,
    )
    strh = (
        b"vids" + b"MJPG"
        + struct.pack("<IHHIIIIIIIi", 0, 0, 0, 0, 1, fps, 0, len(frames), maxbuf, 0, -1)
        + struct.pack("<4H", 0, 0, width, height)
    )
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40, width, height, 1, 24, b"MJPG", width * height * 3, 0, 0, 0, 0,
    )

    def chunk(fcc: bytes, body: bytes) -> bytes:
        return fcc + struct.pack("<I", len(body)) + body + (b"\x00" if len(body) & 1 else b"")

    def lst(form: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", form + body)

    strl = lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf))
    hdrl = lst(b"hdrl", chunk(b"avih", avih) + strl)
    movi = lst(b"movi", b"".join(chunk(b"00dc", f) for f in frames))
    return chunk(b"RIFF", b"AVI " + hdrl + movi)


def decode_avi(data: bytes) -> tuple[int, int, int, int, list[bytes]]:
    """→ (width, height, fps, n_frames, mjpeg frame payloads)."""
    end = _riff_header(data, b"AVI ")
    width = height = fps = total = 0
    frames: list[bytes] = []

    def walk(start: int, stop: int) -> None:
        nonlocal width, height, fps, total
        for fcc, body, ln in _riff_chunks(data, start, stop):
            if fcc == b"LIST":
                walk(body + 4, body + ln)
            elif fcc == b"avih" and ln >= 56:
                vals = struct.unpack("<14I", data[body : body + 56])
                usec, total, width, height = vals[0], vals[4], vals[8], vals[9]
                fps = 1_000_000 // usec if usec else 0
            elif fcc == b"00dc":
                frames.append(data[body : body + ln])

    walk(12, end)
    if not width or not height:
        raise ValueError("AVI missing avih header")
    if total != len(frames):
        raise ValueError(
            f"AVI frame count mismatch (header {total}, movi {len(frames)})"
        )
    return width, height, fps, len(frames), frames


def video_frame_stats(data: bytes) -> list[dict[str, int]]:
    """Per-frame integer descriptors: decode every MJPEG frame through
    the real baseline-JPEG decoder and fold pixels with int sums —
    (frame_idx, width, height, n_frames, mean_luma)."""
    from .jpegcore import decode_jpeg

    width, height, _fps, n, frames = decode_avi(data)
    out = []
    for idx, payload in enumerate(frames):
        w, h, ch, px = decode_jpeg(payload)
        luma = (
            sum(px) // (w * h)
            if ch == 1
            # integer BT.601-ish fold on RGB, denominator 1000
            else sum(
                299 * px[i] + 587 * px[i + 1] + 114 * px[i + 2]
                for i in range(0, len(px), 3)
            )
            // (1000 * w * h)
        )
        out.append(
            {
                "frame_idx": idx,
                "width": w,
                "height": h,
                "n_frames": n,
                "mean_luma": luma,
            }
        )
    return out


def video_feature(data: bytes, dim: int = 8, max_frames: int = 3) -> list[float]:
    """Bounded float feature for the pipeline surface: container shape
    + first-frames luma moments (evenly sampled)."""
    width, height, fps, n, frames = decode_avi(data)
    feats = [
        min(width / 4096.0, 1.0),
        min(height / 4096.0, 1.0),
        min(n / 10_000.0, 1.0),
        min(fps / 120.0, 1.0),
    ]
    if frames:
        from .jpegcore import decode_jpeg

        step = max(1, n // max_frames)
        for payload in frames[::step][:max_frames]:
            w, h, ch, px = decode_jpeg(payload)
            feats.append(sum(px) / (len(px) * 255.0))
    feats = feats[:dim]
    return feats + [0.0] * (dim - len(feats))
