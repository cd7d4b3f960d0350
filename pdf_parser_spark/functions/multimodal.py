"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The build brief's multimodal requirement: image/audio/video travel as
opaque ``binary`` columns with typed metadata; decode / feature-extract
steps are Pandas UDFs over ``mapInPandas``. The image/audio libraries
are not in this container, so every modality carries a real
from-the-spec pure-Python decoder: PNG (this module), baseline JPEG
(:mod:`.jpegcore`), GIF (:mod:`.gifcore`), WAV PCM audio and
AVI-MJPEG video (:mod:`.riffcore`), MP3 frame-header metadata
(:mod:`.mp3core` — duration/bitrate/rate/channels from the framing
layout; PCM stays undecoded, labeled per row), Ogg/Vorbis page-walk
metadata (:mod:`.oggcore` — RFC 3533 framing with per-page CRC checks,
duration from the final granule position; packet payloads stay
undecoded, labeled per row), and WebM/Matroska EBML-tree metadata
(:mod:`.webmcore` — RFC 8794 vint framing, CRC-32 element
verification, duration/dims/audio shape from Info and Tracks; frame
payloads stay undecoded, labeled per row). Every sniffed media type
now has a real from-the-spec parser; the byte-histogram fallback
remains only for corrupt streams and unknown types. Everything Spark-side —
schema, batch iteration, partition-pruned metadata extraction, UDF
signature — is real and tested.

Metadata sniffing (magic bytes → content type, dimensions from header
bytes where the format allows) is pure built-in expressions: it runs
JVM-side and never deserializes the payload into Python.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# magic-byte prefixes → content type (hex-encoded prefix match).
_MAGIC = [
    ("89504e47", "image/png"),
    ("ffd8ff", "image/jpeg"),
    ("47494638", "image/gif"),
    ("25504446", "application/pdf"),
    ("494433", "audio/mpeg"),
    # raw (untagged) Layer III frame sync: MPEG1 / MPEG2 / MPEG2.5
    ("fffa", "audio/mpeg"),
    ("fffb", "audio/mpeg"),
    ("fff2", "audio/mpeg"),
    ("fff3", "audio/mpeg"),
    ("ffe2", "audio/mpeg"),
    ("ffe3", "audio/mpeg"),
    ("4f676753", "audio/ogg"),
    ("1a45dfa3", "video/webm"),
]

# RIFF containers disambiguate on the form fourcc at bytes 9-12.
_RIFF_FORMS = [(b"WAVE", "audio/x-wav"), (b"AVI ", "video/x-msvideo")]


def _sniff_bytes(raw: bytes) -> str:
    """Python twin of content_type_expr (extract_features runs it
    inside the Arrow batch loop, already next to the payload)."""
    head = raw[:8].hex()
    if raw[:4] == b"RIFF":
        for form, ct in _RIFF_FORMS:
            if raw[8:12] == form:
                return ct
    for prefix, ct in _MAGIC:
        if head.startswith(prefix):
            return ct
    return "application/octet-stream"

# Decompression-bomb ceiling shared by the raster decoders (PNG here,
# JPEG/GIF in their modules): max pixels per image. 64 MP passes every
# real web image; a tiny crafted file declaring huge dimensions fails
# fast as a ValueError row instead of minutes of CPU + GBs of buffer
# on an executor core.
MAX_DECODE_PIXELS = 64_000_000

FEATURE_SCHEMA = (
    "url STRING, content_type STRING, payload_bytes BIGINT, "
    "feature ARRAY<FLOAT>, decode_error STRING"
)


def content_type_expr(bin_col: Column | str) -> Column:
    """Magic-byte content sniff as a pure JVM expression chain."""
    c = F.col(bin_col) if isinstance(bin_col, str) else bin_col
    head = F.lower(F.hex(F.substring(c, 1, 8)))
    out = F.lit("application/octet-stream")
    for prefix, ctype in reversed(_MAGIC):
        out = F.when(head.startswith(prefix), F.lit(ctype)).otherwise(out)
    is_riff = head.startswith("52494646")  # 'RIFF'; form fourcc at 9-12
    form = F.decode(F.substring(c, 9, 4), "UTF-8")
    for form_cc, ctype in _RIFF_FORMS:
        out = F.when(
            is_riff & (form == form_cc.decode()), F.lit(ctype)
        ).otherwise(out)
    return out


def with_media_meta(
    df: DataFrame, bin_col: str = "payload", url_col: str = "url"
) -> DataFrame:
    """Typed metadata columns without leaving the JVM: content type,
    size, and (for PNG) width/height decoded from the IHDR header via
    substring+conv — demonstrating header-only metadata at scan time."""
    c = F.col(bin_col)
    is_png = content_type_expr(c) == "image/png"
    # PNG IHDR: width = bytes 17-20 big-endian, height = bytes 21-24.
    be32 = lambda off: F.conv(F.hex(F.substring(c, off, 4)), 16, 10).cast("int")
    return df.select(
        F.col(url_col),
        content_type_expr(c).alias("content_type"),
        F.length(c).cast("bigint").alias("payload_bytes"),
        F.when(is_png, be32(17)).alias("width"),
        F.when(is_png, be32(21)).alias("height"),
    )


def _fake_feature(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic stand-in for a real decoder's feature vector:
    byte-histogram moments. Replace with a real image/audio decode when
    the libs exist; the Spark plumbing does not change."""
    if not payload:
        return [0.0] * dim
    step = max(1, len(payload) // 4096)
    sample = payload[::step]
    out = []
    for i in range(dim):
        bucket = [b for b in sample if b % dim == i]
        out.append(float(sum(bucket) % 997) / 997.0)
    return out


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def decode_png(data: bytes) -> tuple[int, int, int, bytes]:
    """Pure-Python PNG decoder: (width, height, channels, pixels).

    Supports the public baseline subset a training pipeline meets in
    practice for raster goldens: 8-bit depth, color types gray(0),
    RGB(2), gray+alpha(4), RGBA(6), non-interlaced, all five scanline
    filters (None/Sub/Up/Average/Paeth per the PNG spec §6). Palette
    and 16-bit images raise NotImplementedError. zlib is the only
    dependency — no PIL/opencv needed.
    """
    import struct
    import zlib

    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    ihdr = None
    idat = bytearray()
    pos = 8
    while pos + 8 <= len(data):
        ln = int.from_bytes(data[pos : pos + 4], "big")
        typ = data[pos + 4 : pos + 8]
        chunk = data[pos + 8 : pos + 8 + ln]
        pos += 12 + ln  # length + type + data + CRC
        if typ == b"IHDR":
            ihdr = chunk
        elif typ == b"IDAT":
            idat += chunk
        elif typ == b"IEND":
            break
    if ihdr is None or len(ihdr) < 13:
        raise ValueError("missing IHDR")
    w, h, depth, ctype, _comp, _filt, interlace = struct.unpack(">IIBBBBB", ihdr)
    if depth != 8 or interlace != 0:
        raise NotImplementedError(f"unsupported PNG (depth={depth}, interlace={interlace})")
    channels = {0: 1, 2: 3, 4: 2, 6: 4}.get(ctype)
    if channels is None:
        raise NotImplementedError(f"unsupported PNG color type {ctype}")
    if w * h > MAX_DECODE_PIXELS:
        # decompression-bomb guard (checked BEFORE the zlib inflate): a
        # 62 KB all-zero 8000x8000 PNG already costs ~5 s and the full
        # raw buffer; a crawled corpus will contain far worse on purpose
        raise ValueError(f"image too large: {w}x{h}")
    raw = zlib.decompress(bytes(idat))
    stride = w * channels
    if len(raw) < h * (stride + 1):
        raise ValueError("truncated PNG pixel data")
    out = bytearray(h * stride)
    prev = bytearray(stride)
    rpos = 0
    for row in range(h):
        f = raw[rpos]
        line = bytearray(raw[rpos + 1 : rpos + 1 + stride])
        rpos += 1 + stride
        if f == 1:  # Sub
            for i in range(channels, stride):
                line[i] = (line[i] + line[i - channels]) & 0xFF
        elif f == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif f == 3:  # Average
            for i in range(stride):
                left = line[i - channels] if i >= channels else 0
                line[i] = (line[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            for i in range(stride):
                a = line[i - channels] if i >= channels else 0
                b = prev[i]
                c = prev[i - channels] if i >= channels else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                line[i] = (line[i] + pr) & 0xFF
        elif f != 0:
            raise ValueError(f"bad PNG filter {f}")
        out[row * stride : (row + 1) * stride] = line
        prev = line
    return w, h, channels, bytes(out)


def resize_nearest(
    w: int, h: int, channels: int, pixels: bytes, tw: int, th: int
) -> bytes:
    """Nearest-neighbor resample of a decoded raster (the pipeline's
    thumbnail/normalize step)."""
    out = bytearray(tw * th * channels)
    for ty in range(th):
        sy = min(ty * h // th, h - 1)
        for tx in range(tw):
            sx = min(tx * w // tw, w - 1)
            src = (sy * w + sx) * channels
            dst = (ty * tw + tx) * channels
            out[dst : dst + channels] = pixels[src : src + channels]
    return bytes(out)


def raster_feature(payload: bytes, dim: int = 8) -> list[float]:
    """Real decoded-image feature vector: dimensions + per-channel
    mean/std moments from the actual pixels (deterministic; sequential
    Python-float folds so the values are engine-independent)."""
    w, h, channels, px = decode_image(payload)
    n = w * h
    feats = [min(w / 4096.0, 1.0), min(h / 4096.0, 1.0), channels / 4.0]
    for c in range(min(channels, 3)):
        vals = px[c :: channels]
        mean = sum(vals) / n
        var = sum((v - mean) ** 2 for v in vals) / n
        feats.append(mean / 255.0)
        feats.append(var**0.5 / 255.0)
    feats = feats[:dim]
    return feats + [0.0] * (dim - len(feats))


def png_feature(payload: bytes, dim: int = 8) -> list[float]:
    """PNG pixel-moment features (kept name; delegates to the generic
    raster path)."""
    return raster_feature(payload, dim)


def decode_image(payload: bytes) -> tuple[int, int, int, bytes]:
    """Decode an image payload to raw pixels (w, h, channels, bytes).

    All three crawl raster formats have real pure-Python decoders:
    PNG (:func:`decode_png`), baseline JPEG (:mod:`.jpegcore` —
    huffman + IDCT + YCbCr from the public T.81 spec), and GIF
    (:mod:`.gifcore` — LZW + palettes + interlace). Audio/video live
    in :mod:`.riffcore` (WAV, AVI-MJPEG); compressed codecs raise
    NotImplementedError and the pipeline surface (``extract_features``)
    degrades to the deterministic byte-histogram feature for them.
    """
    if payload[:8] == _PNG_SIG:
        return decode_png(payload)
    if payload[:2] == b"\xff\xd8":
        from .jpegcore import decode_jpeg

        return decode_jpeg(payload)
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        from .gifcore import decode_gif

        return decode_gif(payload)
    raise NotImplementedError(
        "no decoder for this format (PNG, baseline JPEG, and GIF are supported)"
    )


def extract_features(
    df: DataFrame, bin_col: str = "payload", url_col: str = "url", dim: int = 8
) -> DataFrame:
    """mapInPandas feature extraction over binary payloads.

    Real Arrow-batched plumbing (schema, batching, error capture per
    row). PNG payloads go through the real pure-Python decoder and get
    pixel-moment features; other formats fall back to the deterministic
    byte-histogram stand-in, with the decode limitation recorded in
    ``decode_error``.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, errs, ctypes, sizes = [], [], [], []
            for payload in pdf[bin_col]:
                raw = bytes(payload) if payload is not None else b""
                sizes.append(len(raw))
                ct = _sniff_bytes(raw)
                ctypes.append(ct)
                try:
                    if ct in ("image/png", "image/jpeg", "image/gif"):
                        feats.append(raster_feature(raw, dim))
                        errs.append(None)
                    elif ct == "audio/x-wav":
                        from .riffcore import audio_feature

                        feats.append(audio_feature(raw, dim))
                        errs.append(None)
                    elif ct == "video/x-msvideo":
                        from .riffcore import video_feature

                        feats.append(video_feature(raw, dim))
                        errs.append(None)
                    elif ct == "audio/mpeg":
                        # frame-header walk (mp3core): real duration/
                        # bitrate/rate metadata; PCM stays undecoded and
                        # the distinction is recorded per row. Streams
                        # with no parseable frame sequence (tag-only or
                        # corrupt) keep the labeled histogram fallback.
                        from .mp3core import mp3_feature

                        try:
                            feats.append(mp3_feature(raw, dim))
                            errs.append(
                                "metadata_feature: mp3 frame headers "
                                "parsed, PCM not decoded"
                            )
                        except (ValueError, NotImplementedError) as exc:
                            feats.append(_fake_feature(raw, dim))
                            errs.append(
                                f"fallback_feature: {type(exc).__name__}: {exc}"
                            )
                    elif ct == "audio/ogg":
                        # page walk (oggcore): CRC-verified RFC 3533
                        # framing, duration from the final granule;
                        # Vorbis packets stay undecoded and the
                        # distinction is recorded per row. Corrupt or
                        # non-Vorbis streams keep the labeled fallback.
                        from .oggcore import ogg_feature

                        try:
                            feats.append(ogg_feature(raw, dim))
                            errs.append(
                                "metadata_feature: ogg pages walked "
                                "(CRC-checked), packets not decoded"
                            )
                        except (ValueError, NotImplementedError) as exc:
                            feats.append(_fake_feature(raw, dim))
                            errs.append(
                                f"fallback_feature: {type(exc).__name__}: {exc}"
                            )
                    elif ct == "video/webm":
                        # EBML tree walk (webmcore): duration, dims,
                        # audio shape and cluster count from container
                        # metadata, CRC-32 elements verified; frame
                        # payloads stay undecoded, recorded per row.
                        from .webmcore import webm_feature

                        try:
                            feats.append(webm_feature(raw, dim))
                            errs.append(
                                "metadata_feature: webm EBML tree walked"
                                " (CRC-checked), frames not decoded"
                            )
                        except (ValueError, NotImplementedError) as exc:
                            feats.append(_fake_feature(raw, dim))
                            errs.append(
                                f"fallback_feature: {type(exc).__name__}: {exc}"
                            )
                    else:
                        feats.append(_fake_feature(raw, dim))
                        errs.append(
                            None
                            if not ct.startswith(("image/", "audio/", "video/"))
                            else "fallback_feature: no decoder for " + ct
                        )
                except Exception as exc:  # decode failure → row, not crash
                    feats.append([0.0] * dim)
                    errs.append(f"{type(exc).__name__}: {exc}")
            yield pd.DataFrame(
                {
                    "url": pdf[url_col].values,
                    "content_type": ctypes,
                    "payload_bytes": sizes,
                    "feature": feats,
                    "decode_error": errs,
                }
            )

    return df.select(url_col, bin_col).mapInPandas(run, schema=FEATURE_SCHEMA)
