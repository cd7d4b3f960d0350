"""WET sink: extracted text → Common-Crawl-style conversion records.

The Common Crawl pipeline's output format for extracted plain text is
WET — WARC/1.0 ``conversion`` records (one per page, plain-text
payload) framed exactly like the response archives in :mod:`warc`.
This module closes the export side of the loop the engine already
ingests (WARC → extract → WET):

- :func:`wet_record`: dependency-free single-record writer (the
  Python twin — used by the file sink and by tests).
- :func:`wet_record_expr`: the SAME record built as a Spark Column —
  pure JVM string concatenation, so a corpus-wide export manifest
  (per-record bytes + md5) is a map-only plan with no Python in it.
  The two are pinned byte-identical by test; the oracle query rebuilds
  the record a third time in SQL, so the framing contract (header
  order, CRLF discipline, UTF-8 Content-Length octets, derived
  record id) can never drift silently in any of the three.
- :func:`write_wet_dir`: partition-per-file ``.warc.wet.gz`` sink
  (member-per-record gzip, the Common Crawl framing readers split
  without decompressing the whole file).

Determinism: real WET writers stamp a fresh UUID per record;
reproducible exports (and byte-level oracles) need the id to be a pure
function of the row, so WARC-Record-ID is md5(url) formatted as a
UUID. WARC-Date carries whole-second resolution like the response
writer.

Scale shape: the manifest is map-only (never shuffles the corpus);
the file sink writes one gzip per partition — file count = partition
count, controlled upstream by the writer's repartition, same contract
as :func:`warc.write_warc_dir`.
"""

from __future__ import annotations

import gzip
import hashlib
import io
import os
import uuid as _uuidmod
from collections.abc import Iterator
from datetime import datetime, timezone

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "wet_record",
    "wet_record_expr",
    "wet_export",
    "write_wet_dir",
    "read_wet",
]


def _record_uuid(url: str) -> str:
    h = hashlib.md5(url.encode("utf-8")).hexdigest()
    return f"{h[:8]}-{h[8:12]}-{h[12:16]}-{h[16:20]}-{h[20:32]}"


def wet_record(url: str, ts: datetime, text: str) -> bytes:
    """One WARC/1.0 conversion record (uncompressed). *ts* as in
    :func:`warc.warc_record`: tz-aware → UTC, naive means UTC."""
    if ts.tzinfo is not None:
        ts = ts.astimezone(timezone.utc)
    stamp = ts.strftime("%Y-%m-%dT%H:%M:%SZ")
    payload = text.encode("utf-8")
    header = (
        "WARC/1.0\r\n"
        "WARC-Type: conversion\r\n"
        f"WARC-Target-URI: {url}\r\n"
        f"WARC-Date: {stamp}\r\n"
        f"WARC-Record-ID: <urn:uuid:{_record_uuid(url)}>\r\n"
        "Content-Type: text/plain\r\n"
        f"Content-Length: {len(payload)}\r\n"
        "\r\n"
    ).encode("utf-8")
    return header + payload + b"\r\n\r\n"


def wet_record_expr(
    url_col: Column | str, stamp_col: Column | str, text_col: Column | str
) -> Column:
    """The record of :func:`wet_record` as one JVM string expression.

    *stamp_col* must already be the formatted ``WARC-Date`` string
    (``yyyy-MM-dd'T'HH:mm:ss'Z'`` of a UTC timestamp) — formatting
    stays with the caller so batch/streaming/SQL sources can derive it
    their own way. Content-Length is ``octet_length`` (UTF-8 octets,
    matching the Python twin's encoded length, not the char count)."""
    u = F.col(url_col) if isinstance(url_col, str) else url_col
    s = F.col(stamp_col) if isinstance(stamp_col, str) else stamp_col
    t = F.col(text_col) if isinstance(text_col, str) else text_col
    h = F.md5(u.cast("binary"))
    rid = F.concat_ws(
        "-",
        F.substring(h, 1, 8),
        F.substring(h, 9, 4),
        F.substring(h, 13, 4),
        F.substring(h, 17, 4),
        F.substring(h, 21, 12),
    )
    crlf = F.lit("\r\n")
    return F.concat(
        F.lit("WARC/1.0"), crlf,
        F.lit("WARC-Type: conversion"), crlf,
        F.lit("WARC-Target-URI: "), u, crlf,
        F.lit("WARC-Date: "), s, crlf,
        F.lit("WARC-Record-ID: <urn:uuid:"), rid, F.lit(">"), crlf,
        F.lit("Content-Type: text/plain"), crlf,
        F.lit("Content-Length: "),
        F.octet_length(t).cast("string"), crlf,
        crlf,
        t, crlf, crlf,
    )


def wet_export(
    df: DataFrame,
    url_col: str = "url",
    stamp_col: str = "stamp",
    text_col: str = "text",
) -> DataFrame:
    """Export manifest: (url, record_len, record_md5) per document —
    the audit surface a WET export job commits next to the files
    (byte-exact lengths for offset indexes, digests for integrity
    checks). Map-only; the record string never leaves the JVM."""
    rec = wet_record_expr(url_col, stamp_col, text_col)
    return df.select(
        F.col(url_col).alias("url"),
        F.octet_length(rec).cast("bigint").alias("record_len"),
        F.md5(rec.cast("binary")).alias("record_md5"),
    )


def write_wet_dir(df: DataFrame, out_dir: str) -> int:
    """Write (url, warc_ts, text) rows as one ``.warc.wet.gz`` per
    partition under *out_dir* (member-per-record gzip); returns the
    record count. Same executor-local-write contract as
    :func:`warc.write_warc_dir`."""
    import pandas as pd

    os.makedirs(out_dir, exist_ok=True)

    def dump(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        recs: list[bytes] = []
        for pdf in batches:
            for u, t, x in zip(pdf["url"], pdf["warc_ts"], pdf["text"]):
                ts = t.to_pydatetime() if hasattr(t, "to_pydatetime") else t
                recs.append(wet_record(u, ts, x or ""))
        n = 0
        if recs:
            path = os.path.join(
                out_dir, f"part-{_uuidmod.uuid4().hex}.warc.wet.gz"
            )
            out = io.BytesIO()
            for r in recs:
                member = io.BytesIO()
                with gzip.GzipFile(fileobj=member, mode="wb", mtime=0) as gz:
                    gz.write(r)
                out.write(member.getvalue())
            with open(path, "wb") as fh:
                fh.write(out.getvalue())
            n = len(recs)
        yield pd.DataFrame({"n": [n]})

    counts = (
        df.select("url", "warc_ts", "text")
        .mapInPandas(dump, schema="n BIGINT")
        .agg(F.sum("n").alias("total"))
        .collect()
    )
    return int(counts[0]["total"] or 0)


def read_wet(path: str) -> list[tuple[str, str, str]]:
    """Driver-side round-trip reader for tests: every record in every
    ``.warc.wet.gz`` under *path* as (url, stamp, text). Reuses the
    member splitter of the WARC reader (same gzip framing)."""
    from .warc import _split_members

    out: list[tuple[str, str, str]] = []
    for name in sorted(os.listdir(path)):
        if not name.endswith(".warc.wet.gz"):
            continue
        with open(os.path.join(path, name), "rb") as fh:
            data = fh.read()
        for member in _split_members(data):
            head, _, rest = member.partition(b"\r\n\r\n")
            fields = {}
            for line in head.decode("utf-8").split("\r\n")[1:]:
                k, _, v = line.partition(": ")
                fields[k] = v
            n = int(fields["Content-Length"])
            out.append(
                (
                    fields["WARC-Target-URI"],
                    fields["WARC-Date"],
                    rest[:n].decode("utf-8"),
                )
            )
    return out
