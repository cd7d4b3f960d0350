"""WARC source: Common-Crawl-style archive files → the webdocs table.

Crawl corpora arrive as WARC (ISO 28500) archives — one gzip member per
record in the Common Crawl layout — before they ever become an Iceberg
table. This module closes that gap:

- ``records_to_warc_gz`` / ``warc_record``: a dependency-free writer
  (WARC/1.0, member-per-record gzip) used by tests and the ingest
  round-trip query.
- ``read_warc``: distributed reader — ``spark.read.format
  ("binaryFile")`` loads each archive as one row (path, bytes), and a
  ``mapInPandas`` stage splits it into response records, yielding
  ``(url, warc_ts, html)`` rows that feed the same extraction pipeline
  as the parquet/Iceberg path.

Scale shape: parallelism is per-FILE (a real crawl segment is ~1 GB ×
tens of thousands of files, so file-granular tasks saturate any
cluster; ``binaryFile`` already prunes by path and spreads files across
tasks). Each file decompresses streamwise member-by-member — peak
memory is one file + one record, and malformed members are skipped and
counted rather than raised, matching the kernel's errors-become-audit
contract. For archives larger than executor memory, split upstream by
WARC segment (the Common Crawl layout already does).
"""

from __future__ import annotations

import gzip
import io
import zlib
from collections.abc import Iterator
from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession

WARC_SCHEMA = (
    "url STRING, warc_ts TIMESTAMP, html BINARY, source_file STRING, "
    "record_error STRING"
)


def warc_record(
    url: str, ts: datetime, payload: bytes, content_type: str = "text/html"
) -> bytes:
    """One WARC/1.0 response record (uncompressed).

    *ts* must be UTC: either tz-aware (converted) or naive-meaning-UTC
    (the engine's convention — build_session pins
    spark.sql.session.timeZone=UTC, so mapInPandas hands back naive
    UTC timestamps). WARC-Date has whole-second resolution (the WARC
    1.0 standard form); sub-second precision does not survive."""
    if ts.tzinfo is not None:
        ts = ts.astimezone(timezone.utc)
    stamp = ts.strftime("%Y-%m-%dT%H:%M:%SZ")
    header = (
        "WARC/1.0\r\n"
        "WARC-Type: response\r\n"
        f"WARC-Target-URI: {url}\r\n"
        f"WARC-Date: {stamp}\r\n"
        f"Content-Type: {content_type}\r\n"
        f"Content-Length: {len(payload)}\r\n"
        "\r\n"
    ).encode("utf-8")
    return header + payload + b"\r\n\r\n"


def records_to_warc_gz(records: list[tuple[str, datetime, bytes]]) -> bytes:
    """Member-per-record gzip archive (the Common Crawl framing: each
    record is an independent gzip member, so readers can split without
    decompressing the whole file)."""
    out = io.BytesIO()
    for url, ts, payload in records:
        member = io.BytesIO()
        with gzip.GzipFile(fileobj=member, mode="wb", mtime=0) as gz:
            gz.write(warc_record(url, ts, payload))
        out.write(member.getvalue())
    return out.getvalue()


# Per-member inflate ceiling: WARC members are one-record gzip blobs;
# a hostile archive can make a tiny member inflate to GBs (same
# decompression-bomb class as pdfcore/filters.py). 256 MiB passes any
# real crawl record with room to spare.
MAX_MEMBER_BYTES = 256 * 1024 * 1024


class _MemberTooLarge(ValueError):
    pass


def _split_members(data: bytes) -> Iterator[bytes]:
    """Decompress a multi-member gzip stream member-by-member.
    Raises :class:`_MemberTooLarge` when a member's output exceeds the
    bomb ceiling (parse_warc_bytes turns that into an error row)."""
    pos = 0
    n = len(data)
    while pos < n:
        d = zlib.decompressobj(wbits=31)
        try:
            chunk = d.decompress(data[pos:], MAX_MEMBER_BYTES + 1)
        except zlib.error:
            return  # trailing garbage / truncated member: stop cleanly
        if len(chunk) > MAX_MEMBER_BYTES:
            raise _MemberTooLarge(
                f"gzip member inflates past {MAX_MEMBER_BYTES} bytes"
            )
        yield chunk
        consumed = n - pos - len(d.unused_data)
        if consumed <= 0:
            return
        pos += consumed


def parse_warc_bytes(
    data: bytes, gzipped: bool = True
) -> Iterator[tuple[str | None, datetime | None, bytes | None, str | None]]:
    """(url, ts, payload, error) per record; header failures yield an
    error row instead of raising."""
    members = _split_members(data) if gzipped else iter([data])
    while True:
        try:
            member = next(members)
        except StopIteration:
            break
        except _MemberTooLarge as exc:
            yield None, None, None, str(exc)
            break
        # an uncompressed stream may hold many records back-to-back
        rest = member
        while rest.strip():
            head_end = rest.find(b"\r\n\r\n")
            if head_end == -1:
                yield None, None, None, "truncated record header"
                break
            head = rest[:head_end].decode("utf-8", "replace")
            lines = head.split("\r\n")
            if not lines or not lines[0].startswith("WARC/"):
                yield None, None, None, f"bad version line: {lines[0][:40]!r}"
                break
            fields = {}
            for ln in lines[1:]:
                k, _, v = ln.partition(":")
                fields[k.strip().lower()] = v.strip()
            try:
                length = int(fields.get("content-length", ""))
            except ValueError:
                yield None, None, None, "missing Content-Length"
                break
            if length < 0:
                # a negative length is hostile input: with
                # length == -(head_end+4) the cursor would not advance
                # and the record loop would spin forever
                yield None, None, None, f"negative Content-Length {length}"
                break
            if len(rest) < head_end + 4 + length:
                # a truncated final record must surface as an error row,
                # not a silently short payload (errors-become-audit)
                yield None, None, None, "truncated record body"
                break
            body = rest[head_end + 4 : head_end + 4 + length]
            rest = rest[head_end + 4 + length :].lstrip(b"\r\n")
            if fields.get("warc-type") != "response":
                continue  # request/metadata/warcinfo records: skip
            url = fields.get("warc-target-uri")
            ts = None
            raw_ts = fields.get("warc-date", "")
            try:
                ts = datetime.strptime(raw_ts, "%Y-%m-%dT%H:%M:%SZ").replace(
                    tzinfo=timezone.utc
                )
            except ValueError:
                pass
            yield url, ts, body, None


def write_warc_dir(webdocs: DataFrame, out_dir: str) -> int:
    """Write (url, warc_ts, html) rows as one .warc.gz per partition
    under *out_dir*; returns the number of records written. Executors
    write locally — correct in local mode and on any shared filesystem
    (HDFS/NFS); object stores want a committer, out of scope here.
    Used by tests and the warc_ingest round-trip query."""
    import os
    import uuid

    from pyspark.sql import functions as F

    os.makedirs(out_dir, exist_ok=True)
    import pandas as pd

    def dump(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        recs: list[tuple[str, datetime, bytes]] = []
        for pdf in batches:
            for u, t, p in zip(pdf["url"], pdf["warc_ts"], pdf["html"]):
                ts = t.to_pydatetime() if hasattr(t, "to_pydatetime") else t
                recs.append((u, ts, bytes(p)))
        n = 0
        if recs:
            path = os.path.join(out_dir, f"part-{uuid.uuid4().hex}.warc.gz")
            with open(path, "wb") as fh:
                fh.write(records_to_warc_gz(recs))
            n = len(recs)
        yield pd.DataFrame({"n": [n]})

    counts = (
        webdocs.select("url", "warc_ts", "html")
        .mapInPandas(dump, schema="n BIGINT")
        .agg(F.sum("n").alias("total"))
        .collect()
    )
    return int(counts[0]["total"] or 0)


def read_warc(
    spark: SparkSession, path: str, gzipped: bool = True
) -> DataFrame:
    """Distributed WARC read: one task per archive file, records split
    executor-side. Output feeds ``engine.extractor.parse_webdocs``
    directly (url, warc_ts, html); malformed records surface as
    ``record_error`` rows for the audit rollup, never exceptions."""
    import pandas as pd

    files = spark.read.format("binaryFile").load(path).select(
        "path", "content"
    )

    def split(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for fpath, blob in zip(pdf["path"], pdf["content"]):
                rows = {
                    "url": [],
                    "warc_ts": [],
                    "html": [],
                    "source_file": [],
                    "record_error": [],
                }
                for url, ts, body, err in parse_warc_bytes(
                    bytes(blob), gzipped=gzipped
                ):
                    rows["url"].append(url)
                    rows["warc_ts"].append(ts)
                    rows["html"].append(body)
                    rows["source_file"].append(fpath)
                    rows["record_error"].append(err)
                yield pd.DataFrame(rows)

    return files.mapInPandas(split, schema=WARC_SCHEMA)
