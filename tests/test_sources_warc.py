"""WARC source: writer↔reader round-trip, malformed-record tolerance,
and the full archive→extraction pipeline on Spark."""

from datetime import datetime, timezone

import pytest

from pdf_parser_spark.sources.warc import (
    parse_warc_bytes,
    read_warc,
    records_to_warc_gz,
    warc_record,
)

TS = datetime(2024, 3, 1, 12, 0, 0, tzinfo=timezone.utc)


def test_warc_roundtrip_pure():
    recs = [
        ("https://a.example.com/1", TS, b"<html>one</html>"),
        ("https://b.example.com/2", TS, b"%PDF-1.4 fake"),
    ]
    blob = records_to_warc_gz(recs)
    out = list(parse_warc_bytes(blob))
    assert [(u, t, p) for u, t, p, e in out] == recs
    assert all(e is None for _, _, _, e in out)


def test_warc_skips_non_response_records():
    req = warc_record("https://x/1", TS, b"GET / HTTP/1.1").replace(
        b"WARC-Type: response", b"WARC-Type: request"
    )
    resp = warc_record("https://x/2", TS, b"payload")
    import gzip, io

    buf = io.BytesIO()
    for r in (req, resp):
        m = io.BytesIO()
        with gzip.GzipFile(fileobj=m, mode="wb", mtime=0) as gz:
            gz.write(r)
        buf.write(m.getvalue())
    out = list(parse_warc_bytes(buf.getvalue()))
    assert len(out) == 1 and out[0][0] == "https://x/2"


def test_warc_malformed_members_never_raise():
    good = records_to_warc_gz([("https://ok/1", TS, b"fine")])
    # truncated archive
    for cut in range(0, len(good), 7):
        rows = list(parse_warc_bytes(good[:cut]))
        assert all(len(r) == 4 for r in rows)
    # corrupt header inside a valid gzip member
    import gzip, io

    m = io.BytesIO()
    with gzip.GzipFile(fileobj=m, mode="wb", mtime=0) as gz:
        gz.write(b"NOT-A-WARC\r\n\r\nrest")
    rows = list(parse_warc_bytes(m.getvalue()))
    assert rows and rows[0][3] is not None  # error row, not an exception


def test_warc_to_extraction_pipeline(spark, tmp_path):
    """Archive files → read_warc → parse_webdocs: extracted text matches
    the per-doc ground truth, proving WARC ingestion feeds the same
    kernel as the parquet path."""
    from pyspark.sql import functions as F

    from pdf_parser_spark.engine.corpus import (
        expected_extracted,
        payload_for,
    )
    from pdf_parser_spark.engine.extractor import HOST_FROM_URL, parse_webdocs

    docs = [(i, f"text for doc {i} " * 8) for i in range(6)]
    recs = [
        (f"https://h{i % 2}.example.com/doc/{i}", TS, payload_for(i, t, "en"))
        for i, t in docs
    ]
    # two archive files → two file-granular tasks
    (tmp_path / "part0.warc.gz").write_bytes(records_to_warc_gz(recs[:3]))
    (tmp_path / "part1.warc.gz").write_bytes(records_to_warc_gz(recs[3:]))

    wdf = read_warc(spark, str(tmp_path / "*.warc.gz"))
    assert wdf.where(F.col("record_error").isNotNull()).count() == 0
    webdocs = wdf.where(F.col("url").isNotNull()).withColumn(
        "host", F.regexp_extract("url", HOST_FROM_URL, 1)
    )
    parsed = parse_webdocs(webdocs)
    got = {r["url"]: r["text"] for r in parsed.select("url", "text").collect()}
    want = {
        f"https://h{i % 2}.example.com/doc/{i}": expected_extracted(i, t)
        for i, t in docs
    }
    assert got == want


def test_warc_truncated_body_is_error_row():
    """A record whose Content-Length exceeds the remaining bytes must
    yield a 'truncated record body' error row, never a silently short
    payload (errors-become-audit contract)."""
    rec = warc_record("https://x/1", TS, b"0123456789")
    cut = rec[: rec.find(b"0123456789") + 4]  # body cut mid-payload
    rows = list(parse_warc_bytes(cut, gzipped=False))
    assert rows == [(None, None, None, "truncated record body")]
    # a full record followed by a truncated one: first survives
    both = rec + cut
    rows = list(parse_warc_bytes(both, gzipped=False))
    assert rows[0][0] == "https://x/1" and rows[0][2] == b"0123456789"
    assert rows[1][3] == "truncated record body"


def test_warc_negative_content_length_is_error_row_not_hang():
    """Content-Length: -(head_end+4) left the record cursor in place —
    the while loop spun forever on one hostile record (found by fuzz,
    round 5). Must yield an error row and stop."""
    head = b"WARC/1.0\r\nWARC-Type: response\r\nContent-Length: -54\r\n\r\n"
    assert head.find(b"\r\n\r\n") + 4 == 54  # the exact non-advancing shape
    out = list(parse_warc_bytes(head + b"XYZ", gzipped=False))
    assert out == [(None, None, None, "negative Content-Length -54")]


def test_warc_mutation_fuzz_bounded():
    """400 seeded mutations of a valid archive: the parser must
    terminate and report malformations as error rows, never raise."""
    import random
    import time

    recs = [
        (f"https://ex.org/{i}", datetime(2026, 1, 1, tzinfo=timezone.utc),
         b"<p>doc %d</p>" % i)
        for i in range(5)
    ]
    base = records_to_warc_gz(recs)
    rng = random.Random(11)
    t0 = time.perf_counter()
    for _ in range(400):
        b = bytearray(base)
        kind = rng.randrange(4)
        if kind == 0:
            for _ in range(rng.randrange(1, 6)):
                b[rng.randrange(len(b))] ^= rng.randrange(1, 256)
        elif kind == 1:
            b = b[: rng.randrange(len(b))]
        elif kind == 2:
            i, j = sorted(rng.randrange(len(b)) for _ in range(2))
            b = b[:i] + b[j:] if rng.random() < 0.5 else b + b[i:j]
        else:
            i = rng.randrange(len(b))
            run = rng.randrange(1, 100)
            b[i : i + run] = bytes([rng.randrange(256)]) * min(run, len(b) - i)
        for _ in parse_warc_bytes(bytes(b)):
            pass
        for _ in parse_warc_bytes(bytes(b), gzipped=False):
            pass
    assert time.perf_counter() - t0 < 30.0


def test_warc_gzip_member_bomb_is_error_row():
    """A ~500 KB gzip member declaring 512 MB of zeros must surface as
    one error row (bounded inflate via max_length), not materialize."""
    import time
    import zlib

    comp = zlib.compressobj(9, zlib.DEFLATED, 31)
    parts = [comp.compress(b"\x00" * (1 << 20)) for _ in range(512)]
    parts.append(comp.flush())
    t0 = time.perf_counter()
    rows = list(parse_warc_bytes(b"".join(parts)))
    assert time.perf_counter() - t0 < 10.0
    assert rows == [(None, None, None,
                     "gzip member inflates past 268435456 bytes")]


# ------------------------------------------- WET export (sources/wet.py)


def test_wet_record_python_vs_jvm_identity(spark):
    """The Python writer and the JVM Column must build byte-identical
    records — including UTF-8 Content-Length octets vs char counts."""
    from datetime import datetime

    from pyspark.sql import functions as F

    from pdf_parser_spark.sources.wet import wet_record, wet_record_expr

    rows = [
        ("https://a.example.com/x", datetime(2026, 1, 1, 0, 0, 17), "plain"),
        ("https://b.example.com/y", datetime(2026, 3, 5, 12, 30, 0),
         "café – naïve 文字"),  # multibyte: octet len != char len
        ("https://c.example.com/z", datetime(2026, 1, 1), ""),
    ]
    df = spark.createDataFrame(
        [(u, t.strftime("%Y-%m-%dT%H:%M:%SZ"), x) for u, t, x in rows],
        "url STRING, stamp STRING, text STRING",
    )
    got = {
        r["url"]: r["rec"]
        for r in df.select(
            "url", wet_record_expr("url", "stamp", "text").alias("rec")
        ).collect()
    }
    for u, t, x in rows:
        assert got[u].encode("utf-8") == wet_record(u, t, x), u


def test_wet_dir_roundtrip(spark, tmp_path):
    from datetime import datetime

    from pdf_parser_spark.sources.wet import (
        read_wet,
        wet_record,
        write_wet_dir,
    )

    rows = [
        (f"https://h{i % 3}.example.com/d{i}",
         datetime(2026, 2, 1, i, 0, 0), f"text body {i} café")
        for i in range(8)
    ]
    df = spark.createDataFrame(
        rows, "url STRING, warc_ts TIMESTAMP, text STRING"
    ).repartition(3)
    n = write_wet_dir(df, str(tmp_path))
    assert n == 8
    back = read_wet(str(tmp_path))
    assert len(back) == 8
    by_url = {u: (s, x) for u, s, x in back}
    for u, t, x in rows:
        stamp, text = by_url[u]
        assert stamp == t.strftime("%Y-%m-%dT%H:%M:%SZ")
        assert text == x
        # and the on-disk member equals the canonical record writer
        assert wet_record(u, t, x).decode("utf-8").count(text) >= 1
