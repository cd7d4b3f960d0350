"""Arrow-batched extraction UDF and the end-to-end pipeline.

``extract_batch`` is the engine's single UDTF-style extractor
(SURVEY.md §2.9): Arrow record batches of (url, html, host) in, parsed
rows out. Payload dispatch sniffs ``%PDF-`` magic vs markup
(SURVEY.md §2.10). One parse produces BOTH the extracted text and the
span records (spans travel as an array<struct> column so the expensive
kernel work happens exactly once; downstream views prune or explode).

Per-partition lineage (north rule): every row carries the Spark
partition id; the ``audit`` view aggregates docs/sec, byte volume and
parse-failure counts per partition without a second pass over payloads.
"""

from __future__ import annotations

import os
import time
from collections.abc import Iterator

import pandas as pd

from pyspark import TaskContext
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..htmlcore.extract import extract_html
from ..pdfcore.extract import extract_pdf
from .partitioning import salted_repartition

SPAN_STRUCT = (
    "page_no INT, seq INT, text STRING, x DOUBLE, y DOUBLE, "
    "font STRING, size DOUBLE, width DOUBLE"
)
ITEM_STRUCT = (
    "seq INT, page_no INT, font STRING, text STRING, "
    "encoded_hex STRING, instance_index INT"
)
PARSED_SCHEMA = (
    "url STRING, kind STRING, text STRING, n_pages INT, n_items INT, "
    f"n_spans INT, error STRING, parse_ms DOUBLE, payload_bytes BIGINT, "
    f"partition_id INT, fallback_pages INT, recovered INT, "
    f"spans ARRAY<STRUCT<{SPAN_STRUCT}>>, items ARRAY<STRUCT<{ITEM_STRUCT}>>"
)


def _sniff(payload: bytes) -> str:
    head = payload[:1024]
    if head.lstrip()[:5] == b"%PDF-" or b"%PDF-" in head:
        return "pdf"
    return "html"


# Per-document payload ceiling. At 10^12 crawled documents a handful of
# multi-GB rows WILL arrive (wrong content-length, tar bombs, video
# mislabeled as text/html); parsing one would balloon a single task's
# memory far past the executor's per-core budget and can fail the whole
# stage. Oversize rows short-circuit to an error row — lineage keeps the
# url and true byte count, the audit sink counts them, and the other
# rows in the batch are unaffected. Override per job via
# SPARK_GRAFT_MAX_PAYLOAD_BYTES (driver env, shipped in the closure) or
# the parse_webdocs parameter; 0 disables the guard.
DEFAULT_MAX_PAYLOAD_BYTES = 64 * 1024 * 1024


def _resolve_max_payload(max_payload_bytes: int | None) -> int:
    if max_payload_bytes is not None:
        return max_payload_bytes
    return int(
        os.environ.get(
            "SPARK_GRAFT_MAX_PAYLOAD_BYTES", DEFAULT_MAX_PAYLOAD_BYTES
        )
    )


def _extract_one(
    url: str,
    payload,
    emit_items: bool = True,
    multibyte: bool = False,
    max_bytes: int = DEFAULT_MAX_PAYLOAD_BYTES,
) -> dict:
    t0 = time.perf_counter()
    if payload is None:
        payload = b""
    payload = bytes(payload)
    kind = _sniff(payload)
    if max_bytes and len(payload) > max_bytes:
        return {
            "url": url,
            "kind": kind,
            "text": "",
            "n_pages": 0,
            "n_items": 0,
            "n_spans": 0,
            "error": (
                f"PayloadTooLarge: {len(payload)} bytes > cap {max_bytes}"
            ),
            "parse_ms": (time.perf_counter() - t0) * 1000.0,
            "payload_bytes": len(payload),
            "fallback_pages": 0,
            "recovered": 0,
            "spans": [],
            "items": [],
        }
    text = ""
    n_pages = n_items = n_spans = fallback_pages = recovered = 0
    error = None
    spans: list[dict] = []
    items: list[dict] = []
    if kind == "pdf":
        r = extract_pdf(payload, multibyte_cmaps=multibyte)
        text, n_pages, n_items, error = r.text, r.n_pages, r.n_items, r.error
        fallback_pages = r.fallback_pages
        recovered = int(r.recovered)
        spans = [
            {
                "page_no": int(pg),
                "seq": int(s.seq),
                "text": s.text,
                "x": float(s.x),
                "y": float(s.y),
                "font": s.font,
                "size": float(s.size),
                "width": float(s.width),
            }
            for s, pg in zip(r.spans, r.span_pages)
        ]
        n_spans = len(spans)
        items = [] if not emit_items else [
            {
                "seq": int(i),
                "page_no": int(pno),
                "font": font,
                "text": itext,
                "encoded_hex": encoded.hex(),
                "instance_index": int(idx),
            }
            for i, (pno, font, itext, encoded, idx) in enumerate(r.items)
        ]
    else:
        try:
            text = extract_html(payload.decode("utf-8", errors="replace"))
            n_items = text.count("\n") + 1 if text else 0
        except Exception as exc:  # html path must never kill a batch
            error = f"{type(exc).__name__}: {exc}"
    return {
        "url": url,
        "kind": kind,
        "text": text,
        "n_pages": n_pages,
        "n_items": n_items,
        "n_spans": n_spans,
        "error": error,
        "parse_ms": (time.perf_counter() - t0) * 1000.0,
        "payload_bytes": len(payload),
        "fallback_pages": fallback_pages,
        "recovered": recovered,
        "spans": spans,
        "items": items,
    }


def extract_batch(
    batches: Iterator[pd.DataFrame],
    emit_items: bool = True,
    multibyte: bool = False,
    max_payload_bytes: int | None = None,
) -> Iterator[pd.DataFrame]:
    """mapInPandas body: (url, html[, ...]) batches → PARSED_SCHEMA batches."""
    ctx = TaskContext.get()
    pid = ctx.partitionId() if ctx is not None else -1
    max_bytes = _resolve_max_payload(max_payload_bytes)
    for pdf in batches:
        rows = [
            _extract_one(u, p, emit_items, multibyte, max_bytes)
            for u, p in zip(pdf["url"], pdf["html"])
        ]
        out = pd.DataFrame(
            rows,
            columns=[
                "url", "kind", "text", "n_pages", "n_items", "n_spans",
                "error", "parse_ms", "payload_bytes", "fallback_pages",
                "recovered", "spans", "items",
            ],
        )
        out.insert(9, "partition_id", pid)
        yield out


def _arrow_schema():
    import pyarrow as pa

    span = pa.struct(
        [
            ("page_no", pa.int32()),
            ("seq", pa.int32()),
            ("text", pa.string()),
            ("x", pa.float64()),
            ("y", pa.float64()),
            ("font", pa.string()),
            ("size", pa.float64()),
            ("width", pa.float64()),
        ]
    )
    item = pa.struct(
        [
            ("seq", pa.int32()),
            ("page_no", pa.int32()),
            ("font", pa.string()),
            ("text", pa.string()),
            ("encoded_hex", pa.string()),
            ("instance_index", pa.int32()),
        ]
    )
    return pa.schema(
        [
            ("url", pa.string()),
            ("kind", pa.string()),
            ("text", pa.string()),
            ("n_pages", pa.int32()),
            ("n_items", pa.int32()),
            ("n_spans", pa.int32()),
            ("error", pa.string()),
            ("parse_ms", pa.float64()),
            ("payload_bytes", pa.int64()),
            ("partition_id", pa.int32()),
            ("fallback_pages", pa.int32()),
            ("recovered", pa.int32()),
            ("spans", pa.list_(span)),
            ("items", pa.list_(item)),
        ]
    )


def extract_batch_arrow(
    batches,
    emit_items: bool = True,
    multibyte: bool = False,
    max_payload_bytes: int | None = None,
) -> "Iterator":
    """mapInArrow body: columnar twin of extract_batch.

    Builds the output RecordBatch column-by-column (flat span arrays +
    offsets) instead of per-row dicts through pandas — skips one full
    row→columnar conversion per batch on the hot path.
    """
    import pyarrow as pa

    from ..htmlcore.extract import extract_html as _xhtml
    from ..pdfcore.extract import extract_pdf as _xpdf

    ctx = TaskContext.get()
    pid = ctx.partitionId() if ctx is not None else -1
    max_bytes = _resolve_max_payload(max_payload_bytes)
    schema = _arrow_schema()
    for batch in batches:
        urls = batch.column("url").to_pylist()
        payloads = batch.column("html").to_pylist()
        n = len(urls)
        kind_c, text_c, npages_c, nitems_c, nspans_c = [], [], [], [], []
        err_c, ms_c, bytes_c, fb_c, rec_c = [], [], [], [], []
        # spans/items as flat struct columns + list offsets
        offsets = [0]
        s_page, s_seq, s_text = [], [], []
        s_x, s_y, s_font, s_size, s_width = [], [], [], [], []
        i_offsets = [0]
        i_seq, i_page, i_font, i_text, i_hex, i_idx = [], [], [], [], [], []
        for url, payload in zip(urls, payloads):
            t0 = time.perf_counter()
            raw = bytes(payload) if payload is not None else b""
            kind = _sniff(raw)
            text, n_pages, n_items, error = "", 0, 0, None
            n_spans = fallback_pages = recovered = 0
            if max_bytes and len(raw) > max_bytes:
                error = (
                    f"PayloadTooLarge: {len(raw)} bytes > cap {max_bytes}"
                )
            elif kind == "pdf":
                r = _xpdf(raw, multibyte_cmaps=multibyte)
                text, n_pages, n_items, error = r.text, r.n_pages, r.n_items, r.error
                n_spans = len(r.spans)
                fallback_pages = r.fallback_pages
                recovered = int(r.recovered)
                for s, pg in zip(r.spans, r.span_pages):
                    s_page.append(pg)
                    s_seq.append(s.seq)
                    s_text.append(s.text)
                    s_x.append(s.x)
                    s_y.append(s.y)
                    s_font.append(s.font)
                    s_size.append(s.size)
                    s_width.append(s.width)
                for i, (pno, font, itext, encoded, idx) in (
                    enumerate(r.items) if emit_items else ()
                ):
                    i_seq.append(i)
                    i_page.append(pno)
                    i_font.append(font)
                    i_text.append(itext)
                    i_hex.append(encoded.hex())
                    i_idx.append(idx)
            else:
                try:
                    text = _xhtml(raw.decode("utf-8", errors="replace"))
                    n_items = text.count("\n") + 1 if text else 0
                except Exception as exc:
                    error = f"{type(exc).__name__}: {exc}"
            offsets.append(len(s_seq))
            i_offsets.append(len(i_seq))
            kind_c.append(kind)
            text_c.append(text)
            npages_c.append(n_pages)
            nitems_c.append(n_items)
            nspans_c.append(n_spans)
            err_c.append(error)
            ms_c.append((time.perf_counter() - t0) * 1000.0)
            bytes_c.append(len(raw))
            fb_c.append(fallback_pages)
            rec_c.append(recovered)
        span_struct = pa.StructArray.from_arrays(
            [
                pa.array(s_page, pa.int32()),
                pa.array(s_seq, pa.int32()),
                pa.array(s_text, pa.string()),
                pa.array(s_x, pa.float64()),
                pa.array(s_y, pa.float64()),
                pa.array(s_font, pa.string()),
                pa.array(s_size, pa.float64()),
                pa.array(s_width, pa.float64()),
            ],
            names=["page_no", "seq", "text", "x", "y", "font", "size", "width"],
        )
        spans_col = pa.ListArray.from_arrays(
            pa.array(offsets, pa.int32()), span_struct
        )
        item_struct = pa.StructArray.from_arrays(
            [
                pa.array(i_seq, pa.int32()),
                pa.array(i_page, pa.int32()),
                pa.array(i_font, pa.string()),
                pa.array(i_text, pa.string()),
                pa.array(i_hex, pa.string()),
                pa.array(i_idx, pa.int32()),
            ],
            names=["seq", "page_no", "font", "text", "encoded_hex", "instance_index"],
        )
        items_col = pa.ListArray.from_arrays(
            pa.array(i_offsets, pa.int32()), item_struct
        )
        yield pa.RecordBatch.from_arrays(
            [
                pa.array(urls, pa.string()),
                pa.array(kind_c, pa.string()),
                pa.array(text_c, pa.string()),
                pa.array(npages_c, pa.int32()),
                pa.array(nitems_c, pa.int32()),
                pa.array(nspans_c, pa.int32()),
                pa.array(err_c, pa.string()),
                pa.array(ms_c, pa.float64()),
                pa.array(bytes_c, pa.int64()),
                pa.array([pid] * n, pa.int32()),
                pa.array(fb_c, pa.int32()),
                pa.array(rec_c, pa.int32()),
                spans_col,
                items_col,
            ],
            schema=schema,
        )


def parse_webdocs(
    webdocs: DataFrame,
    num_partitions: int | None = None,
    salt: bool = True,
    salt_map: dict[str, int] | None = None,
    emit_items: bool = False,
    multibyte: bool = False,
    max_payload_bytes: int | None = None,
) -> DataFrame:
    """webdocs → parsed DataFrame (the single materialization point).

    Column-prunes to (url, host, html) before the shuffle so only the
    payload bytes move; salting spreads hot hosts (north rule).

    The salt-map pre-pass is a groupBy(host).count() — cheap (pruned
    column scan) when webdocs is a real table, but it re-executes the
    whole upstream plan when webdocs is itself UDF-generated (column
    pruning cannot reach through mapInPandas). In that case pass
    ``salt_map`` computed from a cheap side-channel (e.g. the source
    table's host column) to keep the pipeline single-pass.

    ``multibyte=True`` enables the kernel's CID 2-byte CMap extension
    on every PDF in the batch (extract.extract_pdf multibyte_cmaps);
    off by default for reference-identical output.

    ``max_payload_bytes`` caps per-document payload size (default 64
    MiB, env ``SPARK_GRAFT_MAX_PAYLOAD_BYTES``, 0 disables): oversize
    rows become error rows (``PayloadTooLarge``) with url + true byte
    count preserved for the audit sink, instead of risking one
    mislabeled multi-GB crawl row failing a whole stage.

    ``num_partitions=0`` preserves the input partitioning — no
    repartition, no salt, the kernel maps directly over the source's
    own splits. For file-backed corpora this is the plan to ship at
    10^12-doc scale: a stateless parse needs no shuffle at all (the
    scan's byte-range splits already balance payload bytes), and
    re-shuffling 100 TB of payloads costs a full extra write+read of
    the corpus. Pair it with ``spark.sql.files.maxPartitionBytes``
    sized so one split is a few MB of payloads (fine tasks absorb
    stragglers). The salted shuffle remains the default because it is
    required when the upstream is UDF-generated (one giant synthesis
    partition) or when a downstream stage groups by host (skew).
    """
    spark = webdocs.sparkSession
    if num_partitions == 0:
        salt = False
    if num_partitions is None:
        # ~8 task waves per core slot, NOT one-task-per-slot: documents
        # are grouped by (host, salt) buckets whose byte sizes vary
        # widely, so coarse tasks leave slots idle behind stragglers
        # (measured 1.66x wall at local[8] on 500k docs going from 2
        # waves to 8). Fine granularity is also what a 1000-executor
        # cluster wants — task count should track total cores, not the
        # shuffle-partition config, which sizes aggregation state.
        num_partitions = spark.sparkContext.defaultParallelism * 8
    cols = ["url", "html"] + (["host"] if "host" in webdocs.columns else [])
    slim = webdocs.select(*cols)
    if num_partitions == 0:
        pass  # scan-parallel: keep the source's own splits
    elif salt and "host" in slim.columns:
        slim = salted_repartition(slim, num_partitions, salt_map=salt_map)
    else:
        slim = slim.repartition(num_partitions, F.col("url"))
    # Columnar Arrow path by default (no pandas row materialization);
    # the pandas twin (extract_batch) remains the reference
    # implementation and fallback. Decoded-item structs (font / encoded
    # hex / instance index per text op) cost ~20% extra serialization,
    # so they are opt-in (emit_items) — the items column is always in
    # the schema, empty when disabled.
    from functools import partial

    # resolve the payload cap ON THE DRIVER so the env-var override
    # rides the closure to every executor (workers don't inherit the
    # driver's environment on a real cluster)
    max_bytes = _resolve_max_payload(max_payload_bytes)
    try:
        return slim.mapInArrow(
            partial(
                extract_batch_arrow,
                emit_items=emit_items,
                multibyte=multibyte,
                max_payload_bytes=max_bytes,
            ),
            schema=PARSED_SCHEMA,
        )
    except AttributeError:  # very old Spark: no mapInArrow
        return slim.mapInPandas(
            partial(
                extract_batch,
                emit_items=emit_items,
                multibyte=multibyte,
                max_payload_bytes=max_bytes,
            ),
            schema=PARSED_SCHEMA,
        )


def extracted_view(parsed: DataFrame) -> DataFrame:
    """extracted(url, text, ...) — prunes the spans/items arrays away."""
    return parsed.select(
        "url", "kind", "text", "n_pages", "n_items", "error"
    )


def spans_view(parsed: DataFrame) -> DataFrame:
    """spans(url, page_no, seq, text, x, y, font, size, width) exploded."""
    return parsed.select(
        "url", F.explode("spans").alias("s")
    ).select("url", "s.*")


def items_view(parsed: DataFrame) -> DataFrame:
    """Decoded text items exploded — the reference's per-element result
    dicts (api.py:189-195) as a relation: (url, seq, page_no, font,
    text, encoded_hex, instance_index). ``seq`` is the per-document
    content-stream ordinal; ``instance_index`` is the kernel's running
    per-distinct-text count (A1/F4), exposed so SQL can re-derive and
    verify it."""
    return parsed.select(
        "url", F.explode("items").alias("i")
    ).select("url", "i.*")


HOST_FROM_URL = r"^[a-z]+://([^/]+)/"


def audit_by_host(parsed: DataFrame) -> DataFrame:
    """Deterministic audit rollup keyed on host (derived from url) —
    the oracle-checkable twin of :func:`audit_view` (which keys on the
    runtime partition id for lineage)."""
    return (
        parsed.withColumn("host", F.regexp_extract("url", HOST_FROM_URL, 1))
        .groupBy("host")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum(F.when(F.col("error").isNotNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("n_failures"),
            F.sum("n_spans").cast("bigint").alias("n_spans"),
            F.sum("n_items").cast("bigint").alias("n_items"),
            F.sum("fallback_pages").cast("bigint").alias("n_fallback_pages"),
        )
    )


def clean_spans_view(parsed: DataFrame) -> DataFrame:
    """Span records after the reference's geometry hygiene filters:

    - F2 ghost-rect filter (pdf_gui.py:743-745,867-869): drop spans
      with width < 1 or height < 1, or an origin at (0,0);
    - F3 rect dedup at 0.1 pt (pdf_gui.py:737-747): one span per
      rounded (x, y) position per url/page.

    Pure narrow operations — the dedup is a dropDuplicates on rounded
    keys, which Spark executes as a hash aggregate (map-side combined).
    """
    sp = spans_view(parsed)
    ghost = (
        (F.col("width") < 1)
        | (F.col("size") < 1)
        | ((F.col("x") < 1) & (F.col("y") < 1))
    )
    return (
        sp.where(~ghost)
        .withColumn("_rx", F.round("x", 1))
        .withColumn("_ry", F.round("y", 1))
        .dropDuplicates(["url", "page_no", "_rx", "_ry"])
        .drop("_rx", "_ry")
    )


def audit_view(parsed: DataFrame) -> DataFrame:
    """Per-partition lineage + metrics (north rule): docs, failures,
    bytes, wall parse time, docs/sec."""
    return parsed.groupBy("partition_id").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.when(F.col("error").isNotNull(), 1).otherwise(0)).alias("n_failures"),
        F.sum("payload_bytes").alias("bytes_in"),
        F.sum("n_spans").alias("n_spans"),
        F.sum("fallback_pages").alias("n_fallback_pages"),
        F.sum("parse_ms").alias("parse_ms_total"),
        (F.count("*") / (F.sum("parse_ms") / 1000.0)).alias("docs_per_sec"),
    )


def run_extraction(
    spark: SparkSession,
    webdocs: DataFrame,
    output_dir: str | None = None,
    salt: bool = True,
) -> dict[str, DataFrame]:
    """Full pipeline. With output_dir, materializes parsed→parquet once
    and derives the three views from the written table (single parse,
    columnar pruning on re-read); without, derives views lazily."""
    parsed = parse_webdocs(webdocs, salt=salt, emit_items=True)
    if output_dir:
        parsed.write.mode("overwrite").parquet(f"{output_dir}/parsed")
        parsed = spark.read.parquet(f"{output_dir}/parsed")
    return {
        "parsed": parsed,
        "extracted": extracted_view(parsed),
        "spans": spans_view(parsed),
        "audit": audit_view(parsed),
    }
