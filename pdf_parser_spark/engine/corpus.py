"""Deterministic synthetic web corpus (input_hint table shape).

Builds the ``webdocs(url STRING, warc_ts TIMESTAMP, html BINARY,
text STRING, lang STRING)`` table the north rule mandates, from the
driver's ``documents`` parquet — distributed (mapInPandas), seedless-
deterministic (everything derives from doc_id), and skewed on purpose:

- payload type alternates by doc_id parity: even → PDF bytes
  (pdfgen.text_to_pdf, xref variant cycles by doc_id % 3), odd → HTML
  page with boilerplate (htmlcore.gen.text_to_html);
- 40% of documents land on one hot host (``heavy.example.org``) so the
  host-salting path has real skew to handle; the rest spread over 97
  hosts.

``expected_extracted`` (and its SQL twin EXPECTED_SQL_EXPR) gives the
byte-exact text the extraction engine must produce per url — the
DuckDB oracle for the flagship query.
"""

from __future__ import annotations

from collections.abc import Iterator
from datetime import datetime, timedelta, timezone

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..htmlcore.gen import expected_text_from_html_source, text_to_html
from ..pdfgen.writer import expected_text_from_source, text_to_pdf

WEBDOCS_SCHEMA = (
    "doc_id BIGINT, url STRING, host STRING, warc_ts TIMESTAMP, "
    "html BINARY, text STRING, lang STRING"
)

_EPOCH = datetime(2024, 1, 1, tzinfo=timezone.utc)
_PDF_VARIANTS = [("classic", False), ("xrefstream", False), ("xrefstream", True)]
HOT_HOST = "heavy.example.org"


def host_for(doc_id: int) -> str:
    return HOT_HOST if doc_id % 10 < 4 else f"site-{doc_id % 97}.example.com"


# Source texts are single-line; wrap them into WRAP-token lines so the
# PDFs exercise multi-line content streams (one Tj + Td per line, real
# span sequences/geometry) and HTML pages get one <p> per line.
WRAP = 12


def wrap_lines(text: str) -> list[str]:
    toks = [t for part in text.split("\n") for t in part.split(" ") if t]
    return [" ".join(toks[i : i + WRAP]) for i in range(0, len(toks), WRAP)]


def wrap_text(text: str) -> str:
    return "\n".join(wrap_lines(text))


def payload_for(doc_id: int, text: str, lang: str) -> bytes:
    wrapped = wrap_text(text)
    if doc_id % 2 == 0:
        variant, objstm = _PDF_VARIANTS[(doc_id // 2) % 3]
        return text_to_pdf(wrapped, variant=variant, use_objstm=objstm)
    return text_to_html(wrapped, lang=lang, doc_id=doc_id).encode("utf-8")


def expected_extracted(doc_id: int, text: str) -> str:
    """Ground-truth extracted text per document (matches EXPECTED_SQL_EXPR)."""
    wrapped = wrap_text(text)
    if doc_id % 2 == 0:
        return expected_text_from_source(wrapped)
    return expected_text_from_html_source(wrapped)


# DuckDB-SQL twins. CHUNKS_SQL reproduces wrap_lines over a `text`
# column (tokens grouped WRAP at a time, space-joined); the branch
# transforms mirror expected_text_from_source (non-ASCII → '?', trim,
# drop-empty) and expected_text_from_html_source (whitespace collapse).
_TOKS_SQL = (
    "list_filter(string_split(replace(text, chr(10), ' '), ' '), x -> x <> '')"
)
CHUNKS_SQL = (
    f"list_transform(range(1, cast(ceil(len({_TOKS_SQL}) / {WRAP}.0) as int) + 1), "
    f"i -> array_to_string(({_TOKS_SQL})[(i - 1) * {WRAP} + 1 : i * {WRAP}], ' '))"
)
PDF_LINES_SQL = (
    f"list_filter(list_transform({CHUNKS_SQL}, "
    "x -> trim(regexp_replace(x, '[^ -~]', '?', 'g'))), x -> x <> '')"
)
_HTML_LINES_SQL = (
    f"list_filter(list_transform({CHUNKS_SQL}, "
    r"x -> trim(regexp_replace(x, '[ \t\r\f\v]+', ' ', 'g'))), x -> x <> '')"
)
EXPECTED_SQL_EXPR = (
    "CASE WHEN doc_id % 2 = 0 THEN "
    f"array_to_string({PDF_LINES_SQL}, chr(10)) "
    f"ELSE array_to_string({_HTML_LINES_SQL}, chr(10)) END"
)


HOST_SQL = (
    "CASE WHEN doc_id % 10 < 4 THEN 'heavy.example.org' "
    "ELSE concat('site-', cast(doc_id % 97 as string), '.example.com') END"
)


def webdocs_salt_map(spark: SparkSession, sf_dir: str) -> dict[str, int]:
    """Host→bucket salt map from the *source* table's id column only —
    the cheap pruned pre-pass (never touches payload synthesis/parse).
    Mirrors host_for(); usable when the webdocs frame is UDF-generated
    and a groupBy on it would re-run the generator (see parse_webdocs).
    """
    from .partitioning import compute_salt_map

    hosts = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select(F.expr(HOST_SQL).alias("host"))
    )
    return compute_salt_map(hosts)


def synthesize_pdf_variant(
    spark: SparkSession,
    sf_dir: str,
    lines_per_page: int = 48,
    fontless: bool = False,
    repeat_first: int = 0,
) -> DataFrame:
    """PDF-only corpus variant: every source document (even doc_id, the
    PDF half — keeping doc_id parity identical to synthesize_webdocs)
    rendered with a controllable page size and optionally without font
    resources.

    - ``lines_per_page`` < 48 yields multi-page PDFs even for short
      docs, so cross-page span geometry (same (x, y) on different
      pages) actually occurs — needed to exercise containment drops on
      real spans.
    - ``fontless=True`` omits font resources so the content stream
      never decodes and the degraded literal-sweep fallback runs.
    - ``repeat_first=k`` appends the document's first k lines again at
      the end, so every document genuinely contains repeated text and
      the instance-index/instance-selector operators are exercised
      non-vacuously (the base corpus has no duplicate lines). SQL twin:
      ``list_concat(flines, flines[1:k])`` — safe because the
      chunk→line transform is per-element, order-preserving, and never
      produces an empty line from a non-empty chunk.
    """
    from ..pdfgen.writer import make_text_pdf

    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .where(F.col("doc_id") % 2 == 0)
        .select("doc_id", "text")
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["doc_id"].astype("int64")
            texts = pdf["text"].fillna("")
            hosts = [host_for(int(i)) for i in ids]
            payloads = []
            for t in texts:
                lines = wrap_lines(t) or [""]
                if repeat_first:
                    lines = lines + lines[:repeat_first]
                pages = [
                    lines[i : i + lines_per_page]
                    for i in range(0, len(lines), lines_per_page)
                ]
                payloads.append(make_text_pdf(pages, fontless=fontless))
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "url": [
                        f"https://{h}/doc/{int(i)}" for h, i in zip(hosts, ids)
                    ],
                    "host": hosts,
                    "html": payloads,
                }
            )

    return docs.mapInPandas(
        gen, schema="doc_id BIGINT, url STRING, host STRING, html BINARY"
    )


def synthesize_encrypted_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PDF-only corpus variant, encrypted with EMPTY passwords (the
    common crawl case): the writer's standard-security path enciphers
    every stream/string per object. Cycles the full supported handler
    matrix by doc_id — R3 (RC4-128), R2 (RC4-40), R4 (/AESV2 crypt
    filter, AES-128-CBC), R6 (/AESV3, AES-256, ISO 32000-2 hardened
    hash) — and classic AND xref-stream storage layouts. Extraction
    must equal the plain PDF half byte-exactly — the kernel decrypts
    transparently (pdfcore/crypt.py)."""
    from ..pdfgen.writer import make_text_pdf

    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .where(F.col("doc_id") % 2 == 0)
        .select("doc_id", "text")
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["doc_id"].astype("int64")
            texts = pdf["text"].fillna("")
            hosts = [host_for(int(i)) for i in ids]
            payloads = []
            for i, t in zip(ids, texts):
                lines = wrap_lines(t) or [""]
                pages = [lines[j : j + 48] for j in range(0, len(lines), 48)]
                variant, objstm = _PDF_VARIANTS[(int(i) // 2) % 3]
                payloads.append(
                    make_text_pdf(
                        pages,
                        variant=variant,
                        use_objstm=objstm,
                        encrypted=True,
                        encrypt_revision=[3, 2, 4, 6][(int(i) // 2) % 4],
                    )
                )
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "url": [
                        f"https://{h}/doc/{int(i)}" for h, i in zip(hosts, ids)
                    ],
                    "host": hosts,
                    "html": payloads,
                }
            )

    return docs.mapInPandas(
        gen, schema="doc_id BIGINT, url STRING, host STRING, html BINARY"
    )


def synthesize_cid_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PDF-only corpus variant with 2-byte CID-style encoding: every
    character rendered as its UTF-16BE code unit with an explicit
    codespacerange ToUnicode CMap (pdfgen.make_cid_text_pdf). Only the
    kernel's multibyte extension decodes it back to the source text —
    the corpus-scale exercise of SURVEY §2.2 T7's CID flag."""
    from ..pdfgen.writer import make_cid_text_pdf

    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .where(F.col("doc_id") % 2 == 0)
        .select("doc_id", "text")
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["doc_id"].astype("int64")
            texts = pdf["text"].fillna("")
            hosts = [host_for(int(i)) for i in ids]
            payloads = []
            for t in texts:
                lines = wrap_lines(t) or [""]
                pages = [lines[i : i + 48] for i in range(0, len(lines), 48)]
                payloads.append(make_cid_text_pdf(pages))
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "url": [
                        f"https://{h}/doc/{int(i)}" for h, i in zip(hosts, ids)
                    ],
                    "host": hosts,
                    "html": payloads,
                }
            )

    return docs.mapInPandas(
        gen, schema="doc_id BIGINT, url STRING, host STRING, html BINARY"
    )


def synthesize_webdocs(
    spark: SparkSession, sf_dir: str, replicate: int = 1
) -> DataFrame:
    """documents.parquet → webdocs DataFrame (distributed synthesis).

    replicate > 1 clones each source doc with distinct urls/doc_ids —
    used by the bench to scale the corpus without new inputs. Synthesis
    runs inside mapInPandas so it parallelizes like the real ingest.
    Replicas render their OWN payload bytes (keyed to the clone id):
    byte-identical adjacent payloads were tried and reverted — they
    saved no measurable synthesis time (render isn't the cost) but
    compressed the corpus parquet ~50×, which makes the scan/IO side
    of benchmark runs unrealistically cheap vs a real crawl corpus.
    """
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text", "lang"
    )
    n_rep = max(1, int(replicate))
    if n_rep > 1:
        docs = docs.withColumn(
            "rep", F.explode(F.sequence(F.lit(0), F.lit(n_rep - 1)))
        )
        # Spread replicated synthesis across the cluster: the source
        # table is tiny (usually ONE scan split), so without this the
        # generator — and any parquet written from it — runs as a
        # single task producing a single file, which then serializes
        # every downstream scan and the map side of the first shuffle.
        # A real crawl corpus is many files; this makes the scaled
        # synthetic one shaped like it. The shuffle moves only
        # (doc_id, text, lang, rep) rows — payload bytes don't exist
        # yet, which is the point of repartitioning BEFORE gen.
        # replicate=1 (the per-query path) stays Exchange-free so the
        # 100+ oracle plans keep their pinned shuffle counts.
        docs = docs.repartition(spark.sparkContext.defaultParallelism * 4)
    else:
        docs = docs.withColumn("rep", F.lit(0))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = (pdf["doc_id"] * n_rep + pdf["rep"]).astype("int64")
            texts = pdf["text"].fillna("")
            langs = pdf["lang"].fillna("en")
            hosts = [host_for(int(i)) for i in ids]
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "url": [
                        f"https://{h}/doc/{int(i)}" for h, i in zip(hosts, ids)
                    ],
                    "host": hosts,
                    "warc_ts": [
                        _EPOCH + timedelta(seconds=int(i) % 86400) for i in ids
                    ],
                    "html": [
                        payload_for(int(i), t, l)
                        for i, t, l in zip(ids, texts, langs)
                    ],
                    "text": texts.values,
                    "lang": langs.values,
                }
            )

    return docs.mapInPandas(gen, schema=WEBDOCS_SCHEMA)
