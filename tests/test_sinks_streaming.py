"""JSON sink (K1) and Structured Streaming ingest."""

import json
import time

import pytest

from pyspark.sql import functions as F

from pdf_parser_spark.engine.corpus import synthesize_webdocs
from pdf_parser_spark.engine.extractor import parse_webdocs, spans_view
from pdf_parser_spark.engine.sinks import hierarchical_json, write_hierarchical_json
from pdf_parser_spark.streaming.ingest import (
    extracted_stream_view,
    streaming_extract,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def webdocs(spark):
    return synthesize_webdocs(spark, SF_DIR).cache()


def test_hierarchical_json_shape(spark, webdocs):
    spans = spans_view(
        parse_webdocs(webdocs.where(F.col("doc_id") % 2 == 0).limit(20))
    )
    h = hierarchical_json(spans)
    rows = h.collect()
    assert len(rows) == spans.select("text").distinct().count()
    idxs = sorted(r["global_index"] for r in rows)
    assert idxs == list(range(len(rows)))
    r0 = next(r for r in rows if len(r["details"]) >= 1)
    d = r0["details"][0]
    assert set(d.asDict()) == {"url", "page_no", "seq", "x", "y", "font", "size"}


def test_write_hierarchical_json(spark, webdocs, tmp_path):
    spans = spans_view(
        parse_webdocs(webdocs.where(F.col("doc_id") % 2 == 0).limit(10))
    )
    out = str(tmp_path / "json_out")
    write_hierarchical_json(spans, out)
    lines = []
    for f in (tmp_path / "json_out").glob("*.json"):
        lines += [json.loads(l) for l in f.read_text().splitlines()]
    assert lines and all("text" in r and "details" in r for r in lines)


def test_streaming_extract_drains_and_resumes(spark, webdocs, tmp_path):
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    first = webdocs.where(F.col("doc_id") < 100)
    first.write.mode("overwrite").parquet(src)

    q = streaming_extract(spark, src, out, ckpt, available_now=True)
    q.awaitTermination(120)
    n1 = extracted_stream_view(spark, out).count()
    assert n1 == first.count()

    # drop MORE files into the source dir; a new availableNow run picks
    # up only the delta (checkpoint-driven exactly-once)
    second = webdocs.where((F.col("doc_id") >= 100) & (F.col("doc_id") < 150))
    second.write.mode("append").parquet(src)
    q2 = streaming_extract(spark, src, out, ckpt, available_now=True)
    q2.awaitTermination(120)
    view = extracted_stream_view(spark, out)
    assert view.count() == first.count() + second.count()
    assert view.select("url").distinct().count() == view.count()
    # extraction semantics identical to batch
    assert view.where(F.col("text") == "").count() == 0
