"""URL canonicalization: Spark expression chain vs the independent
pure-Python twin, plus anchor-text extraction."""

import pytest

from pyspark.sql import functions as F

from pdf_parser_spark.functions import linkgraph
from pdf_parser_spark.functions.urlnorm import (
    canonicalize_url,
    canonicalize_url_py,
)
from pdf_parser_spark.htmlcore.gen import related_targets, text_to_html

CASES = [
    "HTTPS://Example.COM:443/a/b/?utm_source=x&b=2&a=1#frag",
    "http://EXAMPLE.com:80/",
    "http://example.com:8080/path//",
    "https://site.org/doc/5?z=1&fbclid=abc&gclid=&utm_campaign",
    "https://site.org",
    "https://site.org?b=1&a=2",
    "ftp://Weird.Host:21/x",  # non-http scheme: rules still apply
    "relative/path?a=1",  # no scheme: passes through untouched
    "https://h.io/p?&&a=1",  # empty params dropped
    "http://h.io/p?utm_x",  # tracking-only query → no '?'
    "https://h.io:443/x?utm_a=1&utm_b=2&c=3#f",
]


def test_spark_matches_python_twin(spark):
    df = spark.createDataFrame([(c,) for c in CASES], "u string")
    got = [
        r["c"] for r in df.select(canonicalize_url("u").alias("c")).collect()
    ]
    assert got == [canonicalize_url_py(c) for c in CASES]


@pytest.mark.parametrize(
    "raw,want",
    [
        ("HTTPS://A.B:443/p/?utm_source=x&b=2&a=1#f", "https://a.b/p?a=1&b=2"),
        ("http://a.b:80/", "http://a.b/"),
        ("https://a.b:80/x", "https://a.b:80/x"),  # 80 not default for https
        ("no-scheme", "no-scheme"),
    ],
)
def test_python_twin_rules(raw, want):
    assert canonicalize_url_py(raw) == want


def test_canonical_idempotent():
    for c in CASES:
        once = canonicalize_url_py(c)
        assert canonicalize_url_py(once) == once, c


def test_canonicalize_is_pure_projection(spark):
    # no UDF, no shuffle: plan is scan → project only
    df = spark.createDataFrame([(c,) for c in CASES], "u string")
    explained = (
        df.select(canonicalize_url("u").alias("c"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in explained
    assert "BatchEvalPython" not in explained and "ArrowEval" not in explained


def test_extract_anchors_pairs_link_with_label(spark):
    doc_id = 999
    page = text_to_html("alpha\nbeta", doc_id=doc_id)
    df = spark.createDataFrame(
        [("https://s.example/doc/999", bytearray(page, "utf-8"))],
        "url string, html binary",
    )
    rows = sorted(
        (r["outlink"], r["anchor"])
        for r in linkgraph.extract_anchors(df).collect()
    )
    targets = related_targets(doc_id)
    assert [a for _, a in rows] == sorted(f"Partner {t}" for t in targets)
    # anchor label matches ITS OWN link's target id (positional zip
    # correctness — a misalignment would pair label i with link j)
    for outlink, anchor in rows:
        assert anchor == "Partner " + outlink.rsplit("/", 1)[1]


def test_anchor_text_for_targets_counts_refs(spark):
    rows = [
        ("u1", "https://t.example/doc/5", "Five"),
        ("u2", "https://t.example/doc/5", "Five"),
        ("u3", "https://t.example/doc/5", "cinco"),
    ]
    got = {
        (r["target_url"], r["anchor"]): r["n_refs"]
        for r in linkgraph.anchor_text_for_targets(
            spark.createDataFrame(rows, "url string, outlink string, anchor string")
        ).collect()
    }
    assert got == {
        ("https://t.example/doc/5", "Five"): 2,
        ("https://t.example/doc/5", "cinco"): 1,
    }
