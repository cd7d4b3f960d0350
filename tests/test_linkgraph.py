"""Link-graph operators: outlink extraction from raw payloads, host
edge aggregation, and the integer PageRank (Spark vs pure-Python twin,
bit-exact)."""

from pyspark.sql import functions as F

from pdf_parser_spark.functions import linkgraph
from pdf_parser_spark.htmlcore.gen import related_links, text_to_html

# tiny graph with a hub, a cycle, and a dangling node (sink only)
EDGES = [
    ("a.example", "b.example", 3),
    ("a.example", "c.example", 1),
    ("b.example", "a.example", 2),
    ("b.example", "d.example", 1),
    ("c.example", "a.example", 5),
    # d.example has no outgoing edges → dangling mass path exercised
]


def test_reference_pagerank_mass_nearly_conserved():
    r = linkgraph.pagerank_reference(EDGES, iters=4)
    total = sum(r.values())
    # truncating division leaks < 100 units per node per iteration
    assert abs(total - linkgraph.PR_TOTAL) < 4 * 100 * len(r) * 4
    # the hub receiving weight-5 and weight-2 inflows outranks the sink
    assert r["a.example"] > r["d.example"]


def test_spark_pagerank_matches_reference_twin_exactly(spark):
    edges = spark.createDataFrame(
        EDGES, "src_host string, dst_host string, w long"
    )
    got = {
        row["host"]: row["pr"]
        for row in linkgraph.pagerank(edges, iters=4).collect()
    }
    assert got == linkgraph.pagerank_reference(EDGES, iters=4)


def test_spark_pagerank_single_iteration_also_exact(spark):
    edges = spark.createDataFrame(
        EDGES, "src_host string, dst_host string, w long"
    )
    got = {
        row["host"]: row["pr"]
        for row in linkgraph.pagerank(edges, iters=1).collect()
    }
    assert got == linkgraph.pagerank_reference(EDGES, iters=1)


def test_extract_outlinks_recovers_exactly_the_partner_links(spark):
    doc_id = 4217
    page = text_to_html("alpha beta\ngamma", lang="en", doc_id=doc_id)
    df = spark.createDataFrame(
        [(f"https://x.example/doc/{doc_id}", bytearray(page, "utf-8"))],
        "url string, html binary",
    )
    out = [
        r["outlink"]
        for r in linkgraph.extract_outlinks(df)
        .orderBy("outlink")
        .collect()
    ]
    assert out == sorted(related_links(doc_id))
    # every partner link is cross-document: 3 distinct target ids
    assert len({u.rsplit("/", 1)[1] for u in out}) == 3


def test_extract_outlinks_skips_pdf_payloads(spark):
    df = spark.createDataFrame(
        [("https://x.example/doc/2", bytearray(b"%PDF-1.4 fake"))],
        "url string, html binary",
    )
    assert linkgraph.extract_outlinks(df).count() == 0


def test_host_edges_aggregates_weights(spark):
    rows = [
        ("https://h1.example/doc/1", "https://h2.example/doc/9"),
        ("https://h1.example/doc/3", "https://h2.example/doc/11"),
        ("https://h1.example/doc/3", "https://h3.example/doc/12"),
    ]
    edges = {
        (r["src_host"], r["dst_host"]): r["w"]
        for r in linkgraph.host_edges(
            spark.createDataFrame(rows, "url string, outlink string")
        ).collect()
    }
    assert edges == {
        ("h1.example", "h2.example"): 2,
        ("h1.example", "h3.example"): 1,
    }


def test_escaped_body_text_cannot_inject_outlinks(spark):
    # hostile source text containing a literal absolute href — the
    # generator html-escapes body text, so extraction must only see
    # the 3 footer partner links
    evil = 'see <a href="https://evil.example/x">here</a>'
    page = text_to_html(evil, lang="en", doc_id=7)
    df = spark.createDataFrame(
        [("https://x.example/doc/7", bytearray(page, "utf-8"))],
        "url string, html binary",
    )
    out = [r["outlink"] for r in linkgraph.extract_outlinks(df).collect()]
    assert sorted(out) == sorted(related_links(7))
    assert not any("evil" in u for u in out)
