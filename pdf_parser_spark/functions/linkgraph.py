"""Web link-graph operators: outlink extraction, host-level edge
aggregation, and an oracle-exact integer PageRank.

Real Common-Crawl-scale pipelines compute a *host/domain-level* rank as
a quality prior (CCNet / RefinedWeb style): per-page outlinks are
extracted from the raw payload, collapsed to a weighted host→host edge
list (one shuffle, map-side combined — 10^12 pages fold into ~10^8
host pairs), and PageRank iterates over that much smaller graph.

The rank arithmetic here is **pure int64** — start mass 10^12 split
evenly, contributions ``(r * w) div W``, damping ``(15*base +
85*inflow) div 100`` — so every sum is order-independent and the
DuckDB oracle (an unrolled CTE per iteration, see queries.py
``host_pagerank``) matches bit-for-bit; no float folds cross the
engine boundary. At real scale the same plan runs with doubles; the
integer form exists so correctness is checkable to the last digit.

Reference analog: none — the reference repo (herryqg/pdf-parser) has
no link surface; this family comes from the training-data-pipeline
brief (web-graph quality priors).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# The only absolute hrefs the corpus generator emits are the footer
# partner links (htmlcore/gen.py related_links); relative boilerplate
# links (/about, /privacy, ...) never match.
HREF_RE = 'href="(https?://[^"]+)"'
HOST_FROM_LINK = "https?://([^/\"]+)"

PR_TOTAL = 10**12


def extract_outlinks(
    webdocs: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """(url, outlink) per absolute href in an HTML payload.

    Pure JVM path: magic-sniff dispatch, UTF-8 decode,
    ``regexp_extract_all`` + ``explode`` — no Python in the loop, the
    regex runs inside whole-stage codegen next to the scan.
    """
    html = webdocs.where(
        F.decode(F.substring(html_col, 1, 5), "UTF-8") != "%PDF-"
    )
    return html.select(
        F.col(url_col).alias("url"),
        F.explode(
            F.regexp_extract_all(
                F.decode(html_col, "UTF-8"), F.lit(HREF_RE), F.lit(1)
            )
        ).alias("outlink"),
    )


def host_edges(outlinks: DataFrame) -> DataFrame:
    """(src_host, dst_host, w) weighted host-graph edges from per-page
    outlinks. One hash shuffle with map-side partial counts; the edge
    table is the scale pinch-point reducer (pages → host pairs)."""
    return (
        outlinks.select(
            F.regexp_extract("url", HOST_FROM_LINK, 1).alias("src_host"),
            F.regexp_extract("outlink", HOST_FROM_LINK, 1).alias("dst_host"),
        )
        .groupBy("src_host", "dst_host")
        .agg(F.count(F.lit(1)).alias("w"))
    )


def pagerank(edges: DataFrame, iters: int = 4, total: int = PR_TOTAL) -> DataFrame:
    """(host, pr) integer PageRank over a weighted host edge list.

    Per iteration: one equi-join of ranks onto edges (shuffle on host),
    one map-side-combined sum per dst, a 1-row dangling-mass aggregate
    cross-joined back, and a left join onto the node universe — ranks
    localCheckpointed each round so lineage and plan size stay constant
    (same discipline as dedup.connected_components). Driver-side work
    is a single node count at construction.

    Damping 0.85 in integer form: r' = (15*base + 85*(inflow +
    dangling_share)) div 100 with base = total div n. All values are
    positive int64 (max ~total * max_w << 2^63), truncating division
    agrees between Spark ``div`` and DuckDB ``//`` on positives, and
    integer sums commute — which is what makes the unrolled-CTE oracle
    exact.
    """
    e = edges.select(
        F.col("src_host").alias("src"),
        F.col("dst_host").alias("dst"),
        F.col("w").cast("long").alias("w"),
    )
    outw = e.groupBy("src").agg(F.sum("w").alias("outw"))
    edges_n = e.join(outw, "src").localCheckpoint(eager=True)
    nodes = (
        e.select(F.col("src").alias("host"))
        .union(e.select(F.col("dst").alias("host")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = nodes.count()
    base = total // n
    ranks = nodes.withColumn("pr", F.lit(base).cast("long"))
    for _ in range(iters):
        inflow = (
            edges_n.join(
                ranks.withColumnRenamed("host", "src"), "src"
            )
            .groupBy(F.col("dst").alias("host"))
            .agg(F.sum(F.expr("(pr * w) div outw")).alias("inflow"))
        )
        dangling = (
            ranks.join(outw.withColumnRenamed("src", "host"), "host", "left_anti")
            .agg(F.coalesce(F.sum("pr"), F.lit(0)).cast("long").alias("dang"))
        )
        ranks = (
            nodes.join(inflow, "host", "left")
            .crossJoin(dangling)
            .select(
                "host",
                F.expr(
                    f"(15 * {base}L + 85 * (coalesce(inflow, 0L) + dang div {n}L))"
                    " div 100"
                ).alias("pr"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks


def pagerank_reference(
    edges: list[tuple[str, str, int]], iters: int = 4, total: int = PR_TOTAL
) -> dict[str, int]:
    """Pure-Python twin of :func:`pagerank` for unit tests."""
    outw: dict[str, int] = {}
    for s, _, w in edges:
        outw[s] = outw.get(s, 0) + w
    nodes = sorted({s for s, _, _ in edges} | {d for _, d, _ in edges})
    n = len(nodes)
    base = total // n
    r = {h: base for h in nodes}
    for _ in range(iters):
        inflow = {h: 0 for h in nodes}
        for s, d, w in edges:
            inflow[d] += (r[s] * w) // outw[s]
        dang = sum(r[h] for h in nodes if h not in outw)
        r = {
            h: (15 * base + 85 * (inflow[h] + dang // n)) // 100
            for h in nodes
        }
    return r


ANCHOR_RE = 'href="(https?://[^"]+)">([^<]*)<'


def extract_anchors(
    webdocs: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """(url, outlink, anchor) per absolute link — anchor text is the
    classic web-graph training signal (a human-written label for the
    TARGET page). Two regexp_extract_all passes over the same pattern
    zipped positionally, exploded once; all JVM-side."""
    html = webdocs.where(
        F.decode(F.substring(html_col, 1, 5), "UTF-8") != "%PDF-"
    )
    page = F.decode(F.col(html_col), "UTF-8")
    pair = F.explode(
        F.arrays_zip(
            F.regexp_extract_all(page, F.lit(ANCHOR_RE), F.lit(1)).alias(
                "outlink"
            ),
            F.regexp_extract_all(page, F.lit(ANCHOR_RE), F.lit(2)).alias(
                "anchor"
            ),
        )
    ).alias("p")
    return html.select(F.col(url_col).alias("url"), pair).select(
        "url", F.col("p.outlink").alias("outlink"), F.col("p.anchor").alias("anchor")
    )


def anchor_text_for_targets(anchors: DataFrame) -> DataFrame:
    """Aggregate anchor text BY TARGET url — the 'what the web calls
    this page' signal joined onto documents at training time. One hash
    shuffle keyed on the target; count carries the dominant-label
    weight."""
    return (
        anchors.groupBy(
            F.col("outlink").alias("target_url"),
            F.col("anchor").alias("anchor"),
        )
        .agg(F.count(F.lit(1)).alias("n_refs"))
    )
