"""Headline benchmark — the driver runs this per-round.

Runs the engine's headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE
JSON line: {"metric", "value" (total sec), "unit", "queries" (per-query
sec), "sf", plus docs/sec for the flagship extraction}.

Every query is forced end-to-end with the noop sink (full computation,
no driver collect bottleneck).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "flagship_extract",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "ann_topk_bruteforce",
    "token_count",
    "pricing_summary",
    "containment_anti_join",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else -1.0

    from pdf_parser_spark.engine.session import build_session
    from pdf_parser_spark.queries import QUERIES

    spark = build_session("bench")
    spark.sparkContext.setLogLevel("ERROR")

    # docs/sec for the flagship (BASELINE.md headline metric)
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()

    per_query: dict[str, float] = {}
    for name in HEADLINE:
        df = QUERIES[name](spark, sf_dir)
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        per_query[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(per_query.values()), 3)
    out = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": per_query,
        "sf": sf,
        "docs_per_sec_extraction": round(
            n_docs / per_query["flagship_extract"], 2
        ),
        "n_docs": n_docs,
    }
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
