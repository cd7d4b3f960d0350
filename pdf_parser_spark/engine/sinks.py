"""Output sinks mirroring the reference's K1/K3 surfaces (SURVEY.md §2.1).

- ``write_hierarchical_json``: the reference's grouped JSON output
  (``{text: [detail, …]}`` — example.py:204-240, README.md:289-329)
  reframed relationally: groupBy(text) → collect_list(struct) →
  to_json, written as one JSON document per distinct text. Global
  ordinal via a rank window (the reference's global index).
- ``write_audit``: the replace_log.txt analog (replacer.py:834-839) as
  a queryable parquet audit table instead of an append-only text file.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def hierarchical_json(spans: DataFrame) -> DataFrame:
    """spans → one row per distinct text: (text, global_index, details).

    ``details`` is the array of per-occurrence structs in document
    order; ``global_index`` ranks texts by first appearance (url, page,
    seq) — the reference's enumeration order (example.py:286-304).
    """
    agg = spans.groupBy("text").agg(
        F.sort_array(
            F.collect_list(
                F.struct("url", "page_no", "seq", "x", "y", "font", "size")
            )
        ).alias("details"),
        F.min(F.struct("url", "page_no", "seq")).alias("_first"),
    )
    w = Window.orderBy("_first")
    return agg.withColumn("global_index", F.row_number().over(w) - 1).drop(
        "_first"
    )


def write_hierarchical_json(spans: DataFrame, path: str) -> None:
    hierarchical_json(spans).write.mode("overwrite").json(path)


def write_audit(audit: DataFrame, path: str) -> None:
    """Append-mode audit sink: one parquet row group per run, the
    engine's replacement for the reference's replace_log.txt."""
    audit.withColumn("logged_at", F.current_timestamp()).write.mode(
        "append"
    ).parquet(path)
