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

    The global ordinal is assigned zipWithIndex-style: range-partition
    by the first-appearance key (a global sort that scales out), then
    per-partition ``row_number`` plus a broadcast map of cumulative
    partition offsets. No unpartitioned window — an
    ``Window.orderBy`` with no partitionBy funnels every row through a
    single task, which is a scale-killer at corpus size.
    """
    agg = spans.groupBy("text").agg(
        F.sort_array(
            F.collect_list(
                F.struct("url", "page_no", "seq", "x", "y", "font", "size")
            )
        ).alias("details"),
        F.min(F.struct("url", "page_no", "seq")).alias("_first"),
    )
    spark = spans.sparkSession
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    # localCheckpoint pins the ranged partitioning before the plan
    # branches: both the local-ordinal branch and the counts branch must
    # see IDENTICAL _pid assignments — relying on exchange reuse is
    # fragile (a re-evaluated exchange could re-range independently and
    # produce wrong/duplicate ordinals)
    ranged = (
        agg.repartitionByRange(n_part, "_first")
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=False)
    )
    # per-partition local ordinal (partitions are small and ordered
    # among themselves by the range partitioner)
    w_local = Window.partitionBy("_pid").orderBy("_first")
    local = ranged.withColumn("_rn", F.row_number().over(w_local))
    # cumulative offset per partition id: tiny aggregate (one row per
    # partition), safe to window un-partitioned and broadcast back
    counts = local.groupBy("_pid").agg(F.count("*").alias("_cnt"))
    w_off = Window.orderBy("_pid").rowsBetween(
        Window.unboundedPreceding, Window.currentRow - 1
    )
    offsets = counts.withColumn(
        "_off", F.coalesce(F.sum("_cnt").over(w_off), F.lit(0))
    ).select("_pid", "_off")
    return (
        local.join(F.broadcast(offsets), "_pid")
        .withColumn("global_index", (F.col("_off") + F.col("_rn") - 1).cast("int"))
        .drop("_first", "_pid", "_rn", "_off")
    )


def write_hierarchical_json(spans: DataFrame, path: str) -> None:
    hierarchical_json(spans).write.mode("overwrite").json(path)


def write_audit(audit: DataFrame, path: str) -> None:
    """Append-mode audit sink: one parquet row group per run, the
    engine's replacement for the reference's replace_log.txt."""
    audit.withColumn("logged_at", F.current_timestamp()).write.mode(
        "append"
    ).parquet(path)
