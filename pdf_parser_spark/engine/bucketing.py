"""Bucketed tables for shuffle-free co-located joins.

At 100 TB the dominant cost of a key-key join is the shuffle of both
sides. Writing each side bucketed on the join key (same bucket count,
hash-partitioned files + sorted within buckets) lets Spark plan the
join as a zip of corresponding buckets: `.explain` shows a
SortMergeJoin whose children have NO ShuffleExchange — each task reads
bucket i of both tables. This is the parquet/Hive-bucketing analog of
Iceberg's bucket partition transform; on a real cluster the same
DataFrame code targets an Iceberg `bucket(N, key)` table unchanged.

Bucketed writes go through the session catalog (`saveAsTable` — plain
`parquet(path)` cannot record bucket metadata, so a path write silently
loses the co-location guarantee; this module refuses to guess and
always uses the catalog).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str | list[str],
    buckets: int = 32,
    sort: bool = True,
    mode: str = "overwrite",
    path: str | None = None,
) -> None:
    """Persist ``df`` hash-bucketed (and by default sorted) on ``key``.

    Sorting within buckets lets the later SortMergeJoin skip its sort
    too (plan shows neither Exchange nor Sort on the scan side). With
    ``path`` the table is external (data at ``path``, bucket metadata
    in the catalog); without it, data lands in the warehouse dir."""
    keys = [key] if isinstance(key, str) else list(key)
    w = df.write.format("parquet").mode(mode).bucketBy(buckets, *keys)
    if sort:
        w = w.sortBy(*keys)
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)


def cogrouped_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: str | list[str],
    how: str = "inner",
) -> DataFrame:
    """Join two same-bucketed catalog tables on their bucket key.

    With matching bucket counts Spark plans this without shuffling
    either side; ``tests/test_plan_contracts.py`` pins the
    no-Exchange property so a regression (mismatched bucket counts,
    bucketing disabled, a projection that drops the bucket column)
    fails CI instead of silently reintroducing a corpus-wide shuffle.
    """
    on_keys = [on] if isinstance(on, str) else list(on)
    return spark.table(left_table).join(
        spark.table(right_table), on_keys, how
    )
