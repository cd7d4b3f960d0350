"""Temporal join operators Spark's DataFrame API lacks as primitives:
as-of join, bounded range (interval) join, and multi-granularity
hypertable rollups.

These are the event-table shapes a crawl/refresh pipeline needs around
the extraction engine (fetch logs, error triage, time-bucketed
dashboards). Each is expressed so the physical plan stays the one
you'd want at 100 TB:

- ``asof_join``: the union-merge formulation — tag both sides, union,
  ONE shuffle on the join keys, sort within partitions by (ts, side),
  and carry the latest right payload forward with
  ``last(ignorenulls)``. No range cross-product, no per-left-row
  re-scan: cost is a single sort-shuffle of |L|+|R| rows regardless of
  time-range density (the classic log-merge as-of strategy, same shape
  kdb/QuestDB asof joins lower to).
- ``range_join``: equi-bucketized interval join. Timestamps quantize
  to buckets the width of the query window, the left side explodes
  exactly two candidate buckets (b-1, b), and the join runs as an
  EQUI-join on (keys, bucket) with the exact interval predicate left
  as a residual filter. Catalyst plans a hash join — never the
  BroadcastNestedLoop/cartesian a raw theta-join ``ON l.ts BETWEEN
  …`` degenerates to at scale.
- ``rollup_hypertable``: one-pass GROUPING SETS over multiple time
  granularities — a single shuffle produces every resolution
  (TimescaleDB continuous-aggregate shape), instead of one
  scan+shuffle per granularity that a UNION of GROUP BYs costs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _utc_micros(c: Column) -> Column:
    """Epoch micros of a TIMESTAMP_NTZ column; the UTC-pinned session
    makes the cast offset-free (and offsets cancel in differences)."""
    return F.unix_micros(c.cast("timestamp"))


def asof_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    payload: list[str] | None = None,
) -> DataFrame:
    """For every left row, the latest right row with
    ``right.ts <= left.ts`` on the same keys (as-of / point-in-time
    join). Returns the left frame plus one struct column ``asof``
    holding the matched right payload (null when no right row
    precedes).

    Plan: union-merge — both sides shuffle ONCE on ``keys``, sort by
    (ts, side) with right rows ordered before left at equal
    timestamps (<= semantics), and a running ``last(ignorenulls)``
    carries the most recent payload forward. Equal-timestamp right
    rows tie-break deterministically on the payload struct itself.
    """
    payload = payload or [c for c in right.columns if c not in keys]
    left_cols = [c for c in left.columns if c not in keys and c != left_ts]
    l_tag = left.select(
        *keys,
        F.col(left_ts).alias("_ts"),
        F.struct(*left_cols).alias("_l"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(
            right.select(F.struct(*payload).alias("x")).schema["x"].dataType
        ).alias("_p"),
    )
    r_tag = right.select(
        *keys,
        F.col(right_ts).alias("_ts"),
        F.lit(None).cast(
            left.select(F.struct(*left_cols).alias("x")).schema["x"].dataType
        ).alias("_l"),
        F.lit(0).alias("_side"),
        F.struct(*payload).alias("_p"),
    )
    w = (
        Window.partitionBy(*keys)
        .orderBy("_ts", "_side", "_p")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        l_tag.unionByName(r_tag)
        .withColumn("asof", F.last("_p", ignorenulls=True).over(w))
        .where(F.col("_side") == 1)
        .select(*keys, F.col("_ts").alias(left_ts), F.col("_l.*"), "asof")
    )


def range_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    window_s: int,
    left_ts: str = "ts",
    right_ts: str = "ts",
    how: str = "inner",
) -> DataFrame:
    """Interval join: pairs (l, r) sharing ``keys`` with
    ``l.ts - window_s <= r.ts < l.ts``. Right columns not in ``keys``
    come back under a struct column ``match``.

    Plan: both sides quantize timestamps to ``window_s``-wide buckets;
    any qualifying right row lands in the left row's bucket or the one
    before, so the left side explodes exactly those two candidates and
    the join is a hash EQUI-join on (keys, bucket) with the interval
    predicate as a residual — never a nested-loop theta join.

    ``how='left'`` keeps unmatched left rows with a null ``match`` —
    note each left row then appears once PER EMPTY CANDIDATE BUCKET
    (up to 2 null rows), so aggregate with null-skipping functions
    (count(match.x), sum) rather than counting rows. The left form
    exists so "join + aggregate per left row" pipelines need no second
    join back onto the left table (one shuffle fewer).
    """
    bucket_us = int(window_s) * 1_000_000
    r_cols = [c for c in right.columns if c not in keys]
    r_b = right.select(
        *keys,
        F.struct(*r_cols).alias("match"),
        _utc_micros(F.col(right_ts)).alias("_r_us"),
    ).withColumn("_b", F.expr(f"_r_us div {bucket_us}"))
    l_b = left.withColumn("_l_us", _utc_micros(F.col(left_ts))).withColumn(
        "_b",
        F.explode(
            F.array(
                F.expr(f"_l_us div {bucket_us}") - 1,
                F.expr(f"_l_us div {bucket_us}"),
            )
        ),
    )
    l_a, r_a = l_b.alias("_rj_l"), r_b.alias("_rj_r")
    cond = (
        (F.col("_rj_l._b") == F.col("_rj_r._b"))
        & (F.col("_rj_r._r_us") < F.col("_rj_l._l_us"))
        & (F.col("_rj_r._r_us") >= F.col("_rj_l._l_us") - F.lit(bucket_us))
    )
    for k in keys:
        cond = cond & (F.col(f"_rj_l.{k}") == F.col(f"_rj_r.{k}"))
    out_cols = [F.col(f"_rj_l.{c}") for c in left.columns]
    return l_a.join(r_a, cond, how).select(*out_cols, F.col("_rj_r.match"))


def rollup_hypertable(
    events: DataFrame,
    ts_col: str = "ts",
    dims: list[str] | None = None,
    value_col: str = "value",
) -> DataFrame:
    """Multi-granularity time rollup (day + hour) in ONE shuffle via
    GROUPING SETS — the TimescaleDB continuous-aggregate shape.
    Emits (granularity '1d'|'1h', bucket_start epoch-seconds,
    *dims, n_events, value_cents); cents (round(value·100) per row,
    summed as int64) keep the aggregate engine-exact.
    """
    dims = dims or []
    base = events.select(
        F.date_trunc("day", F.col(ts_col)).alias("_db"),
        F.date_trunc("hour", F.col(ts_col)).alias("_hb"),
        *dims,
        F.round(F.col(value_col) * 100).cast("bigint").alias("_cents"),
    )
    rolled = base.groupingSets(
        [["_db", *dims], ["_db", "_hb", *dims]],
        "_db",
        "_hb",
        *dims,
    ).agg(
        F.count("*").cast("bigint").alias("n_events"),
        F.sum("_cents").cast("bigint").alias("value_cents"),
    )
    return rolled.select(
        F.when(F.col("_hb").isNull(), F.lit("1d"))
        .otherwise(F.lit("1h"))
        .alias("granularity"),
        F.expr(
            "unix_micros(cast(coalesce(_hb, _db) as timestamp)) div 1000000"
        )
        .cast("bigint")
        .alias("bucket_start"),
        *dims,
        "n_events",
        "value_cents",
    )
