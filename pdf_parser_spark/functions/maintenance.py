"""Table-maintenance operators for a crawl corpus at Iceberg scale:
snapshot CDC diff, small-file compaction planning, Bloom-filter
prefiltered dedup.

These have no reference-repo counterpart (the reference is a
single-document tool); they are the operations a 10^12-row table needs
between ingest rounds:

- :func:`snapshot_diff` — what changed between two corpus snapshots
  (the input to incremental re-extraction and downstream invalidation);
- :func:`compaction_plan` — assign rows to target-size output files
  per partition key (the planning half of Iceberg's
  ``rewrite_data_files``), a partition-scoped window, never a global
  sort;
- :func:`bloom_words` / :func:`bloom_hit_expr` — a tiny deterministic
  Bloom filter (m bits as ``m/64`` int64 words, k md5-derived probes)
  built with one aggregate and applied as a literal map-only filter:
  the classic "drop 99% of non-duplicates before the exact join"
  prefilter. md5-based, so a SQL oracle reproduces it bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


# ------------------------------------------------------------- CDC diff


def snapshot_diff(
    base: DataFrame,
    new: DataFrame,
    key: str = "url",
    hash_col: str = "content_hash",
) -> DataFrame:
    """Row-level diff between two corpus snapshots.

    Full outer equi-join on *key* comparing *hash_col*; emits one row
    per key whose state changed: ``change ∈ {added, removed, changed}``
    (unchanged rows are filtered out before anything downstream runs).
    At scale this is one shuffle on the key for each side — the same
    plan an Iceberg changelog scan would feed, and both sides only
    carry (key, hash), never payloads.
    """
    b = base.select(F.col(key), F.col(hash_col).alias("_base_h"))
    n = new.select(F.col(key), F.col(hash_col).alias("_new_h"))
    joined = b.join(n, on=key, how="full_outer")
    change = (
        F.when(F.col("_base_h").isNull(), F.lit("added"))
        .when(F.col("_new_h").isNull(), F.lit("removed"))
        .when(F.col("_base_h") != F.col("_new_h"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return (
        joined.withColumn("change", change)
        .where(F.col("change") != "unchanged")
        .select(key, "change")
    )


# ------------------------------------------------------ compaction plan


def compaction_plan(
    df: DataFrame,
    size_col: str = "size_bytes",
    part_col: str = "host",
    order_col: str = "url",
    target_bytes: int = 128 * 1024 * 1024,
) -> DataFrame:
    """Assign each row to an output file of ~*target_bytes* within its
    partition — the planning step of small-file compaction (Iceberg
    ``rewrite_data_files`` / bin-packing by partition).

    Greedy running-sum binning: a row opens a new file when the bytes
    before it have crossed a multiple of the target, i.e.
    ``file_seq = floor((running_sum − size) / target)``. The window is
    partition-scoped (``partitionBy(part_col)``) so there is no global
    sort — each host's plan is independent, exactly how a 1000-executor
    compaction job would parallelize.
    """
    w = (
        Window.partitionBy(part_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    running = F.sum(F.col(size_col).cast("bigint")).over(w)
    return df.select(
        part_col,
        order_col,
        F.col(size_col).cast("bigint").alias(size_col),
        F.floor(
            (running - F.col(size_col).cast("bigint"))
            / F.lit(int(target_bytes))
        )
        .cast("int")
        .alias("file_seq"),
    )


# --------------------------------------------------------- Bloom filter

BLOOM_BITS = 1024  # m: 16 × int64 words
BLOOM_WORDS = BLOOM_BITS // 64
BLOOM_K = 4  # probes per key, from disjoint md5 hex slices


def _bloom_positions(hash_col: Column) -> list[Column]:
    """k bit positions in [0, m) from disjoint 8-hex-char slices of an
    md5 hex column — the same arithmetic any SQL engine reproduces."""
    return [
        F.conv(F.substring(hash_col, 1 + 8 * i, 8), 16, 10).cast("long")
        % BLOOM_BITS
        for i in range(BLOOM_K)
    ]


def bloom_word_exprs(hash_col: Column) -> list[Column]:
    """Per-row contribution to each of the m/64 filter words: OR of the
    k probe bits that land in that word. Aggregate with ``bit_or`` to
    build the filter in ONE map-side-combined pass."""
    positions = _bloom_positions(hash_col)
    words = []
    for w in range(BLOOM_WORDS):
        contrib = F.lit(0).cast("long")
        for p in positions:
            bit = F.call_function(
                "shiftleft", F.lit(1).cast("long"), (p % 64).cast("int")
            )
            contrib = contrib.bitwiseOR(
                F.when((p / 64).cast("int") == w, bit).otherwise(
                    F.lit(0).cast("long")
                )
            )
        words.append(contrib)
    return words


def bloom_words(df: DataFrame, hash_col: str = "fp") -> list[int]:
    """Build the filter: one aggregate over the seen-side hashes,
    collecting exactly m/64 int64 words to the driver (a bounded,
    16-value collect — the filter itself, not data)."""
    exprs = bloom_word_exprs(F.col(hash_col))
    row = df.agg(
        *[F.bit_or(e).alias(f"w{i}") for i, e in enumerate(exprs)]
    ).collect()[0]
    return [int(row[f"w{i}"] or 0) for i in range(BLOOM_WORDS)]


def bloom_hit_expr(hash_col: Column, words: list[int]) -> Column:
    """Membership test against a built filter embedded as literals —
    a pure map-side expression: no join, no shuffle, no broadcast
    needed (the 16 words ride inside the task binary)."""
    arr = F.array(*[F.lit(int(w)).cast("long") for w in words])
    cond = F.lit(True)
    for p in _bloom_positions(hash_col):
        word = F.element_at(arr, (p / 64).cast("int") + 1)
        shifted = F.call_function("shiftright", word, (p % 64).cast("int"))
        cond = cond & (shifted.bitwiseAND(F.lit(1)) == 1)
    return cond


# ----------------------------------------------------- Z-order layout key


def zvalue_expr(a: Column, b: Column, bits: int = 16) -> Column:
    """Morton/Z-order key: interleave the low *bits* of two bounded
    non-negative dimension keys (a → even bit lanes, b → odd). Rows
    close in EITHER dimension land near each other in z-order, so
    writing files in z-ranges (repartitionByRange(zvalue) → sorted
    parquet) gives min/max footer stats that prune scans on BOTH
    columns — the layout half of Delta/Iceberg OPTIMIZE ZORDER BY.
    Pure integer arithmetic (shifts/masks), so any engine reproduces
    the key bit-for-bit."""
    z = F.lit(0).cast("long")
    for i in range(bits):
        abit = F.shiftright(a.cast("long"), i).bitwiseAND(F.lit(1))
        bbit = F.shiftright(b.cast("long"), i).bitwiseAND(F.lit(1))
        z = z.bitwiseOR(F.shiftleft(abit, 2 * i)).bitwiseOR(
            F.shiftleft(bbit, 2 * i + 1)
        )
    return z


def zorder_layout(
    df: DataFrame,
    a_col: Column,
    b_col: Column,
    bits: int = 16,
    bucket_shift: int = 24,
) -> DataFrame:
    """Attach the z-value and a static z-bucket (top bits of the key —
    no ntile, no global sort) to *df*. The bucket is what a writer
    would repartitionByRange on; emitting it as a column keeps the
    operator a pure map stage and lets an oracle verify the layout
    math itself."""
    z = zvalue_expr(a_col, b_col, bits)
    return df.withColumn("zval", z).withColumn(
        "zbucket", F.shiftright(F.col("zval"), bucket_shift).cast("int")
    )
