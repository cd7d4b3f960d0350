"""Deterministic sampling & splitting for training-data pipelines.

A 10^12-document corpus cannot be sampled with an RNG-based
`df.sample()`/`sampleBy()`: the draw differs per run, per Spark
version, and per partition layout, so the sample is unreproducible and
resume/backfill jobs disagree about membership. The scale-correct
primitive is CONTENT-KEYED hashing — a pure filter expression over
md5(key || salt), no shuffle, no state, identical in every engine:

- membership is a property of the ROW, not of the run: re-running,
  resuming, or recomputing on a different cluster selects the same
  documents;
- fractions compose: a 1% sample of a 10% sample (different salts) is
  an unbiased 0.1% sample;
- the same arithmetic runs in any SQL engine (md5 hex prefix compared
  lexicographically), so a DuckDB oracle verifies membership exactly.

Granularity is 16 bits (4 hex chars, 1/65536 ≈ 0.0015%); fractions are
rounded down to that grid, and the helpers expose the exact realized
fraction so callers can account for it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_GRID = 1 << 16  # 4 hex chars


def realized_fraction(fraction: float) -> float:
    """The exact fraction the 16-bit grid realizes for *fraction*."""
    return int(fraction * _GRID) / _GRID


def _threshold_hex(fraction: float) -> str:
    t = int(fraction * _GRID)
    t = max(0, min(_GRID, t))
    return format(t, "04x")


def hash_prefix(key: Column | str, salt: str = "") -> Column:
    """First 4 hex chars of md5(key || salt) — the 16-bit sampling
    coordinate. *key* is cast to string, so any stable id column works;
    *salt* decorrelates independent draws over the same keys."""
    c = F.col(key) if isinstance(key, str) else key
    return F.substring(F.md5(F.concat(c.cast("string"), F.lit(salt))), 1, 4)


def deterministic_sample(
    df: DataFrame, fraction: float, key_col: str = "doc_id", salt: str = ""
) -> DataFrame:
    """Keep rows whose hash coordinate falls below the fraction
    threshold — a pure filter (pushes past projections, costs no
    shuffle, prunes at the scan when *key_col* is a file-level
    predicate target)."""
    return df.where(
        hash_prefix(key_col, salt) < F.lit(_threshold_hex(fraction))
    )


def stratified_sample(
    df: DataFrame,
    fractions: dict[str, float],
    strat_col: str = "lang",
    key_col: str = "doc_id",
    salt: str = "",
    default_fraction: float = 0.0,
) -> DataFrame:
    """Per-stratum deterministic sampling (the `sampleBy` twin, but
    reproducible): each stratum value gets its own threshold; strata
    not listed get *default_fraction*. One CASE expression, still a
    pure filter — the standard tool for rebalancing language mixes in
    a training corpus."""
    c = F.col(strat_col)
    thr: Column = F.lit(_threshold_hex(default_fraction))
    for value, frac in sorted(fractions.items()):
        thr = F.when(c == value, F.lit(_threshold_hex(frac))).otherwise(thr)
    return df.where(hash_prefix(key_col, salt) < thr)


def hash_split(
    df: DataFrame,
    weights: dict[str, float],
    key_col: str = "doc_id",
    salt: str = "",
    split_col: str = "split",
) -> DataFrame:
    """Assign every row to exactly one split (train/val/test…) by
    consecutive ranges of the hash coordinate — disjoint, exhaustive,
    and stable under re-runs and corpus growth (a document's split
    never changes when other documents are added). Splits are assigned
    in sorted-name order; the last split absorbs the rounding
    remainder. Weights must sum to ~1."""
    total = sum(weights.values())
    if not 0.999 <= total <= 1.001:
        raise ValueError(f"split weights must sum to 1, got {total}")
    names = sorted(weights)
    coord = hash_prefix(key_col, salt)
    # first-match-wins CASE over cumulative thresholds, built inside-out
    cum = 0.0
    conds: list[tuple[str, str]] = []
    for name in names[:-1]:
        cum += weights[name]
        conds.append((name, _threshold_hex(cum)))
    out: Column = F.lit(names[-1])
    for name, t in reversed(conds):
        out = F.when(coord < F.lit(t), F.lit(name)).otherwise(out)
    return df.withColumn(split_col, out)


def _bucket16(key: Column | str, salt: str = "") -> Column:
    """hash_prefix as an integer in [0, 65536) — for integer-exact
    threshold arithmetic (no float rates anywhere)."""
    hx = hash_prefix(key, salt)
    out = F.lit(0)
    for p in range(4):
        d = F.instr(F.lit("0123456789abcdef"), F.substring(hx, p + 1, 1)) - 1
        out = out * 16 + d
    return out.cast("bigint")


def mix_temperature(
    df: DataFrame,
    strat_col: str = "lang",
    key_col: str = "doc_id",
    text_col: str = "text",
    salt: str = "temp",
) -> DataFrame:
    """Temperature-smoothed corpus mixing at α = 0.5 (T = 2 — the
    multilingual-LM standard for upweighting low-resource strata, cf.
    mC4/XLM-R): the output token share of stratum g follows
    supply^α / Σ supply^α instead of raw supply.

    At α = 0.5 the per-stratum keep fraction collapses to
    f_g = √(L_min / L_g) — the normalization Σ cancels — so membership
    is EXACT INTEGER arithmetic: keep iff bucket² · L_g < 65536² ·
    L_min (square both sides; bucket ≥ 0). No float enters the rule,
    so no cross-engine ulp hazard and no order-dependent float Σ over
    strata. The scarcest stratum keeps 100%; a stratum with 4× the
    supply keeps 50% of it (2× the scarcest's tokens — smoothed, not
    equalized).

    Overflow bound: bucket² ≤ 2³², so the rule stays in int64 while
    L_g < 2³¹ tokens per stratum; beyond that divide both L's by a
    common power of two first (the comparison is scale-invariant).

    Plan: one tiny per-stratum aggregation, driver-side min (#strata
    rows), broadcast threshold join, pure corpus-side filter — the
    corpus is never shuffled.
    """
    from .textstats import ws_token_count

    totals = {
        r[strat_col]: r["toks"]
        for r in df.groupBy(strat_col)
        .agg(F.sum(ws_token_count(text_col)).cast("bigint").alias("toks"))
        .collect()
    }
    if not totals:
        raise ValueError("empty corpus")
    l_min = min(totals.values())
    spark = df.sparkSession
    thr = spark.createDataFrame(
        [(g, totals[g]) for g in sorted(totals)],
        f"{strat_col} string, strat_toks bigint",
    )
    b = _bucket16(key_col, salt)
    return (
        df.join(F.broadcast(thr), strat_col)
        .where(b * b * F.col("strat_toks") < F.lit(65536 * 65536 * l_min))
        .drop("strat_toks")
    )


def mix_corpus(
    df: DataFrame,
    weights: dict[str, int],
    strat_col: str = "lang",
    key_col: str = "doc_id",
    text_col: str = "text",
    salt: str = "mix",
) -> DataFrame:
    """Token-proportional corpus mixing (the data-mix stage): sample
    each stratum so the OUTPUT token mixture follows integer *weights*,
    at the largest output size achievable without upsampling — the
    stratum with the scarcest supply relative to its weight keeps 100%
    and every other stratum is hash-downsampled to match.

    All arithmetic is int64 (token counts, 16-bit hash buckets, weight
    cross-multiplication) so membership is bit-stable across engines
    and runs. Plan shape: one tiny per-stratum token-count aggregation
    (rows = #strata), a driver-side min over it, a BROADCAST join of
    the per-stratum keep-threshold back onto the corpus, then a pure
    filter — the corpus is never shuffled.

    Keep rule: bucket * W * L_g < 65536 * w_g * T_out, where
    T_out = min_g(L_g * W // w_g). Strata not in *weights* are dropped.
    """
    from .textstats import ws_token_count

    W = sum(weights.values())
    totals = {
        r[strat_col]: r["toks"]
        for r in df.groupBy(strat_col)
        .agg(F.sum(ws_token_count(text_col)).cast("bigint").alias("toks"))
        .collect()
        if r[strat_col] in weights
    }
    if not totals:
        raise ValueError("no stratum in weights present in the corpus")
    t_out = min(totals[g] * W // weights[g] for g in totals)
    spark = df.sparkSession
    thr = spark.createDataFrame(
        [(g, totals[g], weights[g]) for g in sorted(totals)],
        f"{strat_col} string, strat_toks bigint, w bigint",
    )
    joined = df.join(F.broadcast(thr), strat_col)
    return joined.where(
        _bucket16(key_col, salt) * F.lit(W) * F.col("strat_toks")
        < F.lit(65536) * F.col("w") * F.lit(t_out)
    ).drop("strat_toks", "w")


def derive_n_shards(total: int, target_per_shard: int, floor: int = 16) -> int:
    """Scale-aware shard count: ceil(total / target), floored at 16.

    The consumer of a sharded layout sorts or ranks WITHIN each shard
    (training_order's rank-within-shard, pack_sequences' prefix-sum
    window), so a fixed shard count makes every window partition grow
    linearly with the corpus — the per-reducer sort that breaks first
    at 100×. Deriving the count from the corpus total keeps each
    shard's size near *target_per_shard* regardless of scale: 60k docs
    → the floor; 10^12 docs / 1M-doc target → 10^6 shards. Purely
    arithmetic and deterministic, so sharded output stays oracle-
    reproducible for a given corpus size."""
    if total <= 0:
        return floor
    return max(floor, -(-int(total) // int(target_per_shard)))


def training_order(
    df: DataFrame,
    key_col: str = "doc_id",
    seed: str = "epoch0",
    n_shards: int | None = None,
    shard_col: str = "shard",
    key_out: str = "shuffle_key",
    target_docs_per_shard: int = 1_000_000,
) -> DataFrame:
    """Deterministic global shuffle + shard assignment — the reorder
    every training run does between curation and sequence packing.

    ``shuffle_key = md5(key || seed)`` is a seeded pseudorandom
    permutation coordinate: reproducible across engines and re-runs,
    refreshed per epoch by changing *seed*. ``shard`` is the SAME
    draw's 16-bit coordinate mod *n_shards*, so each shard is an
    independent random slice a data-loader worker can read alone.
    Map-only here; the writer's job is ``repartition(shard_col)`` +
    ``sortWithinPartitions(key_out)`` — a partitioned sort, never a
    single global exchange.

    ``n_shards=None`` derives the count from the corpus size
    (:func:`derive_n_shards`: ceil(count / target_docs_per_shard),
    floor 16) — one bounded count() job, the price of keeping the
    per-shard rank window O(target) instead of O(corpus/16) at scale.
    Pass an explicit count to pin layout across epochs of a growing
    corpus."""
    if n_shards is None:
        n_shards = derive_n_shards(df.count(), target_docs_per_shard)
    key = F.md5(F.concat(F.col(key_col).cast("string"), F.lit(seed)))
    return df.withColumn(key_out, key).withColumn(
        shard_col,
        F.pmod(_bucket16(key_col, seed), F.lit(n_shards)).cast("int"),
    )


def upsample(
    df: DataFrame,
    factor: float,
    key_col: str = "doc_id",
    salt: str = "up",
    copy_col: str = "copy",
) -> DataFrame:
    """Deterministic fractional upsampling: repeat every row
    floor(factor) times and give a deterministic extra copy to the
    fraction of keys the 16-bit hash coordinate selects — e.g. data
    recipes that run a high-quality source for 2.25 epochs. Reproducible
    (no RNG), map-only (explode of a per-row integer sequence, no
    shuffle), and stable under corpus growth: a document's copy count
    never changes when other documents are added. ``copy_col`` numbers
    the replicas 0..n-1 so downstream packing can decorrelate them
    (e.g. different shuffle seed per copy)."""
    if factor <= 0:
        raise ValueError(f"factor must be > 0, got {factor}")
    whole = int(factor)
    frac = factor - whole
    n = F.lit(whole) + F.when(
        hash_prefix(key_col, salt) < F.lit(_threshold_hex(frac)), 1
    ).otherwise(0)
    return (
        df.withColumn("_n_copies", n)
        .where(F.col("_n_copies") > 0)
        .withColumn(
            copy_col, F.explode(F.sequence(F.lit(0), F.col("_n_copies") - 1))
        )
        .drop("_n_copies")
    )
