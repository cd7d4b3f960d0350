"""BPE tokenizer TRAINING on Spark — the iterative merge-learning loop
(Sennrich et al. 2016, "Neural Machine Translation of Rare Words with
Subword Units"), not just the first-round pair census
(textstats.bpe_pair_counts).

Each round is pure set-oriented work that scales like any corpus agg:

1. adjacent-pair counts over the current symbol table — one
   map-side-combined groupBy whose domain is bounded by |vocab|²;
2. pick the max pair (count desc, pair asc — deterministic) — a
   bounded single-row collect, exactly like a k-means centroid fetch;
3. apply the merge GREEDY LEFT-TO-RIGHT: inside a run of overlapping
   matches ("aaaa" under (a,a)) only every other start merges. The
   run-parity rule is gaps-and-islands over match positions — plain
   window functions, so a SQL oracle reproduces it exactly;
4. renumber symbol positions and localCheckpoint, so each round's plan
   starts flat instead of stacking (iterative-algorithm hygiene).

The symbol table is (word, freq, pos, s) over DISTINCT words — corpus
size only enters through the one word-frequency groupBy, which is the
classic trick that makes BPE training tractable at crawl scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .textstats import tokens


def word_freq_table(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, freq) over lowercase alphabetic tokens — the trainer's
    input. One shuffle (the groupBy); everything after runs on the
    distinct-word table, which is vastly smaller than the corpus."""
    w = df.select(F.explode(tokens(text_col)).alias("w")).select(
        F.lower("w").alias("word")
    )
    return (
        w.where(F.col("word").rlike("^[a-z]+$"))
        .groupBy("word")
        .agg(F.count("*").cast("bigint").alias("freq"))
    )


def initial_symbols(words: DataFrame) -> DataFrame:
    """(word, freq, pos, s): one row per character, pos 1-based."""
    return words.select(
        "word",
        "freq",
        F.explode(
            F.expr("sequence(1, length(word))")
        ).alias("pos"),
    ).withColumn("s", F.expr("substring(word, pos, 1)"))


def _top_pair(sym: DataFrame):
    """Highest-count adjacent pair, ties by pair text. Returns
    (a, b, count) or None — a bounded ONE-row collect per round."""
    wlead = Window.partitionBy("word").orderBy("pos")
    pairs = (
        sym.withColumn("ns", F.lead("s").over(wlead))
        .where(F.col("ns").isNotNull())
        .groupBy("s", "ns")
        .agg(F.sum("freq").cast("bigint").alias("cnt"))
    )
    row = pairs.orderBy(F.desc("cnt"), F.asc("s"), F.asc("ns")).take(1)
    if not row:
        return None
    return row[0]["s"], row[0]["ns"], int(row[0]["cnt"])


def apply_merge(sym: DataFrame, a: str, b: str) -> DataFrame:
    """Greedy left-to-right merge of pair (a, b) in every word.

    Match starts that overlap ("aaa" has starts at 1 and 2) resolve by
    run parity: islands of consecutive match positions keep odd ranks
    only. Then merged rows take s = a||b, the following row is dropped,
    and positions renumber to stay contiguous for the next round."""
    wlead = Window.partitionBy("word").orderBy("pos")
    x = sym.withColumn("ns", F.lead("s").over(wlead))
    matches = x.where((F.col("s") == a) & (F.col("ns") == b)).select(
        "word", "pos"
    )
    isl = matches.withColumn(
        "isl", F.col("pos") - F.row_number().over(wlead)
    )
    kept = (
        isl.withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("word", "isl").orderBy("pos")
            ),
        )
        .where(F.col("rn") % 2 == 1)
        .select("word", "pos", F.lit(1).alias("k"))
    )
    merged = (
        x.join(kept, ["word", "pos"], "left")
        .withColumn("k_prev", F.lag("k").over(wlead))
        .where(F.col("k_prev").isNull())
        .select(
            "word",
            "freq",
            "pos",
            F.when(F.col("k") == 1, F.concat("s", "ns")).otherwise(
                F.col("s")
            ).alias("s"),
        )
        .withColumn("pos", F.row_number().over(wlead))
    )
    return merged


def learn_merges(
    words: DataFrame, n_merges: int = 3
) -> list[tuple[int, str, str, int]]:
    """Run *n_merges* BPE rounds; returns [(rank, left, right, count)].
    Each round localCheckpoints the symbol table so plans stay flat."""
    sym = initial_symbols(words).localCheckpoint(eager=True)
    out: list[tuple[int, str, str, int]] = []
    for t in range(1, n_merges + 1):
        top = _top_pair(sym)
        if top is None:
            break
        a, b, cnt = top
        out.append((t, a, b, cnt))
        if t < n_merges:
            sym = apply_merge(sym, a, b).localCheckpoint(eager=True)
    return out
