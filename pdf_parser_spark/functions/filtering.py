"""Corpus-level filtering for training-data pipelines: per-host
frequency caps and a composite quality gate (C4/Gopher-style rule
chain with a per-document drop reason).

Everything here is built-in-expression Spark (windows, joins, string
expressions) — no Python UDFs — so the plans stay inside whole-stage
codegen and shuffle only slim (id, key) projections.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from . import dedup, textstats


def hash_order_key(id_col: Column | str) -> Column:
    """Deterministic pseudo-random ordering key: md5 of the id —
    reproducible across runs and engines, uncorrelated with insertion
    or crawl order (so a cap keeps a uniform sample, not a prefix)."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    return F.md5(c.cast("string"))


def host_cap(
    df: DataFrame,
    host_col: str = "source",
    id_col: str = "doc_id",
    k: int = 10,
    salts: int = 16,
) -> DataFrame:
    """Keep at most ``k`` documents per host, chosen by deterministic
    hash order — the crawl-balance cap that stops one mirror/spam host
    from dominating a training mix.

    Two-phase so a hot host never lands on one reducer: phase 1 ranks
    within (host, salt) — ≤ ``salts`` subgroups per host — and keeps k
    per subgroup; phase 2 ranks the ≤ k·salts survivors per host. Any
    row in a host's global top-k is also in the top-k of whichever
    subgroup contains it, so the result is IDENTICAL to a single
    global window for every salt assignment, but the first (big)
    shuffle spreads a skewed host over ``salts`` reducers and the
    second shuffle sees a bounded row count per host regardless of
    input skew. Output: the kept rows plus their final rank ``rk``
    (1-based within host).
    """
    ord_ = hash_order_key(id_col)
    # salt choice never changes the output (see above) — xxhash64 is
    # fine here even though oracle-visible hashes are md5-only
    salt = F.pmod(F.xxhash64(F.col(id_col)), F.lit(salts))
    w1 = Window.partitionBy(F.col(host_col), F.col("_salt")).orderBy(
        ord_.asc(), F.col(id_col).asc()
    )
    phase1 = (
        df.withColumn("_salt", salt)
        .withColumn("_rn1", F.row_number().over(w1))
        .where(F.col("_rn1") <= k)
        .drop("_salt", "_rn1")
    )
    w2 = Window.partitionBy(F.col(host_col)).orderBy(
        ord_.asc(), F.col(id_col).asc()
    )
    return (
        phase1.withColumn("rk", F.row_number().over(w2).cast("int"))
        .where(F.col("rk") <= k)
    )


def quality_gate(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    lang_col: str | None = "lang",
    min_tokens: int = 10,
    rep_num: int = 1,
    rep_den: int = 5,
) -> DataFrame:
    """Composite keep/drop decision with a first-failing-rule reason,
    the C4/Gopher filter-chain shape:

    1. ``too_short``    — fewer than ``min_tokens`` whitespace tokens
    2. ``repetitive``   — duplicate 3-gram fraction > rep_num/rep_den
                          (integer cross-multiplied, engine-exact)
    3. ``low_quality``  — the stopword/punctuation/length bucket from
                          :func:`textstats.with_quality` says 'low'
    4. ``lang_mismatch``— marker-word language ID disagrees with the
                          declared ``lang_col`` (skipped if None)
    5. ``kept``

    One exploded-shingle aggregation (the repetition signal) plus one
    slim equi-join back to the per-row expression signals; everything
    else is codegen'd string math. Output: (id, reason, keep).
    """
    signals = textstats.with_lang_id(
        textstats.with_quality(df, text_col=text_col), text_col=text_col
    )
    rep = dedup.repetition_stats(
        df, text_col=text_col, id_col=id_col, k=3
    ).select(id_col, "n_shingles", "n_distinct")
    j = signals.join(rep, id_col)
    repetitive = (
        (F.col("n_shingles") - F.col("n_distinct")) * rep_den
        > F.col("n_shingles") * rep_num
    )
    reason = F.when(F.col("n_tokens") < min_tokens, F.lit("too_short")).when(
        repetitive, F.lit("repetitive")
    ).when(F.col("quality") == "low", F.lit("low_quality"))
    if lang_col is not None:
        reason = reason.when(
            F.col("pred_lang") != F.col(lang_col), F.lit("lang_mismatch")
        )
    reason = reason.otherwise(F.lit("kept"))
    return j.select(
        id_col,
        reason.alias("reason"),
        (reason == "kept").cast("int").alias("keep"),
    )


def gopher_rules(
    df: DataFrame,
    lines_col: str = "lines",
    id_col: str = "doc_id",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_len_e6: int = 3_000_000,
    max_mean_len_e6: int = 10_000_000,
    min_alpha_e6: int = 800_000,
    max_bullet_e6: int = 150_000,
    max_ellipsis_e6: int = 95_000,
) -> DataFrame:
    """Gopher-style line-format quality rules (Rae et al. 2021 §A1.1):
    per-document word count, mean word length, fraction of words with
    an alphabetic character, fraction of lines that start as bullets
    ('- '), and fraction of lines ending in an ellipsis ('...'), plus
    a composite pass flag over the classic bounds.

    All fractions are published as parts-per-million computed with
    INTEGER division ((1e6 * num) div den) so Spark and any SQL oracle
    agree bit-for-bit — no double rounding anywhere (the same
    integer-parity discipline as textstats.unigram_surprisal).

    Scale shape: map-only — every signal is an array expression over
    the document's own lines; zero exchanges, fully codegen'd, the
    cheapest possible 100 TB pass.
    """
    ls = F.col(lines_col)
    words = F.flatten(
        F.transform(
            ls, lambda l: F.filter(F.split(l, " "), lambda w: w != F.lit(""))
        )
    )
    out = (
        df.select(F.col(id_col), ls.alias("_ls"), words.alias("_ws"))
        .withColumn("n_words", F.size("_ws").cast("long"))
        .withColumn("n_lines", F.size("_ls").cast("long"))
        .withColumn(
            "_sum_len",
            F.aggregate(
                "_ws", F.lit(0).cast("long"), lambda a, w: a + F.length(w)
            ),
        )
        .withColumn(
            "_n_alpha",
            F.size(F.filter("_ws", lambda w: w.rlike("[a-z]"))).cast("long"),
        )
        .withColumn(
            "_n_bullet",
            F.size(F.filter("_ls", lambda l: l.startswith("- "))).cast("long"),
        )
        .withColumn(
            "_n_ellipsis",
            F.size(F.filter("_ls", lambda l: l.endswith("..."))).cast("long"),
        )
        .withColumn(
            "mean_word_len_e6",
            F.expr(
                "CASE WHEN n_words > 0 "
                "THEN (1000000 * _sum_len) div n_words ELSE 0 END"
            ),
        )
        .withColumn(
            "alpha_frac_e6",
            F.expr(
                "CASE WHEN n_words > 0 "
                "THEN (1000000 * _n_alpha) div n_words ELSE 0 END"
            ),
        )
        .withColumn(
            "bullet_frac_e6",
            F.expr(
                "CASE WHEN n_lines > 0 "
                "THEN (1000000 * _n_bullet) div n_lines ELSE 0 END"
            ),
        )
        .withColumn(
            "ellipsis_frac_e6",
            F.expr(
                "CASE WHEN n_lines > 0 "
                "THEN (1000000 * _n_ellipsis) div n_lines ELSE 0 END"
            ),
        )
    )
    passes = (
        F.col("n_words").between(min_words, max_words)
        & F.col("mean_word_len_e6").between(min_mean_len_e6, max_mean_len_e6)
        & (F.col("alpha_frac_e6") >= min_alpha_e6)
        & (F.col("bullet_frac_e6") <= max_bullet_e6)
        & (F.col("ellipsis_frac_e6") <= max_ellipsis_e6)
    )
    return out.select(
        id_col,
        "n_words",
        "n_lines",
        "mean_word_len_e6",
        "alpha_frac_e6",
        "bullet_frac_e6",
        "ellipsis_frac_e6",
        passes.alias("passes"),
    )


def suffix_blocked_expr(host_col: Column | str, suffixes: list[str]) -> Column:
    """Domain-suffix blocklist test (public-suffix-style): a host is
    blocked when it equals an entry or ends with '.' + entry, so
    'ads.example.org' matches 'example.org' but 'notexample.org' does
    not. The list rides as a plan literal → a pure map-side filter (no
    join, no broadcast exchange) — the right shape for the few-thousand
    -entry blocklists crawl pipelines carry; a genuinely huge list
    would switch to a broadcast join on reversed-host prefix ranges."""
    h = F.col(host_col) if isinstance(host_col, str) else host_col
    return F.exists(
        F.array(*[F.lit(s) for s in suffixes]),
        lambda s: (h == s) | h.endswith(F.concat(F.lit("."), s)),
    )


# Soft-404 phrase inventory: the page-body strings error pages emit
# while still returning HTTP 200 (the classic crawl-corpus pollutant —
# Bar-Yossef et al., "Sic transit gloria telae", WWW 2004). Matched
# case-insensitively as plain substrings (no regex: the list is the
# contract, and substring scans are linear and codegen-friendly).
SOFT404_PHRASES = (
    "page not found",
    "404 error",
    "error 404",
    "does not exist",
    "no longer available",
    "has been removed",
    "could not be found",
)

# A page this short that also carries an error phrase is almost
# certainly a soft 404; the length signal alone is only a weak +1.
SOFT404_SHORT_CHARS = 300


def soft404_score_expr(text_col: Column | str) -> Column:
    """Integer soft-404 evidence score: +2 per distinct error phrase
    present (case-insensitive substring), +1 when the body is shorter
    than SOFT404_SHORT_CHARS. Pure map-side built-ins — the score is
    exact integer arithmetic so the relational result replays
    bit-for-bit from SQL."""
    t = F.col(text_col) if isinstance(text_col, str) else text_col
    low = F.lower(t)
    score = F.when(F.length(t) < SOFT404_SHORT_CHARS, 1).otherwise(0)
    for p in SOFT404_PHRASES:
        score = score + F.when(low.contains(p), 2).otherwise(0)
    return score


def soft404_flag_expr(text_col: Column | str, threshold: int = 2) -> Column:
    """True when the evidence score reaches *threshold* (default 2 —
    any error phrase flags; the short-body signal alone never does)."""
    return soft404_score_expr(text_col) >= threshold
