"""PII detection and scrubbing — the redaction pass a web-scale
training pipeline runs before text leaves the cluster.

Patterns are restricted to the regex subset with identical semantics
in Java regex (Spark, JVM-side regexp_count/regexp_replace) and RE2
(the DuckDB oracle): character classes, bounded quantifiers, literals
— no backreferences; the ORACLE patterns also avoid lookaround (RE2
has none). Everything is a built-in string expression; no Python
touches the text.

Engine-side hardening: Java regex backtracks, and the bare email
pattern is QUADRATIC on dotted non-matching text ("a." x 80k = 24 s
measured — one hostile crawl row per core stalls the stage). The
Spark side therefore prefixes a start-of-run lookbehind
``(?<![A-Za-z0-9._%+-])`` so only one match attempt runs per
local-part run. This provably does not change the match set: a
mid-run start is preceded by a local-class char, so the run-start
attempt's greedy local part reaches the SAME first ``@`` with the
same domain — both succeed with the same span or both fail. RE2
(DuckDB) is linear by construction, so the oracle keeps the bare
pattern and the two sides stay value-identical (pinned by the
``pii_scrub`` oracle row).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# (name, pattern, replacement) — applied in order. These are the
# portable (RE2-safe) oracle patterns.
PII_PATTERNS: list[tuple[str, str, str]] = [
    (
        "email",
        r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
        "<EMAIL>",
    ),
    (
        "phone",
        r"\+1-[0-9]{3}-[0-9]{4}",
        "<PHONE>",
    ),
    (
        "ipv4",
        r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b",
        "<IP>",
    ),
]

# Java-engine variants (see module docstring): same match set, linear
# scan on hostile text. Keyed by pattern name.
_SPARK_PATTERNS: dict[str, str] = {
    "email": r"(?<![A-Za-z0-9._%+-])[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
}


def spark_pattern(name: str, pat: str) -> str:
    """The pattern the JVM side should run for entry *name*."""
    return _SPARK_PATTERNS.get(name, pat)


def with_pii_scrub(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Adds ``n_<name>`` match counts per pattern and a fully scrubbed
    ``scrubbed`` column (patterns replaced in declaration order, all
    occurrences)."""
    out = df
    for name, pat, _ in PII_PATTERNS:
        out = out.withColumn(
            f"n_{name}",
            F.regexp_count(
                F.col(text_col), F.lit(spark_pattern(name, pat))
            ).cast("int"),
        )
    scrubbed = F.col(text_col)
    for name, pat, repl in PII_PATTERNS:
        scrubbed = F.regexp_replace(scrubbed, spark_pattern(name, pat), repl)
    return out.withColumn("scrubbed", scrubbed)
