"""PII detection and scrubbing — the redaction pass a web-scale
training pipeline runs before text leaves the cluster.

Patterns are restricted to the regex subset with identical semantics
in Java regex (Spark, JVM-side regexp_count/regexp_replace) and RE2
(the DuckDB oracle): character classes, bounded quantifiers, literals
— no backreferences, no lookaround. Everything is a built-in string
expression; no Python touches the text.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# (name, pattern, replacement) — applied in order
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


def with_pii_scrub(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Adds ``n_<name>`` match counts per pattern and a fully scrubbed
    ``scrubbed`` column (patterns replaced in declaration order, all
    occurrences)."""
    out = df
    for name, pat, _ in PII_PATTERNS:
        out = out.withColumn(
            f"n_{name}",
            F.regexp_count(F.col(text_col), F.lit(pat)).cast("int"),
        )
    scrubbed = F.col(text_col)
    for _, pat, repl in PII_PATTERNS:
        scrubbed = F.regexp_replace(scrubbed, pat, repl)
    return out.withColumn("scrubbed", scrubbed)
