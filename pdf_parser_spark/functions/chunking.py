"""Token-window chunking: split documents into fixed-size overlapping
token windows — the unit a pretraining loader consumes.

Pure array expressions (tokenize once, slice per window); the explode
multiplies rows, not bytes-per-row, and everything stays inside
whole-stage codegen. Chunk counts use integer ceil division so the
DuckDB oracle reproduces them bit-exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import textstats


def chunk_tokens(
    df: DataFrame,
    size: int = 40,
    overlap: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """One row per (doc, window): windows start every ``size − overlap``
    tokens; the final window is truncated at the document end; empty
    documents produce no rows.

    n_chunks = ceil(max(n − size, 0) / stride) + 1 for n > 0 — every
    token is covered, consecutive windows share ``overlap`` tokens.
    Output: (id, chunk_id, n_chunk_tokens, chunk_text).
    """
    if overlap >= size:
        raise ValueError("overlap must be < size")
    stride = size - overlap
    toks = textstats.tokens(text_col)
    n = F.size(toks)
    # integer ceil((n - size)/stride) + 1; doubles are exact here
    # (token counts are far below 2^53)
    n_chunks = F.when(n <= 0, F.lit(0)).otherwise(
        F.floor(
            (F.greatest(n - size, F.lit(0)) + (stride - 1)) / stride
        ).cast("int")
        + 1
    )
    exploded = df.select(
        id_col,
        toks.alias("_toks"),
        F.explode(
            F.when(
                n_chunks > 0, F.sequence(F.lit(0), n_chunks - 1)
            ).otherwise(F.array().cast("array<int>"))
        ).alias("chunk_id"),
    )
    window = F.slice(
        F.col("_toks"), F.col("chunk_id") * stride + 1, size
    )
    return exploded.select(
        id_col,
        F.col("chunk_id").cast("int").alias("chunk_id"),
        F.size(window).cast("int").alias("n_chunk_tokens"),
        F.concat_ws(" ", window).alias("chunk_text"),
    )
