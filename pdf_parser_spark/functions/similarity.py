"""Similarity search over embedding columns (array<float>).

Two paths, per the build brief:

- ``cosine_topk``  — exact brute-force top-k: the correctness baseline.
  The k-selection is a per-query window ranking (hash-partitioned on
  query id), not a global sort.
- ``ivf_topk``     — IVF-style bucketed ANN: a cheap coarse quantizer
  assigns every vector to a cell; each query probes only its own cell,
  cutting the candidate join from |Q|×|N| to |Q|×|N|/cells. The join
  becomes an *equi-join on the cell id* ⇒ hash-partitioned, broadcast-
  able when the query side is small, AQE-skew-splittable when one cell
  is hot. At 100 TB this is the difference between a cross join and a
  shuffle the cluster can actually run.

Dot products fold sequentially in double precision (zip_with +
aggregate with a double accumulator) so results are bit-reproducible
across engines — the DuckDB oracle matches exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def dot_expr(a: Column, b: Column) -> Column:
    """Sequential double-precision dot product of two float arrays."""
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0).cast("double"), lambda acc, v: acc + v)


def cosine_expr(a: Column, b: Column) -> Column:
    return dot_expr(a, b) / (F.sqrt(dot_expr(a, a)) * F.sqrt(dot_expr(b, b)))


def ivf_cell_expr(vec: Column, bits: int = 2) -> Column:
    """Coarse quantizer: sign bits of the first `bits` dimensions →
    cell id in [0, 2^bits). Deterministic, SQL-portable, and cheap; a
    production system would plug a trained k-means codebook in here —
    the join shape (equi on cell id) is identical."""
    cell = F.lit(0)
    for d in range(bits):
        cell = cell + F.when(
            F.element_at(vec, d + 1).cast("double") > 0, F.lit(1 << d)
        ).otherwise(F.lit(0))
    return cell.cast("int")


def _ranked_topk(
    pairs: DataFrame, k: int, round_digits: int
) -> DataFrame:
    w = Window.partitionBy("q_id").orderBy(F.desc("_cos"), "neighbor_id")
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "q_id",
            F.col("rank").cast("int"),
            "neighbor_id",
            F.round("_cos", round_digits).alias("cos"),
        )
    )


def cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    round_digits: int = 4,
) -> DataFrame:
    """Exact top-k neighbors per query → (q_id, rank, neighbor_id, cos).

    Broadcasts the query side (small by construction); the corpus side
    streams — no shuffle of the corpus at all.
    """
    q = F.broadcast(
        queries.select(F.col(id_col).alias("q_id"), F.col(vec_col).alias("qv"))
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv")
    )
    pairs = c.crossJoin(q).where(F.col("q_id") != F.col("neighbor_id"))
    scored = pairs.select(
        "q_id", "neighbor_id", cosine_expr(F.col("qv"), F.col("cv")).alias("_cos")
    )
    return _ranked_topk(scored, k, round_digits)


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 3,
    bits: int = 2,
    round_digits: int = 4,
) -> DataFrame:
    """ANN top-k probing only the query's own IVF cell.

    Equi-join on cell id (hash-partitioned / broadcastable) replaces
    the brute-force cross join — the scale path.
    """
    q = F.broadcast(
        queries.select(
            F.col(id_col).alias("q_id"),
            F.col(vec_col).alias("qv"),
            ivf_cell_expr(F.col(vec_col), bits).alias("cell"),
        )
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        ivf_cell_expr(F.col(vec_col), bits).alias("cell"),
    )
    pairs = c.join(q, "cell").where(F.col("q_id") != F.col("neighbor_id"))
    scored = pairs.select(
        "q_id", "neighbor_id", cosine_expr(F.col("qv"), F.col("cv")).alias("_cos")
    )
    return _ranked_topk(scored, k, round_digits)
