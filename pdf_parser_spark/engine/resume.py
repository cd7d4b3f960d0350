"""Snapshot resume: re-run only uncommitted work after a failure.

North rule: "resumes from the last committed snapshot". Sandbox stand-in
for Iceberg snapshots: each completed partition-batch lands in a parquet
directory (atomic per-file commit); resume anti-joins the input against
the urls already present in the committed output, so a re-run processes
only the remainder and never duplicates a url.

On a real cluster this maps 1:1 to Iceberg: the committed-url scan is a
snapshot read, the append is a transactional commit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.utils import AnalysisException

from .extractor import parse_webdocs


def committed_urls(spark: SparkSession, output_dir: str) -> DataFrame | None:
    """urls already present in the committed parsed table, else None."""
    try:
        return spark.read.parquet(f"{output_dir}/parsed").select("url")
    except AnalysisException:
        return None


def resumable_extract(
    spark: SparkSession,
    webdocs: DataFrame,
    output_dir: str,
    salt: bool = True,
) -> DataFrame:
    """Extract only not-yet-committed urls and append them.

    Returns the full committed parsed table after the run. Idempotent:
    a second call with the same input is a no-op (anti-join leaves
    nothing to do).
    """
    done = committed_urls(spark, output_dir)
    todo = webdocs
    if done is not None:
        todo = webdocs.join(done, "url", "left_anti")
    if todo.limit(1).count() > 0:
        parsed_new = parse_webdocs(todo, salt=salt)
        parsed_new.write.mode("append").parquet(f"{output_dir}/parsed")
    return spark.read.parquet(f"{output_dir}/parsed")
