"""Incremental ingestion via Structured Streaming.

The batch engine's resume path (engine/resume.py) is the primary
incremental mechanism (SURVEY.md §2.9: the reference is a one-shot
batch tool). This module adds the continuous variant for
always-arriving corpora: a file-source stream over the webdocs table
directory → the same extraction UDF → parquet sink with checkpointed
exactly-once progress. New parquet files dropped into the source
directory (e.g. by a WARC unpacker) are discovered, parsed once, and
appended; a restart resumes from the checkpoint.

Design notes (scale):
- the extraction UDF is IDENTICAL to the batch path — one kernel, two
  drivers (batch + streaming), no semantic drift;
- ``maxFilesPerTrigger`` bounds micro-batch size so one giant drop
  cannot OOM an executor wave;
- no shuffle inside the stream: salting matters for long-running batch
  scans, while a micro-batch is already small — per-file parallelism
  suffices. A hot-host burst is bounded by the trigger cap.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from ..engine.corpus import WEBDOCS_SCHEMA
from ..engine.extractor import PARSED_SCHEMA, extract_batch


def streaming_extract(
    spark: SparkSession,
    source_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int = 8,
    available_now: bool = False,
) -> StreamingQuery:
    """Start the extraction stream; returns the StreamingQuery handle.

    With ``available_now=True`` the stream drains everything currently
    in *source_dir* and stops — the testable/batch-catchup mode.
    """
    stream = (
        spark.readStream.schema(WEBDOCS_SCHEMA)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .parquet(source_dir)
    )
    parsed = stream.select("url", "html").mapInPandas(
        extract_batch, schema=PARSED_SCHEMA
    )
    writer = (
        parsed.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def extracted_stream_view(spark: SparkSession, output_dir: str) -> DataFrame:
    """Read-side view of the streamed output (same columns as batch)."""
    return spark.read.parquet(output_dir).select(
        "url", "kind", "text", "n_pages", "n_items", "error"
    )
