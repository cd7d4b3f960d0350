"""Driver script for the north rule's launch mode: spark-submit --py-files.

Launched by ``tools/spark_submit.sh``, which zips ``pdf_parser_spark/``
and ships it with ``--py-files`` — the package reaches this driver AND
the executor Python workers only through that zip (run from any CWD;
no repo on PYTHONPATH). The job: synthesize the Common-Crawl-style
corpus from a testdata scale dir, run the flagship extraction, print
ONE JSON line with throughput.

Usage (via spark-submit):
    spark-submit --master local[N] --py-files pkg.zip tools/submit_job.py \
        <cores> <sf_dir> [replicate] [out_dir]

With ``out_dir`` the extraction goes through the snapshot log
(engine/snapshots.py) — one manifest commit per url-hash bucket, so a
killed submit resumes from the last committed snapshot on relaunch;
without it, a pure-throughput noop sink.
"""

from __future__ import annotations

import json
import sys
import time


def main() -> None:
    cores = sys.argv[1]
    sf_dir = sys.argv[2]
    replicate = int(sys.argv[3]) if len(sys.argv) > 3 else 1
    out_dir = sys.argv[4] if len(sys.argv) > 4 else None

    from pdf_parser_spark.engine.corpus import synthesize_webdocs
    from pdf_parser_spark.engine.extractor import parse_webdocs
    from pdf_parser_spark.engine.session import build_session

    spark = build_session(
        "pdf_parser_spark-submit",
        master=f"local[{cores}]",
        shuffle_partitions=int(cores),
    )
    spark.sparkContext.setLogLevel("ERROR")

    # materialize the corpus to scratch parquet first (untimed), same
    # methodology as BENCH/run_extraction.py: the timed span measures
    # extraction, not corpus synthesis
    import shutil
    import tempfile

    import os

    scratch = tempfile.mkdtemp(
        prefix="submit_corpus_",
        dir="/dev/shm" if os.path.isdir("/dev/shm") else None,
    )
    synthesize_webdocs(spark, sf_dir, replicate=replicate).write.mode(
        "overwrite"
    ).parquet(scratch)
    docs = spark.read.parquet(scratch)
    # warm the Python worker pool so startup doesn't pollute throughput
    parse_webdocs(docs.limit(64)).write.format("noop").mode("overwrite").save()
    n_docs = docs.count()

    if out_dir:
        from pdf_parser_spark.engine.snapshots import (
            snapshot_resumable_extract,
        )

        t0 = time.perf_counter()
        parsed = snapshot_resumable_extract(spark, docs, out_dir, n_batches=8)
        n_out = parsed.count()
        walls = [time.perf_counter() - t0]
    else:
        # best-of-2 trials, same as BENCH/run_extraction.py: hypervisor
        # steal on this VM swings single trials ±10-25%
        walls = []
        for _ in range(2):
            t0 = time.perf_counter()
            parse_webdocs(docs).write.format("noop").mode("overwrite").save()
            walls.append(time.perf_counter() - t0)
        n_out = n_docs
    wall = min(walls)

    print(
        json.dumps(
            {
                "metric": "docs_per_sec_extraction",
                "launcher": "spark-submit --py-files",
                "master": f"local[{cores}]",
                "sf_dir": sf_dir,
                "replicate": replicate,
                "n_docs": n_docs,
                "n_out": n_out,
                "snapshot_log": bool(out_dir),
                "wall_sec": round(wall, 2),
                "trials_sec": [round(w, 2) for w in walls],
                "value": round(n_docs / wall, 1),
            }
        ),
        flush=True,
    )
    spark.stop()
    shutil.rmtree(scratch, ignore_errors=True)


if __name__ == "__main__":
    main()
