"""Single extraction throughput run at a given parallelism.

Usage: python BENCH/run_extraction.py <cores> [sf_dir] [replicate]

Synthesizes the webdocs corpus (documents × replicate), runs the full
salted extraction pipeline end-to-end (noop sink), prints one JSON line
{"cores", "n_docs", "wall_sec", "docs_per_sec"}. Invoked as a fresh
process per parallelism level because the JVM master is fixed at
startup — this is the sandbox proxy for "spark-submit at N and 4N
executors" (north rule).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    cores = int(sys.argv[1])
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    replicate = int(sys.argv[3]) if len(sys.argv) > 3 else 1

    from pdf_parser_spark.engine.corpus import synthesize_webdocs
    from pdf_parser_spark.engine.extractor import parse_webdocs
    from pdf_parser_spark.engine.session import build_session

    spark = build_session(
        f"scaling_{cores}",
        master=f"local[{cores}]",
        shuffle_partitions=cores * 2,
    )
    spark.sparkContext.setLogLevel("ERROR")

    webdocs = synthesize_webdocs(spark, sf_dir, replicate=replicate)
    # Materialize the corpus first so the timed section measures
    # extraction (the engine under test), not synthesis.
    corpus_path = f"/tmp/scaling_corpus_{os.getpid()}"
    webdocs.write.mode("overwrite").parquet(corpus_path)
    corpus = spark.read.parquet(corpus_path)
    n_docs = corpus.count()

    # Warm the Python worker pool (pandas/pyarrow/kernel imports) on a
    # small sample so the timed section measures steady-state
    # extraction, not one-time interpreter startup — on a long-lived
    # cluster the workers are warm.
    parse_webdocs(corpus.limit(256), num_partitions=cores).write.format(
        "noop"
    ).mode("overwrite").save()

    # Best-of-2 trials: the VM's noisy neighbors (hypervisor steal)
    # perturb single runs by tens of percent; the minimum wall is the
    # standard low-noise estimator for compute-bound jobs.
    walls = []
    for _ in range(2):
        t0 = time.perf_counter()
        # cores*8: ~8 task waves per slot absorbs salt-bucket size
        # variance (2 waves left the last wave straggler-bound:
        # measured 1.66x at local[8]); same rule as parse_webdocs's
        # default, spelled out here because cores is explicit.
        parse_webdocs(corpus, num_partitions=cores * 8).write.format(
            "noop"
        ).mode("overwrite").save()
        walls.append(time.perf_counter() - t0)
    wall = min(walls)

    print(
        json.dumps(
            {
                "cores": cores,
                "n_docs": n_docs,
                "wall_sec": round(wall, 2),
                "docs_per_sec": round(n_docs / wall, 2),
            }
        )
    )
    spark.stop()
    # each run otherwise leaves a ~GB corpus copy behind (one per pid)
    import shutil

    shutil.rmtree(corpus_path, ignore_errors=True)


if __name__ == "__main__":
    main()
