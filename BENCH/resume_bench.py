"""Resume-at-scale evidence (north rule: "resumes from the last
committed snapshot after failure").

Measures what a failure actually costs: a child process runs the
batched extraction (one transactional parquet append per url-hash
bucket — the sandbox analog of Iceberg snapshot commits) and is
SIGKILLed mid-run after a few commits; the parent then resumes the SAME
output directory and times the completion. The headline metric is

    resume_overhead = t_resume / (t_full × remaining_fraction)

i.e. how much the resumed run costs relative to the remaining work a
perfect resume would do. Target < 1.2 (the anti-join + per-batch job
overhead is the only extra work). Also asserts correctness: the resumed
table has exactly one row per url.

Two modes: ``antijoin`` (engine.resume — committed urls rediscovered by
a data scan + anti-join) and ``snapshot`` (engine.snapshots — committed
buckets come from the manifest log, a metadata-only read; the Iceberg
shape). The snapshot mode's overhead should sit closer to 1.0: resume
pays no committed-side scan at all.

Usage:  python BENCH/resume_bench.py [sf_dir] [replicate] [n_batches] [mode]
Child:  python BENCH/resume_bench.py --child <corpus> <out_dir> <n_batches> <mode>
"""

from __future__ import annotations

import json
import os
import shutil
import signal
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

KILL_AFTER_BATCHES = 3


def _extract_fn(mode: str):
    if mode == "snapshot":
        from pdf_parser_spark.engine.snapshots import snapshot_resumable_extract

        return snapshot_resumable_extract
    from pdf_parser_spark.engine.resume import batched_resumable_extract

    return batched_resumable_extract


def _committed_count(spark, out_dir: str, mode: str) -> int:
    if mode == "snapshot":
        from pdf_parser_spark.engine.snapshots import SnapshotLog

        df = SnapshotLog(out_dir).read(spark)
        return 0 if df is None else df.count()
    return spark.read.parquet(f"{out_dir}/parsed").count()


def _child(corpus_path: str, out_dir: str, n_batches: int, mode: str) -> None:
    from pdf_parser_spark.engine.session import build_session

    spark = build_session("resume_child")
    spark.sparkContext.setLogLevel("ERROR")
    corpus = spark.read.parquet(corpus_path)

    def report(b: int) -> None:
        print(f"BATCH {b} committed", flush=True)

    _extract_fn(mode)(
        spark, corpus, out_dir, n_batches=n_batches, on_batch=report
    )
    print("ALL DONE", flush=True)


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        _child(sys.argv[2], sys.argv[3], int(sys.argv[4]),
               sys.argv[5] if len(sys.argv) > 5 else "antijoin")
        return

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    replicate = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    n_batches = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    mode = sys.argv[4] if len(sys.argv) > 4 else "antijoin"
    extract = _extract_fn(mode)

    from pdf_parser_spark.engine.corpus import synthesize_webdocs
    from pdf_parser_spark.engine.session import _available_mem_gib, build_session

    spark = build_session("resume_bench")
    spark.sparkContext.setLogLevel("ERROR")

    scratch = (
        "/dev/shm"
        if os.path.isdir("/dev/shm") and _available_mem_gib() >= 16.0
        else "/tmp"
    )
    base = f"{scratch}/resume_bench_{os.getpid()}"
    corpus_path = f"{base}/corpus"
    synthesize_webdocs(spark, sf_dir, replicate=replicate).write.mode(
        "overwrite"
    ).parquet(corpus_path)
    corpus = spark.read.parquet(corpus_path)
    n_total = corpus.count()

    # warm the Python worker pool, then a full baseline run (same
    # batched path, same parquet sink — the denominator's unit cost)
    from pdf_parser_spark.engine.extractor import parse_webdocs

    parse_webdocs(corpus.limit(256)).write.format("noop").mode(
        "overwrite"
    ).save()
    t0 = time.perf_counter()
    extract(spark, corpus, f"{base}/full", n_batches=n_batches)
    t_full = time.perf_counter() - t0

    # crash run: child commits batches; SIGKILL the whole process group
    # (python + its JVM) after KILL_AFTER_BATCHES commits
    out_crash = f"{base}/crash"
    child = subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), "--child", corpus_path,
         out_crash, str(n_batches), mode],
        stdout=subprocess.PIPE,
        text=True,
        start_new_session=True,
    )
    committed_batches = 0
    for line in child.stdout:
        if line.startswith("BATCH"):
            committed_batches += 1
            if committed_batches >= KILL_AFTER_BATCHES:
                os.killpg(os.getpgid(child.pid), signal.SIGKILL)
                break
        if line.startswith("ALL DONE"):
            raise SystemExit("child finished before the kill — raise n_batches")
    child.wait()

    n_committed = _committed_count(spark, out_crash, mode)
    remaining_frac = (n_total - n_committed) / n_total

    t0 = time.perf_counter()
    final = extract(spark, corpus, out_crash, n_batches=n_batches)
    t_resume = time.perf_counter() - t0

    n_final = final.count()
    n_distinct = final.select("url").distinct().count()
    ok = n_final == n_total and n_distinct == n_total

    overhead = t_resume / (t_full * remaining_frac) if remaining_frac else float("inf")
    print(
        json.dumps(
            {
                "metric": "resume_overhead",
                "mode": mode,
                "value": round(overhead, 3),
                "unit": "x_of_remaining_work",
                "t_full_sec": round(t_full, 2),
                "t_resume_sec": round(t_resume, 2),
                "n_docs": n_total,
                "committed_before_kill": n_committed,
                "remaining_fraction": round(remaining_frac, 4),
                "n_batches": n_batches,
                "killed_after_batches": committed_batches,
                "resumed_table_exact": ok,
            }
        )
    )
    spark.stop()
    shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
