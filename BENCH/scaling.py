"""Two-cluster-size scaling evidence (north rule: efficiency ≥ 0.8
from N to 4N).

No real cluster exists in the sandbox, so the same job runs at two
parallelism levels — local[8] and local[32] — on the same materialized
input, each in a fresh JVM (BENCH/run_extraction.py). Writes
BENCH/BASELINE.md with throughput at both levels and the scaling
efficiency  eff = (T8 / T32) / (32 / 8).

Usage: python BENCH/scaling.py [sf_dir] [replicate]
"""

from __future__ import annotations

import json
import subprocess
import sys
from datetime import date
from pathlib import Path

HERE = Path(__file__).parent


def run(cores: int, sf_dir: str, replicate: int) -> dict:
    out = subprocess.run(
        [sys.executable, str(HERE / "run_extraction.py"), str(cores), sf_dir,
         str(replicate)],
        capture_output=True, text=True, check=True,
    )
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    replicate = int(sys.argv[2]) if len(sys.argv) > 2 else 2

    low = run(8, sf_dir, replicate)
    high = run(32, sf_dir, replicate)
    speedup = low["wall_sec"] / high["wall_sec"]
    eff = speedup / (32 / 8)

    md = f"""# Scaling evidence (N vs 4N parallelism)

Date: {date.today().isoformat()} · input: `{sf_dir}` × replicate {replicate}
({high['n_docs']} docs) · same job, same input, fresh JVM per level
(sandbox proxy for spark-submit at N and 4N executors — north rule).

| parallelism | docs | wall (s) | docs/sec |
|---|---|---|---|
| local[8]  (N)  | {low['n_docs']} | {low['wall_sec']} | {low['docs_per_sec']} |
| local[32] (4N) | {high['n_docs']} | {high['wall_sec']} | {high['docs_per_sec']} |

- speedup 8→32 cores: **{speedup:.2f}×** (ideal 4×)
- scaling efficiency: **{eff:.2f}** (target ≥ 0.8)

Method: corpus synthesized once and materialized to parquet before
timing; the timed section is the salted mapInPandas extraction pipeline
ending in a noop sink (no driver collect). Parallelism enters only via
`local[k]` and shuffle partitions = 2k.
"""
    (HERE / "BASELINE.md").write_text(md)
    print(md)
    print(json.dumps({"low": low, "high": high, "efficiency": round(eff, 3)}))


if __name__ == "__main__":
    main()
