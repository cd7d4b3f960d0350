"""North-rule launch mode: the job really runs under spark-submit with
the package delivered via --py-files (tools/spark_submit.sh). One JVM
launch covers the whole chain: zip-only package delivery (no repo on
PYTHONPATH, foreign CWD) → extraction → snapshot-log commits."""

import json
import os
import subprocess

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_spark_submit_pyfiles_end_to_end(tmp_path):
    out_dir = str(tmp_path / "snap")
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env["SPARK_GRAFT_DRIVER_MEM"] = "4g"
    res = subprocess.run(
        [
            "bash",
            os.path.join(REPO, "tools", "spark_submit.sh"),
            "2",
            "/root/testdata/sf0.001",
            "1",
            out_dir,
        ],
        capture_output=True,
        text=True,
        cwd=str(tmp_path),  # foreign CWD: the zip is the only source
        env=env,
        timeout=420,
    )
    assert res.returncode == 0, res.stderr[-2000:]
    line = [l for l in res.stdout.splitlines() if l.startswith("{")][-1]
    d = json.loads(line)
    assert d["launcher"] == "spark-submit --py-files"
    assert d["n_docs"] == 500
    assert d["n_out"] == 500
    assert d["snapshot_log"] is True
    assert d["value"] > 0

    # the run committed through the snapshot log: 8 manifests + pointer
    from pdf_parser_spark.engine.snapshots import SnapshotLog

    log = SnapshotLog(out_dir)
    assert log.latest_version() == 7
    assert log.committed_buckets() == set(range(8))
    assert sum(s.metrics["n_docs"] for s in log.chain()) == 500
