#!/usr/bin/env bash
# North-rule launch mode: package pdf_parser_spark into a zip and launch
# the extraction job via spark-submit --py-files. The package reaches
# the driver and executors ONLY through the zip (works from any CWD,
# no repo on PYTHONPATH). On a cluster, swap --master for the cluster
# URL; everything else is identical.
#
# Usage: tools/spark_submit.sh <cores> [sf_dir] [replicate] [out_dir]
set -euo pipefail

REPO="$(cd "$(dirname "$0")/.." && pwd)"
CORES="${1:?usage: spark_submit.sh <cores> [sf_dir] [replicate] [out_dir]}"
SF="${2:-/root/testdata/sf0.001}"
REP="${3:-1}"
OUT="${4:-}"

STAGE="$(mktemp -d)"
trap 'rm -rf "$STAGE"' EXIT
ZIP="$STAGE/pdf_parser_spark.zip"
python - "$REPO" "$ZIP" <<'EOF'
import os, sys, zipfile
repo, zpath = sys.argv[1], sys.argv[2]
with zipfile.ZipFile(zpath, "w", zipfile.ZIP_DEFLATED) as z:
    pkg = os.path.join(repo, "pdf_parser_spark")
    for root, dirs, files in os.walk(pkg):
        dirs[:] = [d for d in dirs if d != "__pycache__"]
        for f in files:
            if f.endswith(".py"):
                p = os.path.join(root, f)
                z.write(p, os.path.relpath(p, repo))
EOF

SUBMIT="${SPARK_HOME:-/opt/spark}/bin/spark-submit"
exec "$SUBMIT" \
  --master "local[$CORES]" \
  --driver-memory "${SPARK_GRAFT_DRIVER_MEM:-16g}" \
  --py-files "$ZIP" \
  "$REPO/tools/submit_job.py" "$CORES" "$SF" "$REP" $OUT
