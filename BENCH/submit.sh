#!/usr/bin/env bash
# Launch the extraction job the way the north rule mandates:
#   spark-submit --py-files <package zip> <job>
# Usage: BENCH/submit.sh [cores] [sf_dir] [replicate]
set -euo pipefail
cd "$(dirname "$0")/.."

CORES="${1:-8}"
SF_DIR="${2:-/root/testdata/sf0.1}"
REPLICATE="${3:-1}"

ZIP=/tmp/pdf_parser_spark.zip
rm -f "$ZIP"
# package the engine exactly as it would ship to executors
python - <<EOF
import zipfile, pathlib
root = pathlib.Path("pdf_parser_spark")
with zipfile.ZipFile("$ZIP", "w") as z:
    for p in sorted(root.rglob("*.py")):
        z.write(p, p.as_posix())
print("packaged", "$ZIP")
EOF

exec spark-submit \
  --master "local[$CORES]" \
  --py-files "$ZIP" \
  --conf spark.sql.shuffle.partitions=$((CORES * 2)) \
  --conf spark.sql.execution.arrow.pyspark.enabled=true \
  --conf spark.ui.showConsoleProgress=false \
  BENCH/run_extraction.py "$CORES" "$SF_DIR" "$REPLICATE"
