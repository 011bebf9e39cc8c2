#!/usr/bin/env bash
# Package the engine and run it under `spark-submit --py-files` — the
# deployment shape the scaling rule names. Identical on a real cluster:
# set SPARK_MASTER (or edit --master) to yarn / k8s:// / spark:// and the
# same zip + driver run unchanged across executors.
#
#   scripts/submit.sh --synthetic 120 --max-urls 60 --threads 20 \
#       --output /tmp/crawl_out
#
# Any arguments are passed through to the CLI (see
# `python -m crawler_seo_spark --help`).
set -euo pipefail

REPO="$(cd "$(dirname "$0")/.." && pwd)"
MASTER="${SPARK_MASTER:-local[8]}"
STAGE="$(mktemp -d)"
trap 'rm -rf "$STAGE"' EXIT
ZIP="$STAGE/crawler_seo_spark.zip"

# stdlib zip of the pure-Python package — no build backend needed
(cd "$REPO" && python - "$ZIP" <<'EOF'
import sys
import zipfile
from pathlib import Path

with zipfile.ZipFile(sys.argv[1], "w", zipfile.ZIP_DEFLATED) as z:
    for p in sorted(Path("crawler_seo_spark").rglob("*.py")):
        z.write(p, p.as_posix())
EOF
)

exec spark-submit --master "$MASTER" --py-files "$ZIP" \
    "$REPO/scripts/submit_main.py" "$@"
