#!/usr/bin/env bash
# Package the engine for spark-submit --py-files.
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/flexgraph_spark.zip
python - <<'EOF'
import zipfile
from pathlib import Path

with zipfile.ZipFile("dist/flexgraph_spark.zip", "w", zipfile.ZIP_DEFLATED) as z:
    for p in sorted(Path("flexgraph_spark").glob("*.py")):
        z.write(p, p.as_posix())
print("wrote dist/flexgraph_spark.zip")
EOF
