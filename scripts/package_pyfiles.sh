#!/usr/bin/env bash
# Package the engine for spark-submit --py-files distribution.
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/gchq_dq_spark.zip
python - << 'EOF'
import zipfile
from pathlib import Path

with zipfile.ZipFile("dist/gchq_dq_spark.zip", "w", zipfile.ZIP_DEFLATED) as zf:
    for path in sorted(Path("gchq_data_quality_spark").rglob("*.py")):
        zf.write(path, path.as_posix())
print("wrote dist/gchq_dq_spark.zip")
EOF
