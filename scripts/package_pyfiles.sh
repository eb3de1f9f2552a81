#!/bin/sh
# Build dist/atra_spark.zip for spark-submit --py-files.
set -e
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/atra_spark.zip
python - <<'EOF'
import os
import zipfile

with zipfile.ZipFile("dist/atra_spark.zip", "w", zipfile.ZIP_DEFLATED) as z:
    for root, dirs, files in os.walk("atra_spark"):
        dirs[:] = [d for d in dirs if d != "__pycache__"]
        for f in files:
            if f.endswith(".py") or f.endswith(".dat") or f.endswith(".txt"):
                p = os.path.join(root, f)
                z.write(p, p)
print("wrote dist/atra_spark.zip")
EOF
