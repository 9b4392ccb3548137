#!/bin/sh
# Build dist/matric_spark.zip for `spark-submit --py-files`.
set -e
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/matric_spark.zip
# zip the package only (pure python, no data); main.py ships separately
python - <<'EOF'
import os, zipfile
with zipfile.ZipFile("dist/matric_spark.zip", "w", zipfile.ZIP_DEFLATED) as z:
    for root, _, files in os.walk("matric_spark"):
        if "__pycache__" in root:
            continue
        for f in files:
            if f.endswith(".py"):
                p = os.path.join(root, f)
                z.write(p, p)
print("wrote dist/matric_spark.zip")
EOF
