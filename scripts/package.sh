#!/usr/bin/env bash
# Build dist/micro_lab_ocr_spark.zip for `spark-submit --py-files` (SURVEY §7.4).
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/micro_lab_ocr_spark.zip
python - <<'EOF'
import os
import zipfile

with zipfile.ZipFile("dist/micro_lab_ocr_spark.zip", "w", zipfile.ZIP_DEFLATED) as zf:
    for root, _dirs, files in os.walk("micro_lab_ocr_spark"):
        if "__pycache__" in root:
            continue
        for f in files:
            if f.endswith(".py"):
                p = os.path.join(root, f)
                zf.write(p, p)
print("wrote dist/micro_lab_ocr_spark.zip")
EOF
echo "usage: spark-submit --py-files dist/micro_lab_ocr_spark.zip jobs/extract.py --docs ... --media ... --output ... --checkpoint ..."
