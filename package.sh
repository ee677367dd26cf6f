#!/bin/sh
# Build the spark-submit distribution: dist/boon_spark.zip
# Usage: ./package.sh && spark-submit --py-files dist/boon_spark.zip \
#            jobs/validate_job.py --table ... --schema ...
set -e
cd "$(dirname "$0")"
mkdir -p dist
rm -f dist/boon_spark.zip
python - <<'EOF'
import os
import zipfile

with zipfile.ZipFile("dist/boon_spark.zip", "w", zipfile.ZIP_DEFLATED) as z:
    for root, _, files in os.walk("boon_spark"):
        if "__pycache__" in root:
            continue
        for f in files:
            if f.endswith(".py"):
                p = os.path.join(root, f)
                z.write(p, p)
print("wrote dist/boon_spark.zip")
EOF
