#!/bin/sh
# Package the engine for spark-submit --py-files.
set -e
cd "$(dirname "$0")/.."
rm -f dist/geospark.zip
mkdir -p dist
python - <<'EOF'
import os, zipfile
with zipfile.ZipFile("dist/geospark.zip", "w", zipfile.ZIP_DEFLATED) as z:
    for root, dirs, files in os.walk("geospark"):
        dirs[:] = [d for d in dirs if d != "__pycache__"]
        for f in files:
            if f.endswith(".py"):
                p = os.path.join(root, f)
                z.write(p, p)
print("dist/geospark.zip written")
EOF
echo "usage: spark-submit --py-files dist/geospark.zip --conf ... your_job.py"
