#!/bin/sh
# Package the engine for spark-submit --py-files (reference A14/A16 analogue:
# the job ships to the cluster instead of re-invoking a container CLI).
set -e
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/cloudtile_spark.zip
python - <<'EOF'
import zipfile, pathlib
root = pathlib.Path("cloudtile_spark")
with zipfile.ZipFile("dist/cloudtile_spark.zip", "w") as z:
    for p in sorted(root.rglob("*")):
        if p.suffix in (".py", ".yaml") and "__pycache__" not in str(p):
            z.write(p, p)
print("dist/cloudtile_spark.zip written")
EOF
