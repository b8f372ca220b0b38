#!/bin/bash
# Build the REFERENCE renderer (/root/reference, read-only) into /tmp/refbuild
# so golden images for tests/goldens can be (re)generated. The source is used
# as-is; only the missing third-party headers are supplied:
#   - glm  -> tools/refbuild/glm_shim (original mini-implementation)
#   - Eigen -> the copy vendored inside the installed tensorflow package
# Usage: tools/refbuild/build.sh   ->  /tmp/refbuild/raytracer
# NOTE: run the binary with a ./-prefixed or absolute scene path from the
# scene's own directory, or relative plyFile paths inside the XML break.
set -euo pipefail
HERE="$(cd "$(dirname "$0")" && pwd)"
SRC=/root/reference/src
OUT=/tmp/refbuild
EIGEN=$(python - <<'PY'
import glob
print(glob.glob('/opt/venv/lib/python3.12/site-packages/tensorflow/include')[0])
PY
)
mkdir -p "$OUT"
cp "$SRC"/*.cpp "$SRC"/*.h "$OUT"/
g++ "$OUT"/*.cpp -std=c++14 -O2 -w \
    -I "$EIGEN" -I "$HERE/glm_shim" \
    -lpthread -ljpeg -lpng -o "$OUT/raytracer"
echo "built $OUT/raytracer"
