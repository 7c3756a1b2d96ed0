#!/bin/bash
# Build the reference's cpp_wrappers OUT OF TREE and assemble the shadow
# tree used by scripts/run_reference_baseline.py (/root/reference is
# read-only; numpy>=2 needs PyArray_* casts). Idempotent.
set -euo pipefail

REF=${REF:-/root/reference}
BUILD=${BUILD:-/tmp/refbuild}
SHADOW=${SHADOW:-/tmp/refshadow}
PY=${PY:-/opt/venv/bin/python}

if [ -f "$SHADOW/.shadow_ok" ]; then
    echo "shadow already built at $SHADOW"
    exit 0
fi

rm -rf "$BUILD" "$SHADOW"
mkdir -p "$BUILD"
cp -r "$REF/cpp_wrappers" "$BUILD/cpp_wrappers"

# numpy>=2: PyArray_* accessors require PyArrayObject*, the torch-1.4-era
# wrappers pass PyObject*.
sed -i -E 's/PyArray_(DATA|NDIM|DIM|SIZE|TYPE)\(([a-zA-Z_][a-zA-Z0-9_.]*)\)/PyArray_\1((PyArrayObject*)\2)/g; s/PyArray_DIM\(([a-zA-Z_][a-zA-Z0-9_]*),/PyArray_DIM((PyArrayObject*)\1,/g' \
    "$BUILD"/cpp_wrappers/cpp_subsampling/wrapper.cpp \
    "$BUILD"/cpp_wrappers/cpp_neighbors/wrapper.cpp

NUMPY_INC=$($PY -c "import numpy; print(numpy.get_include())")
PY_INC=$($PY -c "import sysconfig; print(sysconfig.get_paths()['include'])")
EXT=$($PY -c "import sysconfig; print(sysconfig.get_config_var('EXT_SUFFIX'))")

g++ -shared -fPIC -O3 -std=c++11 -w \
    "$BUILD"/cpp_wrappers/cpp_subsampling/grid_subsampling/grid_subsampling.cpp \
    "$BUILD"/cpp_wrappers/cpp_utils/cloud/cloud.cpp \
    "$BUILD"/cpp_wrappers/cpp_subsampling/wrapper.cpp \
    -I"$NUMPY_INC" -I"$PY_INC" \
    -o "$BUILD/cpp_wrappers/cpp_subsampling/grid_subsampling$EXT"

g++ -shared -fPIC -O3 -std=c++11 -w \
    "$BUILD"/cpp_wrappers/cpp_neighbors/neighbors/neighbors.cpp \
    "$BUILD"/cpp_wrappers/cpp_utils/cloud/cloud.cpp \
    "$BUILD"/cpp_wrappers/cpp_neighbors/wrapper.cpp \
    -I"$NUMPY_INC" -I"$PY_INC" \
    -o "$BUILD/cpp_wrappers/cpp_neighbors/radius_neighbors$EXT"

mkdir -p "$SHADOW"
ln -s "$REF"/* "$SHADOW"/ 2>/dev/null || true
ln -sfn "$BUILD/cpp_wrappers" "$SHADOW/cpp_wrappers"

# The reference's flat packages (datasets/, models/, utils/, kernels/) are
# namespace packages; site-packages ships a regular `datasets` (HuggingFace)
# which always wins over namespace portions. Materialize them as regular
# packages: real dir + per-file symlinks + empty __init__.py.
for pkg in datasets models utils kernels; do
    rm -f "$SHADOW/$pkg"
    mkdir -p "$SHADOW/$pkg"
    ln -s "$REF/$pkg"/* "$SHADOW/$pkg"/
    touch "$SHADOW/$pkg/__init__.py"
done

$PY - <<EOF
import sys
sys.path.insert(0, "$SHADOW")
import numpy as np
from cpp_wrappers.cpp_subsampling import grid_subsampling as gs
from cpp_wrappers.cpp_neighbors import radius_neighbors as rn
pts = np.random.rand(1000, 3).astype(np.float32)
s = gs.subsample(pts, sampleDl=0.1, verbose=0)
n = rn.batch_query(pts, pts, np.array([1000], np.int32),
                   np.array([1000], np.int32), radius=0.2)
print("smoke ok:", s.shape, n.shape)
EOF

touch "$SHADOW/.shadow_ok"
echo "shadow built at $SHADOW"
