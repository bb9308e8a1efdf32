#!/usr/bin/env bash
# Build the reference (tum-vision/LDSO, mounted read-only at /root/reference)
# headless in this container, for the CPU baseline + head-to-head benches
# recorded in BASELINE.md. Round 1 did this by hand; this script makes it
# reproducible (VERDICT r2 asked for the recipe to live in the repo).
#
# Container substitutions (nothing is installed):
#   Eigen    -> the TensorFlow wheel's bundled copy
#   OpenCV   -> system libopencv (4.6, present in the image)
#   glog / libzip / boost::format / Pangolin -> tools/ref_shims/ no-op shims
#   DSOViewer.cc -> excluded; viewer_stub.cc provides no-op classes
#
# Usage: tools/build_reference.sh [builddir]   (default /tmp/refbuild)
# Produces: $BUILD/run_dso_tum_mono
set -euo pipefail

REF=/root/reference
SHIM="$(cd "$(dirname "$0")" && pwd)/ref_shims"
BUILD="${1:-/tmp/refbuild}"
EIGEN=/opt/venv/lib/python3.12/site-packages/tensorflow/include
NPROC=$(nproc)

mkdir -p "$BUILD/obj"
cd "$BUILD"

CXX=${CXX:-g++}
# -include: DBoW3's and DSOViewer's headers rely on <ostream>/<string>/
# <deque> arriving transitively via older OpenCV/Pangolin headers
CXXFLAGS="-O3 -march=native -mno-avx512fp16 -std=c++14 -w -pthread
  -include string -include ostream -include deque -include map -include unistd.h
  -I$SHIM
  -I$REF/include
  -I$REF/examples
  -I$REF/thirdparty
  -I$REF/thirdparty/sophus
  -I$REF/thirdparty/g2o
  -I$EIGEN
  -I/usr/include/opencv4"

SRCS=$(ls "$REF"/src/*.cc "$REF"/src/frontend/*.cc "$REF"/src/internal/*.cc \
          "$REF"/src/internal/OptimizationBackend/*.cc 2>/dev/null \
       | grep -v DSOViewer.cc)
SRCS="$SRCS $SHIM/viewer_stub.cc"
SRCS="$SRCS $(ls "$REF"/thirdparty/DBoW3/src/*.cpp)"
SRCS="$SRCS $(ls "$REF"/thirdparty/DBoW3/src/*.c 2>/dev/null || true)"
# g2o: core + stuff + ONLY the two type files LDSO includes
# (g2o/types/{vertex,edge}_pointxyz.h via internal/PR.h); the rest of the
# vendored slam3d types don't compile against the TF-bundled Eigen and are
# unused by LDSO.
SRCS="$SRCS $(ls "$REF"/thirdparty/g2o/g2o/core/*.cpp \
                 "$REF"/thirdparty/g2o/g2o/stuff/*.cpp \
                 "$REF"/thirdparty/g2o/g2o/stuff/*.c 2>/dev/null \
              | grep -v sparse_block_matrix_test)"
SRCS="$SRCS $REF/thirdparty/g2o/g2o/types/vertex_pointxyz.cpp"
SRCS="$SRCS $REF/thirdparty/g2o/g2o/types/edge_pointxyz.cpp"

echo "compiling $(echo "$SRCS" | wc -w) translation units with -j$NPROC ..."
PIDS=0
OBJS=""
i=0
for s in $SRCS; do
    o="obj/$(echo "$s" | tr '/.' '__').o"
    OBJS="$OBJS $o"
    if [ ! -f "$o" ] || [ "$s" -nt "$o" ]; then
        $CXX $CXXFLAGS -c "$s" -o "$o" &
        i=$((i + 1))
        if [ $((i % NPROC)) -eq 0 ]; then wait; fi
    fi
done
wait

for exe in run_dso_tum_mono; do
    echo "linking $exe ..."
    $CXX $CXXFLAGS "$REF/examples/$exe.cc" $OBJS -o "$exe" \
        -lopencv_core -lopencv_imgproc -lopencv_imgcodecs -lopencv_highgui \
        -lopencv_calib3d -lpthread
done
echo "OK: $BUILD/run_dso_tum_mono"
