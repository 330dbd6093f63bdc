#!/bin/bash
# Build the reference-baseline driver: compiles the UNMODIFIED reference
# solver sources against the ROS-free stub headers in ./stubs.
# REF defaults to /root/reference; override for other checkouts.
set -e
cd "$(dirname "$0")"
REF="${REF:-/root/reference}"
OUT="${OUT:-build}"
mkdir -p "$OUT"
CXXFLAGS="-std=c++17 -O3 -ftree-vectorize -ffast-math -fno-finite-math-only \
  -Wno-deprecated-declarations -Wno-return-type \
  -Istubs -I$REF/src -I$REF/include"
g++ $CXXFLAGS -c "$REF/src/ik_evolution_2.cpp" -o "$OUT/ik_evolution_2.o"
g++ $CXXFLAGS -c "$REF/src/ik_evolution_1.cpp" -o "$OUT/ik_evolution_1.o"
g++ $CXXFLAGS -c "$REF/src/ik_gradient.cpp" -o "$OUT/ik_gradient.o"
g++ $CXXFLAGS -c "$REF/src/problem.cpp" -o "$OUT/problem.o"
g++ $CXXFLAGS -c driver.cpp -o "$OUT/driver.o"
g++ $CXXFLAGS "$OUT/ik_evolution_2.o" "$OUT/ik_evolution_1.o" \
  "$OUT/ik_gradient.o" "$OUT/problem.o" "$OUT/driver.o" \
  -o "$OUT/ref_driver" -lpthread
echo "built $OUT/ref_driver"
