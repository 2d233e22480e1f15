#!/bin/bash
# Build the actual reference library (/root/reference/Library, unmodified)
# against the minimal IPP shim in this directory, plus the parity harness.
# Produces build/refbuild/ref_harness.
#
# Mirrors the reference build flags (reference CMakeLists.txt:23-31:
# -march=native -O3 -std=c++17 -DNDEBUG -ffast-math -Wno-narrowing) with
# USE_ATAN2_APPROX (non-Intel compiler path, reference CMakeLists.txt:36-41).
# AVX512 sources are included when the host supports avx512f/vl/bw/dq.
# AVX512FP16 needs no extra TU: Raisr.cpp #include-s Raisr_AVX512FP16.cpp
# under __AVX512FP16__ (Raisr.cpp:29-31), which -march=native defines on
# hosts with the avx512_fp16 flag — then asm=5 selects the half-precision
# pipeline (gAsmType == AVX512_FP16, Raisr.cpp:1492-1501).
set -e
cd "$(dirname "$0")/../.."
REF=${REFERENCE_ROOT:-/root/reference}
OUT=build/refbuild
mkdir -p "$OUT"

# -fcommon: Raisr_globals.h declares globals without extern (tentative
# definitions in every TU); modern gcc defaults to -fno-common.
FLAGS="-march=native -O3 -std=c++17 -DNDEBUG -ffast-math -Wno-narrowing -fPIC -DUSE_ATAN2_APPROX -fcommon"
INC="-isystem tools/refbuild -I$REF/Library"

SRCS="$REF/Library/Raisr.cpp $REF/Library/Raisr_AVX256.cpp $REF/Library/RaisrHandler.cpp"
if grep -q avx512vl /proc/cpuinfo && grep -q avx512bw /proc/cpuinfo; then
  SRCS="$SRCS $REF/Library/Raisr_AVX512.cpp"
fi

for src in $SRCS; do
  obj="$OUT/$(basename "${src%.cpp}").o"
  if [ ! -f "$obj" ] || [ "$src" -nt "$obj" ] || [ tools/refbuild/ipp.h -nt "$obj" ]; then
    echo "CXX $(basename "$src")"
    g++ $FLAGS $INC -c "$src" -o "$obj"
  fi
done

echo "CXX harness.cpp"
g++ $FLAGS $INC -c tools/refbuild/harness.cpp -o "$OUT/harness.o"
# Raisr_globals.h defines a few non-static globals (identical constant
# tables + zero-init pointers) in every TU; merge them first-definition-wins
# (the pre-gcc-10 -fcommon behaviour the reference build relies on).
g++ $FLAGS -Wl,--allow-multiple-definition "$OUT"/*.o -o "$OUT/ref_harness" -lpthread
echo "built $OUT/ref_harness"
