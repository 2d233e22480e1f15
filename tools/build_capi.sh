#!/bin/bash
# Build libraisr_tpu.so (C ABI) and run the C smoke test.
set -e
cd "$(dirname "$0")/.."

cmake -S raisr_tpu/native -B build/capi -DCMAKE_BUILD_TYPE=Release >/dev/null
cmake --build build/capi --parallel >/dev/null
echo "built build/capi/libraisr_tpu.so"

cc tools/capi_smoke.c -Iinclude -Lbuild/capi -lraisr_tpu -o build/capi/capi_smoke
cc tools/capi_y4m.c -Iinclude -Lbuild/capi -lraisr_tpu -o build/capi/capi_y4m
JAX_PLATFORMS=cpu LD_LIBRARY_PATH=build/capi ./build/capi/capi_smoke "$@"
