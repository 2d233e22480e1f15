#!/usr/bin/env bash
# Build the shim_filter harness: the REAL vf_raisr_tpu.c compiled against
# genuine libavutil plus the functional mini-libavfilter in shim_harness.c,
# linked to libraisr_tpu.so. Produces build/capi/shim_filter.
#
# Requires: libavutil-dev (headers + lib) and a built C ABI
# (tools/build_capi.sh). Exit 77 = prerequisites missing (skip).
set -euo pipefail
cd "$(dirname "$0")/.."

AVUTIL_INC=""
for d in /usr/include/x86_64-linux-gnu /usr/include; do
    if [ -f "$d/libavutil/frame.h" ]; then AVUTIL_INC="$d"; break; fi
done
if [ -z "$AVUTIL_INC" ]; then
    echo "SKIP: libavutil-dev headers not found" >&2
    exit 77
fi
if [ ! -f build/capi/libraisr_tpu.so ]; then
    echo "SKIP: build/capi/libraisr_tpu.so not built (run tools/build_capi.sh)" >&2
    exit 77
fi

gcc ffmpeg/vf_raisr_tpu.c ffmpeg/shim_harness.c -o build/capi/shim_filter \
    -std=c11 -Wall -Werror -Wno-unused-function \
    -I ffmpeg/compile_shim -I "$AVUTIL_INC" -I include \
    -L build/capi -lraisr_tpu -lavutil
echo "built build/capi/shim_filter"
