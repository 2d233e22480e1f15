#!/usr/bin/env bash
# Type-check vf_raisr_tpu.c under a real compiler WITHOUT an FFmpeg tree:
# the REAL libavutil headers (libavutil-dev) supply AVFrame/AVOption/pixdesc
# and friends; ffmpeg/compile_shim/ supplies the minimal libavfilter surface.
# This catches type and API errors in the filter's frame loop locally; the
# authoritative full build against a genuine FFmpeg n6.x tree runs in CI
# (ffmpeg/build_ffmpeg_ci.sh).
set -euo pipefail
cd "$(dirname "$0")"

AVUTIL_INC=""
for d in /usr/include/x86_64-linux-gnu /usr/include; do
    if [ -f "$d/libavutil/frame.h" ]; then AVUTIL_INC="$d"; break; fi
done
if [ -z "$AVUTIL_INC" ]; then
    echo "SKIP: libavutil-dev headers not found" >&2
    exit 77
fi

out=$(mktemp /tmp/vf_raisr_tpu_XXXX.o)
trap 'rm -f "$out"' EXIT
gcc -c vf_raisr_tpu.c -o "$out" \
    -std=c11 -Wall -Werror -Wno-unused-function \
    -I compile_shim -I "$AVUTIL_INC" -I ../include
echo "OK: vf_raisr_tpu.c compiles against real libavutil headers"
