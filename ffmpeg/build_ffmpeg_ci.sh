#!/bin/bash
# Clone FFmpeg (default n6.1.1 — the tag the reference builds against,
# /root/reference/docker/Xeon/Dockerfile.ubuntu22.04:17), integrate the
# raisr_tpu filter, build the ffmpeg binary, and smoke-test it:
#   1. ffmpeg -h filter=raisr_tpu          (registration, option surface)
#   2. 2-frame Y4M transcode through raisr_tpu, byte-compared against the
#      `raisr upscale` CLI on the same input
#
# Prereqs: build/capi/libraisr_tpu.so built (tools/build_capi.sh), python
# with the raisr_tpu package + jax importable, network access, nasm/yasm.
#
# Usage: ffmpeg/build_ffmpeg_ci.sh [workdir] [filterfolder]
set -ex
REPO=$(cd "$(dirname "$0")/.." && pwd)
WORK=${1:-/tmp/ffmpeg_raisr}
FILTERS=${2:-/tmp/test_bank}   # tools/make_test_bank.py output (or a real bank)
TAG=${FFMPEG_TAG:-n6.1.1}
[ -d "$FILTERS" ] || python3 "$REPO/tools/make_test_bank.py" "$FILTERS"

test -f "$REPO/build/capi/libraisr_tpu.so"

mkdir -p "$WORK"
cd "$WORK"
if [ ! -d ffmpeg ]; then
  git clone --depth 1 --branch "$TAG" https://github.com/FFmpeg/FFmpeg.git ffmpeg
fi
cd ffmpeg
cp "$REPO/ffmpeg/vf_raisr_tpu.c" libavfilter/

# Prefer the shipped patch; fall back to anchored content edits if its
# hunk offsets don't match this tree.
if git apply --check "$REPO/ffmpeg/0001-add-raisr-tpu-filter.patch" 2>/dev/null; then
  git apply "$REPO/ffmpeg/0001-add-raisr-tpu-filter.patch"
  echo "patch applied cleanly"
else
  echo "patch offsets drifted; using anchored edits"
  "$REPO/ffmpeg/apply_to_tree.sh" .
fi

# Minimal component set: y4m in/out + the filter under test. Falls back to
# a default (full) configure if the minimal set misses a dependency.
CONF_COMMON=(
  --disable-doc --disable-autodetect --disable-network
  --enable-libraisr_tpu
  --extra-cflags=-I"$REPO/include"
  --extra-ldflags=-L"$REPO/build/capi"
  --extra-libs=-lraisr_tpu
)
if ! ./configure "${CONF_COMMON[@]}" \
    --disable-everything --enable-avfilter --enable-ffmpeg \
    --enable-protocol=file,pipe \
    --enable-demuxer=yuv4mpegpipe --enable-muxer=yuv4mpegpipe,null \
    --enable-decoder=rawvideo --enable-encoder=rawvideo \
    --enable-filter=raisr_tpu,format,scale,null,copy; then
  tail -30 ffbuild/config.log || true
  ./configure "${CONF_COMMON[@]}"
fi
make -j"$(nproc)" ffmpeg

export LD_LIBRARY_PATH="$REPO/build/capi:${LD_LIBRARY_PATH:-}"
export RAISR_TPU_PYTHONPATH="$REPO"

# 1. registration + option surface (mirrors the reference images'
#    `ffmpeg -h filter=raisr` check, Dockerfile.ubuntu22.04:111)
./ffmpeg -hide_banner -h filter=raisr_tpu | tee /tmp/raisr_tpu_help.txt
grep -q filterfolder /tmp/raisr_tpu_help.txt
grep -q passes /tmp/raisr_tpu_help.txt

# 2. 2-frame Y4M transcode vs the raisr CLI (byte-identical output planes)
python3 - <<'PY'
import numpy as np
w, h, n = 64, 48, 2
rng = np.random.default_rng(11)
with open("/tmp/raisr_ffmpeg_in.y4m", "wb") as f:
    f.write(b"YUV4MPEG2 W64 H48 F30:1 Ip A1:1 C420jpeg\n")
    for _ in range(n):
        f.write(b"FRAME\n")
        f.write(rng.integers(16, 235, w * h, dtype=np.uint8).tobytes())
        f.write(rng.integers(16, 240, (w // 2) * (h // 2) * 2,
                             dtype=np.uint8).tobytes())
PY
./ffmpeg -hide_banner -y -i /tmp/raisr_ffmpeg_in.y4m \
    -vf "raisr_tpu=ratio=2:passes=1:filterfolder=$FILTERS" \
    /tmp/raisr_ffmpeg_out.y4m
python3 -m raisr_tpu.cli upscale -i /tmp/raisr_ffmpeg_in.y4m \
    -o /tmp/raisr_cli_out.y4m --filterfolder "$FILTERS" --passes 1
python3 - <<'PY'
from raisr_tpu import video
import numpy as np
a = video.open_reader("/tmp/raisr_ffmpeg_out.y4m")
b = video.open_reader("/tmp/raisr_cli_out.y4m")
n = 0
for fa, fb in zip(a, b):
    for pa, pb, name in ((fa.y, fb.y, "y"), (fa.u, fb.u, "u"), (fa.v, fb.v, "v")):
        assert np.array_equal(pa, pb), (n, name, np.abs(
            pa.astype(int) - pb.astype(int)).max())
    n += 1
assert n == 2, n
print("ffmpeg filter output byte-identical to raisr CLI over", n, "frames")
PY
echo "FFmpeg raisr_tpu filter: build + registration + transcode parity OK"
