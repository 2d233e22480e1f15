#!/bin/bash
# Integrate the raisr_tpu filter into an FFmpeg source tree by anchored,
# content-based edits (fallback for when the line offsets in
# 0001-add-raisr-tpu-filter.patch drift across FFmpeg releases).
#
# Usage: apply_to_tree.sh <ffmpeg-tree>   (vf_raisr_tpu.c must already be
# copied into <ffmpeg-tree>/libavfilter/)
#
# Performs the same three edits as the patch (see the patch header):
#   configure            — register the libraisr_tpu external library,
#                          filter dep, and link check
#   libavfilter/Makefile — OBJS line
#   libavfilter/allfilters.c — extern declaration
set -e
TREE=${1:?usage: apply_to_tree.sh <ffmpeg-tree>}
cd "$TREE"

[ -f libavfilter/vf_raisr_tpu.c ] || {
  echo "copy vf_raisr_tpu.c into $TREE/libavfilter/ first" >&2; exit 1; }

if grep -q libraisr_tpu configure; then
  echo "configure already patched"
else
  # EXTERNAL_LIBRARY_LIST entry (anchor: librav1e, present since n4.3)
  sed -i 's/^    librav1e$/    librav1e\n    libraisr_tpu/' configure
  # filter dep + link requirement (anchor: the librav1e require line)
  sed -i '/^enabled librav1e/i\
enabled libraisr_tpu      \&\& require libraisr_tpu raisr_tpu.h RTPU_Init -lraisr_tpu' configure
  sed -i '/^pan_filter_deps=/a\
raisr_tpu_filter_deps="libraisr_tpu"' configure
fi
grep -q '^    libraisr_tpu$' configure
grep -q '^raisr_tpu_filter_deps=' configure
grep -q '^enabled libraisr_tpu' configure

if grep -q RAISR_TPU_FILTER libavfilter/Makefile; then
  echo "Makefile already patched"
else
  sed -i '/OBJS-\$(CONFIG_QP_FILTER)/a\
OBJS-$(CONFIG_RAISR_TPU_FILTER)              += vf_raisr_tpu.o' libavfilter/Makefile
fi
grep -q RAISR_TPU_FILTER libavfilter/Makefile

if grep -q ff_vf_raisr_tpu libavfilter/allfilters.c; then
  echo "allfilters.c already patched"
else
  sed -i '/extern const AVFilter ff_vf_qp;/a\
extern const AVFilter ff_vf_raisr_tpu;' libavfilter/allfilters.c
fi
grep -q ff_vf_raisr_tpu libavfilter/allfilters.c

echo "raisr_tpu filter integrated into $TREE"
