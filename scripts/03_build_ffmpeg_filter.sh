#!/bin/bash
# Stage 3: FFmpeg filter (vf_raisr_tpu).
#
# Reference analogue: scripts/03_build_raisr_ffmpeg.sh (patches an FFmpeg
# tree with vf_raisr and builds it). Ours has the same two modes:
#
#   with an FFmpeg source tree:   scripts/03_build_ffmpeg_filter.sh /path/to/ffmpeg
#       patches the tree (ffmpeg/apply_to_tree.sh) and runs the minimal
#       configure+make documented in ffmpeg/build_ffmpeg_ci.sh.
#
#   without a tree (default):     scripts/03_build_ffmpeg_filter.sh
#       type-checks vf_raisr_tpu.c against the installed libavutil headers
#       and builds + runs the functional shim harness (a real filter
#       execution, byte-compared against the CLI in tests/test_capi.py).
. "$(dirname "$0")/common.sh"

cd "$REPO_ROOT"

TREE="${1:-}"

if [ -n "$TREE" ]; then
    [ -d "$TREE/libavfilter" ] || die "$TREE does not look like an FFmpeg source tree"
    log "patching FFmpeg tree $TREE and building"
    ffmpeg/apply_to_tree.sh "$TREE" || die "patch failed (ffmpeg/apply_to_tree.sh)"
    FFMPEG_TREE="$TREE" ffmpeg/build_ffmpeg_ci.sh || die "FFmpeg build failed"
    log "FFmpeg build done — filter available as -vf raisr_tpu"
    exit 0
fi

log "no FFmpeg tree given — compile-checking the filter against installed headers"
ffmpeg/compile_check.sh || die "vf_raisr_tpu.c failed to compile (ffmpeg/compile_check.sh)"
log "filter compile check OK (run the full harness via: pytest tests/test_capi.py -k ffmpeg)"
