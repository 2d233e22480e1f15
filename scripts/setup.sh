#!/bin/bash
# One-shot environment bootstrap: runs the staged scripts in order.
# Analogue of the reference's build.sh + scripts/01..03 flow
# (01_pull_resources / 02_install_prerequisites / 03_build_raisr_ffmpeg);
# this framework has no downloadable prerequisites, so stage 1 verifies
# the image instead of pulling resources.
#
# Usage: scripts/setup.sh [filter-bank-dir] [ffmpeg-tree]
. "$(dirname "$0")/common.sh"

"$(dirname "$0")/01_check_environment.sh" "${1:-}"
"$(dirname "$0")/02_build_native.sh"
"$(dirname "$0")/03_build_ffmpeg_filter.sh" "${2:-}"

log "setup complete — try: python -m raisr_tpu.cli --help"
