#!/bin/bash
# Stage 2: build the native pieces — the Python package (with its C
# extension for NV12/P010 plane I/O) and the embedded-interpreter C ABI
# (libraisr_tpu.so + include/raisr_tpu.h, the RNL Init/SetRes/Process
# drop-in surface).
#
# Reference analogue: build.sh (cmake Library/ -> libraisr.a + install).
# Ours builds two artifacts instead of one static lib: the pip package
# (compute path) and the shared C ABI (embedding surface).
#
# Usage: scripts/02_build_native.sh [--no-capi]
. "$(dirname "$0")/common.sh"

cd "$REPO_ROOT"

log "building python package (develop mode, compiles the _raisrio C extension)"
python3 -m pip install -e . --no-build-isolation --quiet \
    || die "pip install -e . failed — check the C toolchain (cc) and setup.py"
python3 -c "import raisr_tpu; print('[raisr_tpu setup] package OK:', raisr_tpu.__file__)"
python3 - <<'EOF'
try:
    import _raisrio
    print("[raisr_tpu setup] native I/O extension OK")
except ImportError as e:
    print(f"[raisr_tpu setup] note: _raisrio not importable ({e}) — "
          "NV12/P010 I/O falls back to the numpy path")
EOF

if [ "${1:-}" = "--no-capi" ]; then
    log "skipping C ABI (requested)"
    exit 0
fi

if have cmake && have cc; then
    log "building C ABI (libraisr_tpu.so)"
    tools/build_capi.sh || die "C ABI build failed (tools/build_capi.sh)"
    log "C ABI OK: build/native/libraisr_tpu.so"
else
    warn "cmake/cc missing — skipping the C ABI (Python API still fully usable)"
fi

log "native build done"
