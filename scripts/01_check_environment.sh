#!/bin/bash
# Stage 1: verify the runtime environment.
#
# Reference analogue: scripts/01_pull_resources.sh +
# scripts/02_install_prerequisites.sh download and install IPP/oneAPI and
# the FFmpeg build prerequisites. The TPU framework has no downloadable
# prerequisites — jax/XLA and the native toolchain ship with the image —
# so stage 1 *checks* instead of pulls: python + jax importable, which
# accelerator backend is visible, the native toolchain for stages 2-3,
# and (optionally) a RAISR filter-bank folder to run against.
#
# Usage: scripts/01_check_environment.sh [filter-bank-dir]
. "$(dirname "$0")/common.sh"

FILTERS="${1:-}"

log "python: $(python3 --version 2>&1 || die 'python3 not found')"

python3 - <<'EOF' || die "jax is not importable — install jax or use the shipped image"
import jax, jaxlib
print(f"[raisr_tpu setup] jax {jax.__version__} / jaxlib {jaxlib.__version__}")
EOF

# Backend report (does not fail setup: CPU-only hosts run the interpret /
# taps backends; TPU is required only for production throughput).
python3 - <<'EOF'
import jax
try:
    devs = jax.devices()
    kind = devs[0].platform if devs else "none"
    print(f"[raisr_tpu setup] accelerator: {len(devs)} x {kind} "
          f"({devs[0].device_kind if devs else '-'})")
    if kind not in ("tpu", "axon"):
        print("[raisr_tpu setup] note: no TPU visible — pallas kernels will "
              "run in interpret mode (tests) or via --backend taps/conv")
except Exception as e:  # pragma: no cover
    print(f"[raisr_tpu setup] accelerator probe failed: {e}")
EOF

for tool in cc cmake; do
    have "$tool" || warn "$tool not found — stage 2 (native C ABI) will be skipped"
done

if [ -n "$FILTERS" ]; then
    # a bank folder holds config + filterbin_2_<bits> (any depth variant)
    [ -e "$FILTERS/config" ] || die "filter bank $FILTERS has no config file"
    ls "$FILTERS"/filterbin_2_* >/dev/null 2>&1 \
        || die "filter bank $FILTERS has no filterbin_2_* files"
    log "filter bank OK: $FILTERS"
else
    log "no filter bank given — generate one with tools/make_test_bank.py," \
        "train with 'raisr train', or point at the reference's filters_2x/"
fi

log "environment OK"
