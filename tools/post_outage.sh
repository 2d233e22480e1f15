#!/bin/bash
# Run the TPU work queued behind the round-3 tunnel outage (docs/ROUND3.md).
# Usage: bash tools/post_outage.sh   (runs each step serially; NEVER run two
# TPU processes at once — FAILED_PRECONDITION). Probe first:
#   timeout 5 bash -c 'echo > /dev/tcp/127.0.0.1/8113' || echo relay down
set -uo pipefail
cd "$(dirname "$0")/.."

export PATH=/opt/venv/bin:$PATH
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_PLATFORMS=axon AXON_LOOPBACK_RELAY=1 TPU_SKIP_MDS_QUERY=1
export PALLAS_AXON_TPU_GEN=v5e PALLAS_AXON_POOL_IPS=127.0.0.1
export PALLAS_AXON_REMOTE_COMPILE=1

echo "== 1/3 tpu_check --assert (refresh TPUCHECK_r03.json post pairing flip)"
timeout 7200 python tools/tpu_check.py --assert --out TPUCHECK_r03.json \
  || echo "TPUCHECK FAILED rc=$?"

echo "== 2/3 batch_bench (post-flip f32 rows + full-YUV rows)"
timeout 7200 python tools/batch_bench.py 2>&1 | tee /tmp/batch_bench_post.txt

echo "== 3/3 bench.py (confirm headline)"
timeout 3600 python bench.py

# Optional same-day A/B of the queued VPU-floor lever (run manually):
#   python tools/kbench_full.py                       # baseline ms/pass
#   RAISR_ABLATE=vconv_mxu python tools/kbench_full.py  # banded-MXU vert conv
# Keep whichever is faster as the default (flip use_vmxu in full_kernel.py).
