# Shared helpers for the staged setup scripts.
# Analogue of the reference's scripts/common.sh (logging + strict-mode
# helpers for its 01..03 bootstrap); ours is network-free — everything the
# framework needs (jax, the native toolchain) is baked into the image or
# built from this repo.

set -e -o pipefail

REPO_ROOT="$(cd "$(dirname "${BASH_SOURCE[0]}")/.." && pwd)"

log()  { printf '\033[1;32m[raisr_tpu setup]\033[0m %s\n' "$*"; }
warn() { printf '\033[1;33m[raisr_tpu setup]\033[0m %s\n' "$*" >&2; }
die()  { printf '\033[1;31m[raisr_tpu setup]\033[0m %s\n' "$*" >&2; exit 1; }

have() { command -v "$1" >/dev/null 2>&1; }
