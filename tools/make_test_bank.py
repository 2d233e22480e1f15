"""Train and export a tiny self-contained filter bank (reference on-disk
format) so smoke tests can run without the reference model tree.

Usage: python tools/make_test_bank.py <folder> [bits]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("JAX_PLATFORMS"):
    import jax

    try:
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    except RuntimeError:
        pass

import numpy as np

from raisr_tpu.train import TrainConfig
from raisr_tpu.train.trainer import train_filterbank
from raisr_tpu.train.export import save_filter_folder


def main():
    folder = sys.argv[1] if len(sys.argv) > 1 else "/tmp/raisr_test_bank"
    bits = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    rng = np.random.default_rng(0)
    cfg = TrainConfig(bits=bits, chunk=512)
    hi = (1 << bits) - 1
    pairs = []
    for seed in range(2):
        x, y = np.meshgrid(np.arange(96), np.arange(64))
        hr = np.clip(
            hi * (0.3 + 0.25 * np.sin(x / 7.0) + 0.2 * (y > 32))
            + rng.normal(0, hi / 80, (64, 96)),
            0, hi,
        )
        dtype = np.uint8 if bits == 8 else np.uint16
        hr = hr.astype(dtype)
        lr = np.clip(
            np.floor(hr.reshape(32, 2, 48, 2).mean(axis=(1, 3)) + 0.5), 0, hi
        ).astype(dtype)
        pairs.append((lr, hr))
    bank = train_filterbank(pairs, cfg)
    save_filter_folder(folder, [bank], bits=bits,
                       notes="tiny CI smoke bank (synthetic content)")
    print(f"wrote test bank to {folder}")


if __name__ == "__main__":
    main()
