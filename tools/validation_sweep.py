"""End-to-end validation sweep.

Re-creation of the reference's validation suite
(reference: test/validation_suite/run_tests_avxout.sh) against the raisr CLI:
  - positive sweep: every filter folder at its proper ratio, passes {1,2},
    blending {1,2}, mode {1,2}, 8/10-bit, backends
  - negative sweep: bad bits / blending / mode / passes, missing input,
    directory as input, corrupt model folders (create_wrong_files.sh cases)
Pass criterion mirrors the reference's log-grep: positive runs must not
print "[RAISR ERROR]"; negative runs must fail with exactly that marker.

Usage: python tools/validation_sweep.py [--workdir DIR] [--backend auto]
"""

from __future__ import annotations

import argparse
import contextlib
import io
import os
import shutil
import sys
import tempfile

import numpy as np

# The --shard rows on CPU need a virtual multi-device mesh; set the XLA
# flag BEFORE jax initializes its backend (no-op for real TPU runs).
if os.environ.get("JAX_PLATFORMS", "").startswith("cpu") and \
        "host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=8"
    )

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from raisr_tpu import video
from raisr_tpu.cli import main as cli_main
from raisr_tpu.engine import Frame

REF = "/root/reference"

POSITIVE = [
    # (folder, ratio, bits, passes, mode, blending)
    (f"{REF}/filters_2x/filters_lowres", 2.0, 8, 1, 1, 2),
    (f"{REF}/filters_2x/filters_lowres", 2.0, 8, 2, 1, 1),
    (f"{REF}/filters_2x/filters_lowres", 2.0, 10, 1, 1, 2),
    (f"{REF}/filters_2x/filters_highres", 2.0, 8, 2, 1, 2),
    (f"{REF}/filters_2x/filters_highres", 2.0, 10, 2, 1, 1),
    (f"{REF}/filters_2x/filters_denoise", 2.0, 8, 2, 2, 2),
    (f"{REF}/filters_2x/filters_denoise", 2.0, 10, 2, 2, 2),
    (f"{REF}/filters_1.5x/filters_highres", 1.5, 8, 1, 1, 2),
    (f"{REF}/filters_1.5x/filters_denoise", 1.5, 8, 2, 2, 1),
]

# round-2 knobs: batched device-resident mode and the bf16 precision tier;
# round-3: multi-chip --shard (runs on the virtual CPU mesh under the
# sweep's JAX_PLATFORMS=cpu + xla_force_host_platform_device_count env)
POSITIVE_EXTRA = [
    # (folder, ratio, bits, passes, mode, blending, extra_args)
    (f"{REF}/filters_2x/filters_highres", 2.0, 8, 2, 1, 2,
     ["--batch", "2"]),
    (f"{REF}/filters_2x/filters_highres", 2.0, 8, 1, 1, 2,
     ["--dtype", "bfloat16"]),
    (f"{REF}/filters_2x/filters_lowres", 2.0, 8, 2, 1, 2,
     ["--batch", "3", "--dtype", "bfloat16"]),
    (f"{REF}/filters_2x/filters_lowres", 2.0, 8, 1, 1, 2,
     ["--batch", "4", "--shard", "data=2"]),
    (f"{REF}/filters_2x/filters_lowres", 2.0, 8, 1, 1, 2,
     ["--batch", "2", "--shard", "data=2,rows=2"]),
    # round-3 late: the 10-bit p_split fast tier, the int8-pair tier, and
    # the fast tier on single-phase (1.5x) banks
    (f"{REF}/filters_2x/filters_highres", 2.0, 10, 2, 1, 2,
     ["--dtype", "bfloat16"]),
    (f"{REF}/filters_2x/filters_lowres", 2.0, 8, 1, 1, 2,
     ["--dtype", "int8"]),
    (f"{REF}/filters_1.5x/filters_highres", 1.5, 8, 1, 1, 2,
     ["--dtype", "bfloat16"]),
    # resize-mode knob (reference USE_BICUBIC/USE_LANCZOS analogue)
    (f"{REF}/filters_2x/filters_lowres", 2.0, 8, 1, 1, 2,
     ["--resize-mode", "cubic"]),
    (f"{REF}/filters_2x/filters_lowres", 2.0, 8, 2, 1, 2,
     ["--resize-mode", "lanczos", "--batch", "2"]),
]

NEGATIVE_ARGS = [
    # (extra args, description)
    (["--bits", "9"], "bits=9"),
    (["--blending", "0"], "blending=0"),
    (["--mode", "-1"], "mode=-1"),
    (["--passes", "3"], "passes=3"),
    (["--filterfolder", "/nonexistent/folder"], "missing filterfolder"),
    (["--dtype", "int8", "--bits", "10"], "int8 at 10-bit"),
    (["--dtype", "int8", "--ratio", "1.5",
      "--filterfolder", f"{REF}/filters_1.5x/filters_highres"],
     "int8 off ratio 2"),
    (["--resize-mode", "cubic", "--shard", "data=2", "--batch", "2"],
     "sharding requires bilinear resize"),
]


def _make_clip(path, w=32, h=24, bits=8, frames=2):
    fmt = video.VideoFormat(w, h, bits, "420")
    wr = video.Y4MWriter(path, fmt)
    rng = np.random.default_rng(0)
    dt = np.uint8 if bits == 8 else np.uint16
    lo, hi = (16, 235) if bits == 8 else (64, 940)
    for _ in range(frames):
        wr.write(
            Frame(
                y=rng.integers(lo, hi, (h, w)).astype(dt),
                u=rng.integers(lo, hi, (h // 2, w // 2)).astype(dt),
                v=rng.integers(lo, hi, (h // 2, w // 2)).astype(dt),
            )
        )
    wr.close()


def _run_cli(args):
    out, err = io.StringIO(), io.StringIO()
    with contextlib.redirect_stdout(out), contextlib.redirect_stderr(err):
        try:
            rc = cli_main(args)
        except SystemExit as e:  # argparse rejections
            rc = int(e.code or 0)
        except Exception as e:  # noqa: BLE001
            err.write(f"[RAISR ERROR] unhandled: {e}\n")
            rc = 1
    return rc, out.getvalue(), err.getvalue()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default=None)
    ap.add_argument("--backend", default="auto")
    ap.add_argument("--quick", action="store_true", help="subset only")
    args = ap.parse_args()

    work = args.workdir or tempfile.mkdtemp(prefix="raisr_sweep_")
    os.makedirs(work, exist_ok=True)
    failures = []
    n_pass = 0

    positive = [p + ([],) for p in (POSITIVE[:3] if args.quick else POSITIVE)]
    if not args.quick:
        positive += POSITIVE_EXTRA
    import jax

    n_dev = len(jax.devices())
    for folder, ratio, bits, passes, mode, blending, extra in positive:
        if "--shard" in extra and n_dev < 4:
            print(f"SKIP (needs >=4 devices): {' '.join(extra)}")
            continue
        clip = os.path.join(work, f"in_{bits}.y4m")
        if not os.path.exists(clip):
            _make_clip(clip, bits=bits)
        dst = os.path.join(work, "out.y4m")
        cli_args = [
            "upscale", "-i", clip, "-o", dst,
            "--filterfolder", folder, "--ratio", str(ratio),
            "--bits", str(bits), "--passes", str(passes),
            "--mode", str(mode), "--blending", str(blending),
            "--backend", args.backend,
        ] + extra
        rc, out, err = _run_cli(cli_args)
        name = (f"{os.path.basename(folder)} r{ratio} b{bits} p{passes} "
                f"m{mode} bl{blending} {' '.join(extra)}")
        if rc != 0 or "[RAISR ERROR]" in out + err:
            failures.append((name, rc, (out + err)[-300:]))
        else:
            n_pass += 1
            print(f"PASS {name}")

    # negative sweep: wrong knobs must fail with the RAISR ERROR marker
    clip = os.path.join(work, "in_8.y4m")
    if not os.path.exists(clip):
        _make_clip(clip, bits=8)
    negatives = NEGATIVE_ARGS + [
        (["-i", os.path.join(work, "missing.y4m")], "missing input"),
        (["-i", work], "directory as input"),
    ]
    for extra, desc in negatives:
        base = [
            "upscale", "-i", clip, "-o", os.path.join(work, "neg.y4m"),
            "--filterfolder", f"{REF}/filters_2x/filters_lowres",
        ]
        # -i overrides: apply extras last so duplicated flags win
        rc, out, err = _run_cli(base + extra)
        if rc == 0:
            failures.append((f"negative:{desc}", rc, "unexpectedly succeeded"))
        else:
            n_pass += 1
            print(f"PASS negative: {desc} (rc={rc})")

    # corrupt-model cases (create_wrong_files.sh)
    src = f"{REF}/filters_2x/filters_highres"
    cases = {
        "wrongConfig_12": lambda d: open(os.path.join(d, "config"), "w").write("12 3 3 11"),
        "wrongConfig_trunc": lambda d: open(os.path.join(d, "config"), "w").write("24 3 3"),
        "wrongConfig_patch6": lambda d: open(os.path.join(d, "config"), "w").write("24 3 3 6"),
        "noHashTable": lambda d: os.remove(os.path.join(d, "filterbin_2_8")),
        "noStrPath": lambda d: os.remove(os.path.join(d, "Qfactor_strbin_2_8")),
        "noCohPath": lambda d: os.remove(os.path.join(d, "Qfactor_cohbin_2_8")),
        "badHashNums": lambda d: os.rename(
            os.path.join(d, "filterbin_2_8"), os.path.join(d, "filterbin_6_8")
        ),
    }
    for name, corrupt in cases.items():
        d = os.path.join(work, f"bank_{name}")
        if os.path.exists(d):
            shutil.rmtree(d)
        shutil.copytree(src, d)
        corrupt(d)
        rc, out, err = _run_cli(
            ["upscale", "-i", clip, "-o", os.path.join(work, "neg.y4m"),
             "--filterfolder", d]
        )
        if rc == 0 or "[RAISR ERROR]" not in out + err:
            failures.append((f"corrupt:{name}", rc, (out + err)[-200:]))
        else:
            n_pass += 1
            print(f"PASS corrupt model: {name}")

    print(f"\n{n_pass} passed, {len(failures)} failed")
    for name, rc, tail in failures:
        print(f"FAIL {name} rc={rc}: {tail}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
