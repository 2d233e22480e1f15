"""Trainer tests: the learned least-squares filters must (a) reconstruct a
known linear mapping, (b) round-trip through the reference file format,
(c) produce the same bank from the sharded distributed step."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from raisr_tpu.config import RaisrConfig
from raisr_tpu.model.loader import load_model
from raisr_tpu.ops.resize import cheap_upscale
from raisr_tpu.train import (
    TrainConfig,
    train_filterbank,
    train_step_sharded,
    save_filter_folder,
)
from raisr_tpu.parallel.sharding import make_mesh


def _pairs(n, lr_h=16, lr_w=20, seed=0, bits=8):
    rng = np.random.default_rng(seed)
    out = []
    for i in range(n):
        img = rng.normal(size=(lr_h, lr_w))
        for ax in (0, 1):
            img = np.apply_along_axis(
                lambda r: np.convolve(r, np.ones(3) / 3, "same"), ax, img
            )
        img = (img - img.min()) / (img.max() - img.min() + 1e-9)
        lr = np.floor(img * 255).astype(np.float32)
        hr = np.asarray(cheap_upscale(jnp.asarray(lr), lr_h * 2, lr_w * 2, bits))
        out.append((lr, hr))
    return out


class TestTrainer:
    def test_identity_recovery(self):
        # HR == cheap upscale => the optimal filter reproduces the center tap
        cfg = TrainConfig(lam=1e-4, chunk=512)
        bank = train_filterbank(_pairs(3), cfg)
        assert bank.filters.shape == (864, 128)
        # hit buckets should be near-identity on the cheap image: applying the
        # filters to a new cheap image reproduces it closely
        from raisr_tpu.ops.filter_apply import apply_filters_taps
        from raisr_tpu.ops import hashing
        from raisr_tpu.model.gaussian import gaussian_weights

        lr, hr = _pairs(1, seed=99)[0]
        cheap = cheap_upscale(jnp.asarray(lr), 32, 40, 8)
        gx, gy = hashing.gradients(cheap)
        a, b, d = hashing.structure_tensor(gx, gy, jnp.asarray(gaussian_weights(11, 8)))
        buckets = hashing.hash_buckets(
            a, b, d, jnp.asarray(cfg.qstr), jnp.asarray(cfg.qcoh), 24, 3, 3
        )
        ptype = hashing.pixel_types(32, 40, 2, 5, True)
        idx = buckets * 4 + ptype
        out = np.asarray(
            apply_filters_taps(cheap, idx, jnp.asarray(bank.filters), 11)
        )
        core = np.s_[6:-6, 6:-6]
        err = np.abs(out[core] - np.asarray(cheap)[core])
        assert np.median(err) < 1.0, np.median(err)

    def test_export_roundtrip(self, tmp_path):
        cfg = TrainConfig(lam=1e-3, chunk=512)
        bank = train_filterbank(_pairs(2), cfg)
        folder = str(tmp_path / "trained")
        save_filter_folder(folder, [bank], bits=8)
        rcfg = RaisrConfig(filterfolder=folder)
        model = load_model(folder, rcfg)
        np.testing.assert_array_equal(model.banks[0].filters, bank.filters)
        np.testing.assert_allclose(model.banks[0].qstr, bank.qstr, rtol=1e-5)

    def test_trained_bank_runs_in_engine(self, tmp_path):
        from raisr_tpu.engine import RaisrEngine, Frame

        cfg = TrainConfig(lam=1e-3, chunk=512)
        bank = train_filterbank(_pairs(2), cfg)
        folder = str(tmp_path / "trained")
        save_filter_folder(folder, [bank], bits=8)
        eng = RaisrEngine(RaisrConfig(filterfolder=folder))
        lr, _ = _pairs(1, seed=5)[0]
        out = eng.process(Frame(y=lr.astype(np.uint8)))
        assert out.y.shape == (32, 40)

    def test_sharded_step_matches_single(self):
        cfg = TrainConfig(lam=1e-3, chunk=512)
        pairs = _pairs(8, seed=3)
        lr_batch = jnp.stack([jnp.asarray(p[0]) for p in pairs])
        hr_batch = jnp.stack([jnp.asarray(p[1]) for p in pairs])
        mesh = make_mesh(4, ("data",))
        sharded = np.asarray(train_step_sharded(lr_batch, hr_batch, cfg, mesh))
        single = train_filterbank(pairs, cfg)
        np.testing.assert_allclose(sharded, single.filters, rtol=2e-3, atol=2e-4)


class TestSymmetryAugmentation:
    def test_augmented_bank_rotation_consistent(self):
        """A bank trained with D4 augmentation upscales a rotated image to
        (nearly) the rotation of the upscaled original."""
        from raisr_tpu.ops.pipeline import pass_statics, raisr_pass
        from raisr_tpu.model.loader import RaisrModel

        cfg = TrainConfig(lam=0.05)
        pairs = _pairs(3, 16, 16, seed=4)
        bank = train_filterbank(pairs, TrainConfig(lam=0.05, augment_symmetry=True))

        rcfg = RaisrConfig(filterfolder="unused", passes=1)
        model = RaisrModel(
            qangle=24, qstrength=3, qcoherence=3, patch_size=11, banks=[bank]
        )
        s = pass_statics(rcfg, model, "taps")
        rng = np.random.default_rng(9)
        img = rng.normal(size=(32, 32))
        for ax in (0, 1):
            img = np.apply_along_axis(
                lambda r: np.convolve(r, np.ones(3) / 3, "same"), ax, img
            )
        img = np.floor((img - img.min()) / (img.max() - img.min() + 1e-9) * 219 + 16)
        img = img.astype(np.float32)

        args = (
            jnp.asarray(bank.filters),
            jnp.asarray(bank.qstr),
            jnp.asarray(bank.qcoh),
        )
        out = np.asarray(raisr_pass(jnp.asarray(img), *args, s, 0))
        out_rot = np.asarray(raisr_pass(jnp.asarray(np.rot90(img).copy()), *args, s, 0))
        # interior only: border zones are orientation-dependent by design
        a = np.rot90(out)[8:-8, 8:-8]
        b = out_rot[8:-8, 8:-8]
        frac_big = (np.abs(a - b) > 2).mean()
        assert frac_big < 0.02, frac_big

    def test_augmentation_octuples_observations(self):
        from raisr_tpu.train.trainer import init_accumulators, accumulate_pair
        from raisr_tpu.train.trainer import _dihedral_transforms

        lr = _pairs(1, 12, 12, seed=1)[0][0]
        ts = list(_dihedral_transforms(lr, lr, True))
        assert len(ts) == 8
        # all 8 orientations are distinct images for generic content
        flat = {t[0].tobytes() for t in ts}
        assert len(flat) == 8


class TestBatchedEngine:
    def test_process_batch_matches_per_frame(self):
        from raisr_tpu.engine import RaisrEngine

        cfg = RaisrConfig(
            filterfolder="/root/reference/filters_2x/filters_highres"
        )
        eng = RaisrEngine(cfg)
        rng = np.random.default_rng(0)
        batch = jnp.asarray(
            rng.integers(16, 235, size=(3, 24, 32)).astype(np.float32)
        )
        out = np.asarray(eng.process_batch_y(batch))
        ref = np.stack(
            [np.asarray(eng.upscale_y(batch[i])) for i in range(3)]
        )
        np.testing.assert_array_equal(out, ref)


class TestTrainEvalCLI:
    def test_train_cli_reports_holdout_eval(self, tmp_path, capsys):
        """`raisr train` must print a hold-out quality report: trained-bank
        PSNR, bilinear baseline, and (--eval-against) a comparison bank.
        The trained bank must beat bilinear and land within 3 dB of the
        shipped reference bank on this easy synthetic content."""
        import json
        import os

        from raisr_tpu import video
        from raisr_tpu.cli import main
        from raisr_tpu.engine import Frame

        rng = np.random.default_rng(5)
        src = os.path.join(str(tmp_path), "hr.y4m")
        w, h, n = 64, 48, 10
        wr = video.Y4MWriter(src, video.VideoFormat(w, h, 8, "420"))
        x, y = np.meshgrid(np.arange(w), np.arange(h))
        for i in range(n):
            img = (
                110 + 70 * np.sin((x + 3 * i) / 7.0) + 50 * (y > h // 2)
                + rng.normal(0, 5, (h, w))
            )
            yp = np.clip(img, 16, 235).astype(np.uint8)
            u = np.full((h // 2, w // 2), 128, np.uint8)
            wr.write(Frame(y=yp, u=u, v=u))
        wr.close()

        out_folder = os.path.join(str(tmp_path), "bank")
        ref_folder = "/root/reference/filters_2x/filters_lowres"
        args = ["train", "-o", out_folder, "-i", src, "--eval-holdout", "5"]
        if os.path.isdir(ref_folder):
            args += ["--eval-against", ref_folder]
        rc = main(args)
        assert rc == 0
        out = capsys.readouterr().out
        eval_line = [l for l in out.splitlines() if '"eval"' in l]
        assert eval_line, out
        report = json.loads(eval_line[-1])["eval"]
        assert report["holdout_frames"] == 2
        assert report["trained_psnr_db"] > report["bilinear_psnr_db"], report
        if os.path.isdir(ref_folder):
            assert report["trained_psnr_db"] >= report["reference_bank_psnr_db"] - 3.0, report
