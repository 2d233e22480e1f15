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

    def test_sharded_ct_step_matches_single(self):
        """The distributed CT-blend-aware sweep (ct_filters=seed bank) must
        solve the same bank as the single-device two-sweep path."""
        from raisr_tpu.train import train_filterbank_ct

        cfg = TrainConfig(lam=1e-3, chunk=512)
        pairs = _pairs(4, seed=6)
        lr_batch = jnp.stack([jnp.asarray(p[0]) for p in pairs])
        hr_batch = jnp.stack([jnp.asarray(p[1]) for p in pairs])
        mesh = make_mesh(4, ("data",))
        seed_bank = np.asarray(
            train_step_sharded(lr_batch, hr_batch, cfg, mesh))
        sharded_ct = np.asarray(train_step_sharded(
            lr_batch, hr_batch, cfg, mesh,
            ct_filters=jnp.asarray(seed_bank), blending=2))
        single_ct = train_filterbank_ct(lambda: iter(pairs), cfg, blending=2)
        # atol covers census-bit flips amplified from the seed banks' own
        # fp summation-order differences (sharded vs single accumulation)
        np.testing.assert_allclose(sharded_ct, single_ct.filters,
                                   rtol=2e-3, atol=5e-4)


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


class TestCTRefine:
    """CT-blend-aware weighted least squares (train_filterbank_ct)."""

    def _cfg(self):
        return TrainConfig(lam=1e-3, chunk=512)

    def test_identity_bank_cobc_weights_reduce_to_plain(self):
        """With an identity provisional bank the CoBC filtered plane equals
        the cheap plane, so every blend weight is s=1 and the weighted
        accumulation must equal the plain one exactly."""
        from raisr_tpu.train.trainer import (
            accumulate_pair,
            accumulate_pair_ct,
            init_accumulators,
        )

        cfg = self._cfg()
        lr, hr = _pairs(1, seed=11)[0]
        cheap = cheap_upscale(jnp.asarray(lr), *hr.shape, 8)
        identity = np.zeros((cfg.num_filters, 128), np.float32)
        identity[:, 60] = 1.0  # center tap (5,5) of the 11x11 patch

        q0, v0 = init_accumulators(cfg)
        q_plain, v_plain = accumulate_pair(q0, v0, cheap, jnp.asarray(hr), cfg)
        q_ct, v_ct = accumulate_pair_ct(
            q0, v0, cheap, jnp.asarray(hr), jnp.asarray(identity), cfg, 2
        )
        np.testing.assert_allclose(np.asarray(q_ct), np.asarray(q_plain),
                                   rtol=1e-6, atol=1e-4)
        np.testing.assert_allclose(np.asarray(v_ct), np.asarray(v_plain),
                                   rtol=1e-6, atol=1e-4)

    def test_randomness_weights_match_oracle(self):
        """blending=1 weights are bank-independent: Q/V must equal the
        explicit numpy weighted normal equations."""
        from raisr_tpu.ops.census import randomness_weight
        from raisr_tpu.train.trainer import (
            _patches_and_labels,
            accumulate_pair_ct,
            init_accumulators,
        )

        cfg = self._cfg()
        lr, hr = _pairs(1, seed=12)[0]
        cheap = cheap_upscale(jnp.asarray(lr), *hr.shape, 8)
        identity = np.zeros((cfg.num_filters, 128), np.float32)
        identity[:, 60] = 1.0

        patches, idx, labels = _patches_and_labels(cheap, jnp.asarray(hr), cfg)
        patches, idx, labels = map(np.asarray, (patches, idx, labels))
        s = np.asarray(randomness_weight(cheap))[6:-6, 6:-6].reshape(-1)
        c_vals = patches[:, 60]

        nf = cfg.num_filters
        q_exp = np.zeros((nf, 121, 121), np.float64)
        v_exp = np.zeros((nf, 121), np.float64)
        for n in range(patches.shape[0]):
            p = s[n] * patches[n]
            q_exp[idx[n]] += np.outer(p, p)
            v_exp[idx[n]] += (labels[n] - (1 - s[n]) * c_vals[n]) * p

        q0, v0 = init_accumulators(cfg)
        q_ct, v_ct = accumulate_pair_ct(
            q0, v0, cheap, jnp.asarray(hr), jnp.asarray(identity), cfg, 1
        )
        hit = np.unique(idx)
        np.testing.assert_allclose(np.asarray(q_ct)[hit], q_exp[hit],
                                   rtol=1e-4, atol=0.5)
        np.testing.assert_allclose(np.asarray(v_ct)[hit], v_exp[hit],
                                   rtol=1e-4, atol=0.5)

    def test_ct_refined_bank_improves_blended_error(self):
        """On content where the census blend is active (sharp edges + noise),
        the CT-refined bank must not lose to the plain bank on the true
        blended objective, measured through the real inference path."""
        from raisr_tpu.model.loader import RaisrModel
        from raisr_tpu.ops.pipeline import pass_statics, raisr_pass
        from raisr_tpu.train import train_filterbank_ct

        rng = np.random.default_rng(7)
        pairs = []
        for i in range(3):
            h, w = 36, 48
            x, y = np.meshgrid(np.arange(w * 2), np.arange(h * 2))
            hr = (
                90 + 90 * ((x // 9 + y // 7 + i) % 2)
                + rng.normal(0, 9, (h * 2, w * 2))
            )
            hr = np.clip(np.floor(hr + 0.5), 0, 255)
            lr = hr.reshape(h, 2, w, 2).mean(axis=(1, 3))
            lr = np.clip(np.floor(lr + 0.5), 0, 255).astype(np.float32)
            pairs.append((lr, hr.astype(np.float32)))

        cfg = self._cfg()
        plain = train_filterbank(pairs, cfg)
        refined = train_filterbank_ct(lambda: iter(pairs), cfg, blending=2)
        assert not np.array_equal(plain.filters, refined.filters)

        from raisr_tpu.config import RangeType

        rcfg = RaisrConfig(filterfolder="unused", passes=1, blending=2,
                           range=RangeType.FULL)

        def blended_mse(bank):
            model = RaisrModel(qangle=24, qstrength=3, qcoherence=3,
                               patch_size=11, banks=[bank])
            s = pass_statics(rcfg, model, "taps")
            args = (jnp.asarray(bank.filters), jnp.asarray(bank.qstr),
                    jnp.asarray(bank.qcoh))
            total = 0.0
            for lr, hr in pairs:
                out = np.asarray(raisr_pass(
                    cheap_upscale(jnp.asarray(lr), *hr.shape, 8),
                    *args, s, 0))
                core = np.s_[8:-8, 8:-8]
                total += float(np.mean((out[core] - hr[core]) ** 2))
            return total / len(pairs)

        mse_plain = blended_mse(plain)
        mse_refined = blended_mse(refined)
        assert mse_refined <= mse_plain * 1.002, (mse_plain, mse_refined)


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
