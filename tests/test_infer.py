"""Inference-layer tests: param grids, batched sweeps, rollout, images
(SURVEY.md §3.2/§3.4 parity)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepfluids_tpu.data.manifest import Manifest
from deepfluids_tpu.infer import (
    param_grid,
    rollout_trajectory,
    run_test_sweep,
    sweep_generator,
)
from deepfluids_tpu.models import LatentIntegrator
from deepfluids_tpu.utils import (
    field_to_image,
    save_field_image,
    save_gif,
    save_image_grid,
)


@pytest.fixture
def manifest():
    return Manifest(
        param_names=["pos", "size", "frame"],
        param_ranges=[[0.2, 0.8], [0.04, 0.12], [0.0, 3.0]],
        num_scenes=4, num_frames=4, resolution=[16, 16], num_channels=2,
        v_range=[-2.0, 2.0],
    )


class TestParamGrid:
    def test_grid_layout(self, manifest):
        g = param_grid(manifest, (3, 2))
        assert g.shape == (3 * 2 * 4, 3)
        # frame-major within each scene
        np.testing.assert_allclose(g[:4, 2], [0, 1, 2, 3])
        # scene params constant within a scene
        assert (g[:4, 0] == g[0, 0]).all()
        # endpoints hit the range bounds
        assert g[:, 0].min() == 0.2 and g[:, 0].max() == 0.8


class TestSweep:
    def test_batched_sweep_matches_direct(self, manifest):
        w = jax.random.normal(jax.random.key(0), (3, 16 * 16 * 2))

        def apply_fn(p):
            return (p @ w).reshape(-1, 16, 16, 2)

        raw = param_grid(manifest, (2, 2))
        outs = np.concatenate(
            list(sweep_generator(apply_fn, manifest, raw, batch_size=5)))
        assert outs.shape == (16, 16, 16, 2)
        direct = np.asarray(apply_fn(
            jnp.asarray(manifest.normalize_params(raw))))
        np.testing.assert_allclose(
            outs, manifest.denormalize_field(direct), rtol=2e-5, atol=2e-5)

    def test_run_test_sweep_artifacts(self, manifest, tmp_path):
        def apply_fn(p):
            return jnp.ones((p.shape[0], 16, 16, 2)) * p[:, :1, None, None]

        res = run_test_sweep(apply_fn, manifest, str(tmp_path), counts=(2, 1),
                             batch_size=4, save_png_every=2, gif_scenes=1)
        assert res["num_fields"] == 2 * 1 * 4
        npz = [f for f in os.listdir(tmp_path) if f.endswith(".npz")]
        assert len(npz) == 8
        assert os.path.exists(tmp_path / "scene0.gif")
        with np.load(tmp_path / "0_0.npz") as d:
            assert d["x"].shape == (16, 16, 2)
            assert d["y"].shape == (3,)


class TestRollout:
    def test_rollout_trajectory_shapes(self, manifest):
        m = LatentIntegrator(z_num=8, num_param=3, hidden=16, depth=1)
        dp = jnp.zeros((2, 3))
        params = m.init(jax.random.key(0), jnp.ones((2, 8)), dp)
        apply_fn = lambda p, z, d: m.apply(p, z, d)

        def decode_fn(z):
            return jnp.tile(z[:, :1, None, None], (1, 16, 16, 2))

        raw_p = np.stack([
            np.full(4, 0.5), np.full(4, 0.08), np.arange(4.0)], axis=1)
        p0 = manifest.normalize_params(raw_p[0])
        z0 = np.concatenate([p0, np.zeros(5)])[None].repeat(2, 0)
        z_traj, fields = rollout_trajectory(
            apply_fn, params, decode_fn, z0.astype(np.float32), raw_p,
            manifest)
        assert z_traj.shape == (4, 2, 8)
        assert fields.shape == (4, 2, 16, 16, 2)
        # param block pinned to the normalized trajectory
        np.testing.assert_allclose(
            z_traj[:, 0, :3], manifest.normalize_params(raw_p), atol=1e-5)


class TestImages:
    def test_field_to_image_modes(self):
        f = np.random.default_rng(0).normal(size=(16, 16, 2)).astype(
            np.float32)
        for mode in ("vorticity", "magnitude"):
            img = field_to_image(f, mode)
            assert img.shape == (16, 16, 3) and img.dtype == np.uint8
        img3 = field_to_image(np.zeros((4, 16, 16, 3), np.float32),
                              "magnitude")
        assert img3.shape == (16, 16, 3)

    def test_3d_max_projection(self):
        rng = np.random.default_rng(3)
        vol = rng.normal(size=(4, 16, 16, 3)).astype(np.float32)
        for mode in ("vorticity", "magnitude"):
            img = field_to_image(vol, mode, projection="max")
            assert img.shape == (16, 16, 3) and img.dtype == np.uint8
        # a feature hidden off the mid-plane is visible under max-projection
        vol2 = np.zeros((4, 16, 16, 3), np.float32)
        vol2[0, 4:8, 4:8, 0] = 5.0  # only depth slice 0
        sl = field_to_image(vol2, "magnitude", projection="slice")
        mx = field_to_image(vol2, "magnitude", projection="max")
        assert mx.sum() > sl.sum()

    def test_save_image_and_gif(self, tmp_path):
        f = np.random.default_rng(0).normal(size=(8, 8, 2)).astype(np.float32)
        p1 = save_field_image(str(tmp_path / "a.png"), f)
        p2 = save_image_grid(str(tmp_path / "g.png"), [f, f, f], ncol=2)
        p3 = save_gif(str(tmp_path / "a.gif"), [f, f])
        for p in (p1, p2, p3):
            assert os.path.getsize(p) > 0


class TestSweepOnDevice:
    def test_matches_host_sweep(self, manifest):
        from deepfluids_tpu.infer.sweep import sweep_on_device

        w = jax.random.normal(jax.random.key(0), (3, 16 * 16 * 2))

        def apply_fn(p):
            return (p @ w).reshape(-1, 16, 16, 2)

        raw = param_grid(manifest, (3, 2))  # 24 fields, batch 5 -> padding
        dev = sweep_on_device(apply_fn, manifest, raw, batch_size=5)
        host = np.concatenate(
            list(sweep_generator(apply_fn, manifest, raw, batch_size=5)))
        assert dev.shape == host.shape == (24, 16, 16, 2)
        np.testing.assert_allclose(dev, host, rtol=2e-5, atol=2e-5)

    def test_auto_segmentation_matches(self, manifest):
        # max_out_bytes small enough to force several same-shape segments
        # (the safe path for ~10 GB 3D sweeps); results identical.
        from deepfluids_tpu.infer.sweep import sweep_on_device

        w = jax.random.normal(jax.random.key(1), (3, 16 * 16 * 2))

        def apply_fn(p):
            return (p @ w).reshape(-1, 16, 16, 2)

        raw = param_grid(manifest, (3, 2))  # 24 fields
        field_bytes = 4 * 16 * 16 * 2
        seg = sweep_on_device(apply_fn, manifest, raw, batch_size=4,
                              max_out_bytes=2 * 4 * field_bytes)  # 2 chunks/seg
        one = sweep_on_device(apply_fn, manifest, raw, batch_size=4)
        np.testing.assert_allclose(seg, one, rtol=1e-6)


class TestParamGridMidpoint:
    def test_count_one_is_midpoint(self, manifest):
        g = param_grid(manifest, (1, 1), num_frames=2)
        # pos range [0.2, 0.8] -> 0.5; size range [0.04, 0.12] -> 0.08
        np.testing.assert_allclose(g[0, 0], 0.5)
        np.testing.assert_allclose(g[0, 1], 0.08)


class TestEncodeDatasetRobustness:
    def test_skips_noncontract_files(self, tmp_path):
        from deepfluids_tpu.data.manifest import Manifest, save_manifest
        from deepfluids_tpu.infer import encode_dataset

        ds = str(tmp_path / "ds")
        os.makedirs(os.path.join(ds, "v"))
        x = np.zeros((8, 8, 2), np.float32)
        np.savez_compressed(os.path.join(ds, "v", "0_0.npz"), x=x,
                            y=np.zeros(3))
        np.savez_compressed(os.path.join(ds, "v", "backup.npz"), x=x,
                            y=np.zeros(3))  # violates naming contract
        save_manifest(Manifest(
            param_names=["a", "b", "frame"],
            param_ranges=[[0, 1], [0, 1], [0, 1]], num_scenes=1,
            num_frames=1, resolution=[8, 8], num_channels=2,
            v_range=[-1, 1]), ds)
        import warnings

        with warnings.catch_warnings(record=True) as rec:
            warnings.simplefilter("always")
            out = encode_dataset(lambda b: np.zeros((b.shape[0], 4),
                                                    np.float32), ds, 4)
        assert any("contract" in str(w.message) for w in rec)
        assert os.path.exists(os.path.join(out, "0.npz"))

    def test_code_suffix_roundtrip(self, tmp_path):
        # Codes from different AEs of the same z_num coexist via suffix:
        # encode writes code<z><suffix>/ and CodeDataset reads it back.
        from deepfluids_tpu.data.dataset import CodeDataset
        from deepfluids_tpu.data.manifest import Manifest, save_manifest
        from deepfluids_tpu.infer import encode_dataset

        ds = str(tmp_path / "ds")
        os.makedirs(os.path.join(ds, "v"))
        for f in range(3):
            np.savez_compressed(
                os.path.join(ds, "v", f"0_{f}.npz"),
                x=np.zeros((8, 8, 2), np.float32),
                y=np.array([0.5, 0.5, float(f)]))
        save_manifest(Manifest(
            param_names=["a", "b", "frame"],
            param_ranges=[[0, 1], [0, 1], [0, 2]], num_scenes=1,
            num_frames=3, resolution=[8, 8], num_channels=2,
            v_range=[-1, 1]), ds)
        enc = lambda b: np.ones((b.shape[0], 4), np.float32)
        out = encode_dataset(enc, ds, 4, suffix="_aug")
        assert out.endswith("code4_aug")
        cd = CodeDataset(ds, 4, suffix="_aug")
        assert cd.code_dir.endswith("code4_aug")
        assert cd.z[0].shape == (3, 4)
        with pytest.raises(FileNotFoundError):
            CodeDataset(ds, 4)          # unsuffixed set was never written
