"""Datagen solver + scene/manifest contract tests (SURVEY.md §4, §3.5)."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from deepfluids_tpu.data import BatchManager, FieldDataset, load_manifest
from deepfluids_tpu.datagen import (
    Liquid2DConfig,
    Smoke2DConfig,
    Smoke3DConfig,
    scenes,
    simulate_liquid2d,
    simulate_smoke2d,
    simulate_smoke3d,
)
from deepfluids_tpu.datagen.grids import divergence2d_c, divergence3d_c


class TestSmoke2DSolver:
    def test_projection_typo_rejected(self):
        # 'Matched'/'leray' must fail at construction, not silently fall
        # through to the Jacobi branch and generate off-manifold frames.
        import pytest as _pytest

        for bad in ("Matched", "leray", "matchd"):
            with _pytest.raises(ValueError, match="projection"):
                Smoke2DConfig(projection=bad)
            with _pytest.raises(ValueError, match="projection"):
                Smoke3DConfig(projection=bad)

    def test_datagen_cli_projection_flag(self, tmp_path, monkeypatch):
        # `python -m deepfluids_tpu.datagen --projection matched` must reach
        # the scene fn (round-3 matched datasets are generated via the CLI);
        # and it must be rejected for the FLIP liquid scene, which has no
        # pressure-projection knob.
        import sys

        from deepfluids_tpu.datagen import __main__ as cli

        seen = {}

        def fake_scene(out_root, **kwargs):
            seen.update(kwargs)
            return out_root

        monkeypatch.setitem(cli.SCENES, "smoke_pos21_size5", fake_scene)
        monkeypatch.setattr(sys, "argv", [
            "datagen", "--scene", "smoke_pos21_size5", "--out",
            str(tmp_path), "--num-a", "2", "--num-b", "1",
            "--num-frames", "3", "--projection", "matched"])
        cli.main()
        assert seen["projection"] == "matched"
        assert seen["num_pos"] == 2 and seen["num_frames"] == 3

        monkeypatch.setattr(sys, "argv", [
            "datagen", "--scene", "liquid_pos10_size4", "--out",
            str(tmp_path), "--projection", "matched"])
        with pytest.raises(SystemExit):
            cli.main()

    def test_plume_rises_and_projects(self):
        cfg = Smoke2DConfig(height=48, width=32, num_frames=12,
                            project_iters=30)
        vt, rt = simulate_smoke2d(jnp.float32(0.5), jnp.float32(0.1), cfg)
        vt, rt = np.asarray(vt), np.asarray(rt)
        assert vt.shape == (12, 48, 32, 2)
        assert rt.shape == (12, 48, 32)
        assert np.isfinite(vt).all()
        # density is injected and transported upward over time
        assert rt[-1].sum() > rt[0].sum()
        com_y_first = (rt[2] * np.arange(48)[:, None]).sum() / rt[2].sum()
        com_y_last = (rt[-1] * np.arange(48)[:, None]).sum() / rt[-1].sum()
        assert com_y_last > com_y_first
        # projection keeps divergence small relative to velocity scale
        div = np.asarray(divergence2d_c(jnp.asarray(vt[-1])))
        assert np.abs(div[2:-2, 2:-2]).max() < 0.5 * (np.abs(vt[-1]).max() + 1e-6)

    def test_moving_source(self):
        cfg = Smoke2DConfig(height=32, width=32, num_frames=8,
                            project_iters=20)
        xs = jnp.linspace(0.3, 0.7, 8)
        vt, rt = simulate_smoke2d(jnp.float32(0.3), jnp.float32(0.1), cfg,
                                  pos_x_per_frame=xs, moving=True)
        assert np.asarray(vt).shape == (8, 32, 32, 2)
        assert np.isfinite(np.asarray(vt)).all()


class TestSmoke3DSolver:
    def test_shapes_and_motion(self):
        cfg = Smoke3DConfig(depth=8, height=16, width=16, num_frames=6,
                            project_iters=20)
        vt, rt = simulate_smoke3d(jnp.float32(1.0), jnp.float32(0.08), cfg)
        vt, rt = np.asarray(vt), np.asarray(rt)
        assert vt.shape == (6, 8, 16, 16, 3)
        assert np.isfinite(vt).all()
        assert rt[-1].sum() > 0


class TestLiquid2DSolver:
    def test_levelset_falls(self):
        cfg = Liquid2DConfig(height=48, width=32, num_frames=10,
                             project_iters=30)
        phit, velt = simulate_liquid2d(jnp.float32(0.5), jnp.float32(0.1),
                                       cfg)
        phit = np.asarray(phit)
        assert phit.shape == (10, 48, 32, 1)
        assert np.isfinite(phit).all()
        # there is liquid (negative levelset) throughout
        assert (phit[0] < 0).any() and (phit[-1] < 0).any()


@pytest.fixture(scope="module")
def tiny_smoke_dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("data")
    out = scenes.smoke_pos21_size5(
        str(root), num_pos=2, num_size=2, num_frames=4, height=32, width=32,
        name="tiny_smoke",
    )
    return out


class TestSceneContract:
    def test_manifest_and_files(self, tiny_smoke_dataset):
        m = load_manifest(tiny_smoke_dataset)
        assert m.num_param == 3
        assert m.param_names[-1] == "frame"
        assert m.resolution == [32, 32]
        assert m.num_channels == 2
        assert m.v_range[0] < m.v_range[1]
        files = os.listdir(os.path.join(tiny_smoke_dataset, "v"))
        assert len(files) == 2 * 2 * 4
        # density dumped too
        assert len(os.listdir(os.path.join(tiny_smoke_dataset, "d"))) == 16

    def test_field_dataset_and_normalization(self, tiny_smoke_dataset):
        ds = FieldDataset(tiny_smoke_dataset)
        x, y = ds.get(0)
        assert x.shape == (32, 32, 2)
        assert y.shape == (3,)
        xn, yn = ds.get_normalized(0)
        assert np.abs(xn).max() <= 1.0 + 1e-6
        assert np.abs(yn).max() <= 1.0 + 1e-6

    def test_batch_manager(self, tiny_smoke_dataset):
        bm = BatchManager(tiny_smoke_dataset, batch_size=4, seed=0)
        batches = list(bm.batches(3))
        assert len(batches) == 3
        x, y = batches[0]
        assert x.shape == (4, 32, 32, 2)
        assert y.shape == (4, 3)
        # deterministic given the seed
        bm2 = BatchManager(tiny_smoke_dataset, batch_size=4, seed=0)
        x2, y2 = next(iter(bm2.batches(1)))
        np.testing.assert_array_equal(x, x2)
        np.testing.assert_array_equal(y, y2)

    def test_denorm_roundtrip(self, tiny_smoke_dataset):
        ds = FieldDataset(tiny_smoke_dataset)
        m = ds.manifest
        x, _ = ds.get(1)
        np.testing.assert_allclose(
            m.denormalize_field(m.normalize_field(x)), x, rtol=1e-5
        )
        p = np.array([0.3, 0.1, 2.0], np.float32)
        np.testing.assert_allclose(
            m.denormalize_params(m.normalize_params(p)), p, rtol=1e-4,
            atol=1e-5,
        )


class TestLiquidScene:
    def test_levelset_dataset(self, tmp_path):
        out = scenes.liquid_pos10_size4(
            str(tmp_path), num_pos=1, num_size=1, num_frames=3, height=32,
            width=32, name="tiny_liquid",
        )
        m = load_manifest(out)
        assert m.data_type == "levelset"
        assert m.num_channels == 1
        ds = FieldDataset(out, field_key="l")
        x, y = ds.get(0)
        assert x.shape == (32, 32, 1)


class TestLiquidFLIP:
    """Physics pins for the FLIP liquid solver (r1 VERDICT: the previous
    grid-levelset variant was 'not FLIP' and lost volume)."""

    def test_volume_conserved_and_drop_falls(self):
        from deepfluids_tpu.datagen.liquid2d import (Liquid2DConfig,
                                                     simulate_liquid2d)

        cfg = Liquid2DConfig(height=48, width=32, num_frames=36,
                             project_iters=30)
        phit, velt = simulate_liquid2d(jnp.float32(0.5), jnp.float32(0.12),
                                       cfg)
        phit = np.asarray(phit)
        assert np.isfinite(phit).all() and np.isfinite(np.asarray(velt)).all()
        # particles are never created/destroyed: liquid area stays within
        # 25% of the initial fraction for the whole trajectory
        area = (phit[..., 0] < 0).mean(axis=(1, 2))
        assert (np.abs(area - area[0]) / area[0] < 0.25).all()
        # the drop is in free fall: the highest liquid row descends
        top = lambda t: int(
            np.nonzero((phit[t, ..., 0] < 0).any(axis=1))[0].max())
        assert top(30) < top(0) - 8

    def test_batch_matches_single(self):
        from deepfluids_tpu.datagen.liquid2d import (Liquid2DConfig,
                                                     simulate_liquid2d,
                                                     simulate_liquid2d_batch)

        cfg = Liquid2DConfig(height=24, width=16, num_frames=4,
                             project_iters=10)
        p1, v1 = simulate_liquid2d(jnp.float32(0.4), jnp.float32(0.1), cfg)
        pb, vb = simulate_liquid2d_batch(
            jnp.asarray([0.4, 0.6]), jnp.asarray([0.1, 0.1]), cfg)
        np.testing.assert_allclose(np.asarray(pb[0]), np.asarray(p1),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(vb[0]), np.asarray(v1),
                                   atol=1e-5)


class TestGrainLoader:
    def test_grain_batches(self, tiny_smoke_dataset):
        pytest.importorskip("grain")
        from deepfluids_tpu.data.grain_loader import make_grain_loader

        it = make_grain_loader(tiny_smoke_dataset, batch_size=4, seed=0,
                               num_epochs=1, worker_count=0)
        x, y = next(iter(it))
        assert x.shape == (4, 32, 32, 2)
        assert y.shape == (4, 3)
        assert np.abs(x).max() <= 1.0 + 1e-6


    def test_grain_multiprocess_workers(self, tiny_smoke_dataset):
        # worker_count >= 2 spawns real child processes — the exact path
        # the FieldDataset pickling support exists for (commit 9fe2ce3).
        pytest.importorskip("grain")
        from deepfluids_tpu.data.grain_loader import make_grain_loader

        it = make_grain_loader(tiny_smoke_dataset, batch_size=4, seed=0,
                               num_epochs=1, worker_count=2)
        batches = list(it)
        assert len(batches) == 4  # 16 frames / batch 4
        for x, y in batches:
            assert x.shape == (4, 32, 32, 2)
            assert np.isfinite(x).all()

    def test_grain_sharding_disjoint_and_deterministic(self,
                                                       tiny_smoke_dataset):
        pytest.importorskip("grain")
        from deepfluids_tpu.data.grain_loader import make_grain_loader

        def collect(shard_index):
            it = make_grain_loader(tiny_smoke_dataset, batch_size=2, seed=0,
                                   num_epochs=1, worker_count=0,
                                   shard_index=shard_index, shard_count=2)
            return np.concatenate([y for _, y in it])

        a1, a2, b = collect(0), collect(0), collect(1)
        np.testing.assert_array_equal(a1, a2)  # re-run reproduces stream
        rows = lambda arr: {tuple(np.round(r, 5)) for r in arr}
        assert not rows(a1) & rows(b)          # shards see disjoint records
        assert len(rows(a1) | rows(b)) == 16   # and cover the epoch

    @pytest.mark.parametrize("worker_count", [0, 2])
    def test_grain_skip_matches_fresh_tail(self, tiny_smoke_dataset,
                                           worker_count):
        # Decode-free resume: skip_batches=k must reproduce the fresh
        # stream from batch k exactly (the supervisor's cheap-resume
        # contract for --input_pipeline grain).
        pytest.importorskip("grain")
        from deepfluids_tpu.data.grain_loader import make_grain_loader

        def stream(skip):
            it = make_grain_loader(tiny_smoke_dataset, batch_size=4, seed=0,
                                   num_epochs=1, worker_count=worker_count,
                                   skip_batches=skip)
            return list(it)

        fresh, resumed = stream(0), stream(2)
        assert len(fresh) == 4 and len(resumed) == 2
        for (xf, yf), (xr, yr) in zip(fresh[2:], resumed):
            np.testing.assert_array_equal(xf, xr)
            np.testing.assert_array_equal(yf, yr)


class TestMovScene:
    def test_smoke_mov_contract(self, tmp_path):
        out = scenes.smoke_mov(str(tmp_path), num_scenes=3, num_frames=5,
                               height=32, width=32, name="tinymov")
        m = load_manifest(out)
        assert m.num_param == 2 and m.num_scenes == 3
        files = os.listdir(os.path.join(out, "v"))
        assert len(files) == 3 * 5
        ds = FieldDataset(out)
        x, y = ds.get(0)
        assert x.shape == (32, 32, 2)
        assert y.shape == (2,)
        # per-frame source positions vary within a scene's params
        ys = np.stack([ds.get(i)[1] for i in range(5)])
        assert np.isfinite(ys).all()


class TestBatchedSolverConsistency:
    def test_batch_matches_single_scene(self):
        from deepfluids_tpu.datagen.smoke2d import (Smoke2DConfig,
                                                    simulate_smoke2d,
                                                    simulate_smoke2d_batch)

        cfg = Smoke2DConfig(height=24, width=16, num_frames=4,
                            project_iters=10)
        v1, r1 = simulate_smoke2d(jnp.float32(0.4), jnp.float32(0.1), cfg)
        vb, rb = simulate_smoke2d_batch(
            jnp.asarray([0.4, 0.6]), jnp.asarray([0.1, 0.1]), cfg)
        np.testing.assert_allclose(np.asarray(vb[0]), np.asarray(v1),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(rb[0]), np.asarray(r1),
                                   atol=1e-5)


class TestPicklableSource:
    def test_field_dataset_pickles(self, tiny_smoke_dataset):
        # grain worker processes serialize the data source; the lock/cache
        # must not break pickling.
        import pickle

        ds = FieldDataset(tiny_smoke_dataset)
        ds.get(0)  # populate cache
        ds2 = pickle.loads(pickle.dumps(ds))
        x, y = ds2.get(0)
        assert x.shape == (32, 32, 2)


class TestSolverConsistency:
    """Small-scale pin of tools/solver_consistency.py's conclusions
    (SURVEY.md §7 hard parts: pressure-solve adequacy; full-scale record in
    BENCHMARKS.jsonl metric=solver_consistency_2d)."""

    def test_cg_beats_jacobi_and_ordering_holds(self):
        from deepfluids_tpu.datagen import grids

        # Developed-ish field: run a short plume, then advect once to put
        # fresh divergence in.
        cfg = Smoke2DConfig(height=48, width=32, num_frames=20,
                            project_iters=20)
        vel, _ = simulate_smoke2d(jnp.float32(0.5), jnp.float32(0.12), cfg)
        dirty = grids.advect2d(vel[-1], vel[-1], 1.0)

        def div_rms(v):
            d = np.asarray(divergence2d_c(jnp.asarray(v)))[1:-1, 1:-1]
            return float(np.sqrt((d * d).mean()))

        d0 = div_rms(dirty)
        j20 = np.asarray(grids.pressure_project2d(dirty, iters=20))
        j100 = np.asarray(grids.pressure_project2d(dirty, iters=100))
        # f32 CG: modest tol (grids.solve_pressure2d_cg docstring).
        cg = np.asarray(grids.pressure_project2d_cg(dirty, tol=1e-5,
                                                    maxiter=3000))

        # Residual ordering: converged CG < Jacobi-100 < Jacobi-20 < dirty.
        assert div_rms(cg) < div_rms(j100) < div_rms(j20) < d0

        # Jacobi iterates approach the converged projection monotonically.
        rms = float(np.sqrt((cg ** 2).mean()))
        d_j20 = float(np.sqrt(((j20 - cg) ** 2).mean())) / rms
        d_j100 = float(np.sqrt(((j100 - cg) ** 2).mean())) / rms
        assert d_j100 < d_j20

        # The converged projection is (near-)idempotent; Jacobi-20's is not.
        cg2 = np.asarray(grids.pressure_project2d_cg(
            jnp.asarray(cg), tol=1e-5, maxiter=3000))
        rep = float(np.sqrt(((cg2 - cg) ** 2).mean())) / rms
        j20b = np.asarray(grids.pressure_project2d(jnp.asarray(j20),
                                                   iters=20))
        rep_j = float(np.sqrt(((j20b - j20) ** 2).mean())) / rms
        assert rep < 0.5 * rep_j

    def test_matched_closer_to_converged_than_jacobi(self):
        # Pin of tools/solver_consistency.py's "matched" mode conclusion
        # (full-scale record: metric=solver_consistency_matched2d): the
        # matched-projection trajectory sits closer to the converged-CG
        # trajectory than the production Jacobi trajectory does, in
        # late-window kinetic energy.  Scale note: BELOW ~64x48 the
        # conclusion inverts — the matched operator's zero-Dirichlet psi
        # ring is a large fraction of a tiny domain — so this pin runs at
        # 96x64 (margin 2.1x there, 6.4x at the full-scale 128x96).
        cfg = dict(height=96, width=64, num_frames=60)
        pos, size = jnp.float32(0.5), jnp.float32(0.07)
        vc, _ = simulate_smoke2d(pos, size,
                                 Smoke2DConfig(projection="cg", **cfg))
        vm, _ = simulate_smoke2d(pos, size,
                                 Smoke2DConfig(projection="matched", **cfg))
        vj, _ = simulate_smoke2d(pos, size, Smoke2DConfig(**cfg))

        def ke(v):
            return np.asarray((v ** 2).sum(axis=(1, 2, 3)))[30:]

        gap_m = np.abs(ke(vm) - ke(vc)).mean()
        gap_j = np.abs(ke(vj) - ke(vc)).mean()
        assert gap_m < gap_j

    def test_cg_beats_jacobi_3d(self):
        # 3D analogue (full-scale record: metric=solver_consistency_3d).
        from deepfluids_tpu.datagen import grids

        cfg = Smoke3DConfig(depth=8, height=16, width=12, num_frames=12,
                            project_iters=20)
        vel, _ = simulate_smoke3d(jnp.float32(1.0), jnp.float32(0.06), cfg)
        dirty = grids.advect3d(vel[-1], vel[-1], 1.0)

        def div_rms(v):
            d = np.asarray(divergence3d_c(jnp.asarray(v)))[1:-1, 1:-1, 1:-1]
            return float(np.sqrt((d * d).mean()))

        d0 = div_rms(dirty)
        j20 = np.asarray(grids.pressure_project3d(dirty, iters=20))
        j80 = np.asarray(grids.pressure_project3d(dirty, iters=80))
        cg = np.asarray(grids.pressure_project3d_cg(dirty, tol=1e-5,
                                                    maxiter=3000))
        assert div_rms(cg) < div_rms(j80) < div_rms(j20) < d0

        rms = float(np.sqrt((cg ** 2).mean()))
        d_j20 = float(np.sqrt(((j20 - cg) ** 2).mean())) / rms
        d_j80 = float(np.sqrt(((j80 - cg) ** 2).mean())) / rms
        assert d_j80 < d_j20
