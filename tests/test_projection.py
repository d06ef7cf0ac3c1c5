"""Matched-projection / multigrid tests (datagen/projection.py — the
round-3 data-quality fix; see BENCHMARKS.md "the 0.25 floor, explained")."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepfluids_tpu.datagen import grids, projection as prj
from deepfluids_tpu.ops import fd


def _rand(shape, seed=0):
    return jnp.asarray(np.random.default_rng(seed).standard_normal(shape),
                       jnp.float32)


class TestAdjoints:
    def test_fdiff_adj_matches_vjp(self):
        for shape, axis in (((13, 9), -1), ((13, 9), -2), ((5, 7, 6), -3)):
            x = _rand(shape, 1)
            y = _rand(shape, 2)
            f = lambda q: fd._fdiff(q, axis=axis)
            lhs = jnp.vdot(f(x), y)
            rhs = jnp.vdot(x, prj._fdiff_adj(y, axis=axis))
            assert abs(float(lhs - rhs)) < 1e-3 * abs(float(lhs)) + 1e-5

    def test_div_adjoint(self):
        for shape, nd in (((12, 10), 2), ((6, 8, 10), 3)):
            v = _rand(shape + (nd,), 3)
            p = _rand(shape, 4)
            lhs = jnp.vdot(prj.div_f(v), p)
            rhs = jnp.vdot(v, prj.div_f_adj(p, nd))
            assert abs(float(lhs - rhs)) < 1e-3 * abs(float(lhs)) + 1e-5

    def test_curl_adjoint(self):
        p = _rand((12, 10), 5)
        v = _rand((12, 10, 2), 6)
        lhs = jnp.vdot(prj._curl(p), v)
        rhs = jnp.vdot(p, prj._curl_adj(v))
        assert abs(float(lhs - rhs)) < 1e-3 * abs(float(lhs)) + 1e-5


class TestDiagProbe:
    def test_probed_diag_matches_dense(self):
        # Dense-verify the stride-colored diagonal on a small grid for both
        # registered operators (the 2-color version silently corrupts
        # boundary rows — the bug class this test pins).
        for op in ("div_lap", "curl_ls"):
            shape = (8, 6)
            setup = prj._mg_setup(op, shape, "float32")
            A = setup["A_fns"][0]
            n = shape[0] * shape[1]
            dense = np.zeros((n, n), np.float32)
            for i in range(n):
                e = np.zeros(n, np.float32)
                e[i] = 1
                dense[:, i] = np.asarray(A(jnp.asarray(e.reshape(shape)))
                                         ).ravel()
            # symmetric (variational) and PSD-ish
            assert np.abs(dense - dense.T).max() < 1e-5
            if len(setup["shapes"]) > 1:
                probed = np.asarray(prj._op_diag(A, shape, jnp.float32))
                np.testing.assert_allclose(np.diag(dense).reshape(shape),
                                           probed, rtol=1e-5)


class TestMultigrid:
    def test_vcycle_converges_div_lap(self):
        vel = _rand((64, 48, 2), 7)
        b = prj.div_f(vel)
        setup = prj._mg_setup("div_lap", (64, 48), "float32")
        b = prj._deflate(b, setup["null"])
        x = jnp.zeros_like(b)
        nb = float(jnp.linalg.norm(b))
        for _ in range(8):
            x = prj._vcycle(b, x, setup, 0)
        r = float(jnp.linalg.norm(b - setup["A_fns"][0](x))) / nb
        assert r < 1e-2

    def test_vcycle_converges_curl_ls(self):
        vel = _rand((64, 48, 2), 8)
        m = prj._ring_mask((64, 48), jnp.float32)
        b = m * prj._curl_adj(vel)
        setup = prj._mg_setup("curl_ls", (64, 48), "float32")
        x = jnp.zeros_like(b)
        nb = float(jnp.linalg.norm(b))
        for _ in range(8):
            x = prj._vcycle(b, x, setup, 0)
        r = float(jnp.linalg.norm(b - setup["A_fns"][0](x))) / nb
        assert r < 1e-4


class TestProjectCurl2D:
    def test_on_manifold_and_walls(self):
        """The headline property: output is exactly curl(psi) with zero
        wall-normal flow (the frame lies ON the generator's manifold)."""
        vel = _rand((48, 32, 2), 9)
        out, psi = prj.project_curl2d(vel, cycles=8, return_psi=True)
        # exactly representable: out == curl2d(psi)
        np.testing.assert_allclose(np.asarray(out),
                                   np.asarray(fd.curl2d(psi[..., None])),
                                   atol=1e-6)
        # forward-difference divergence-free (interior; full grid here
        # since curl's replicated edges are part of the manifold)
        d = np.asarray(fd.divergence2d(out))[:-1, :-1]
        assert np.abs(d).max() < 1e-4
        # zero through-flow on every wall
        o = np.asarray(out)
        assert np.abs(o[:, 0, 0]).max() == 0
        assert np.abs(o[:, -1, 0]).max() == 0
        assert np.abs(o[0, :, 1]).max() == 0
        assert np.abs(o[-1, :, 1]).max() == 0

    def test_is_projection(self):
        """Idempotent and norm-nonincreasing (orthogonal projection)."""
        vel = _rand((48, 32, 2), 10)
        out = prj.project_curl2d(vel, cycles=8)
        out2 = prj.project_curl2d(out, cycles=8)
        rms = float(jnp.sqrt((out ** 2).mean()))
        assert float(jnp.sqrt(((out2 - out) ** 2).mean())) / rms < 1e-3
        assert float(jnp.linalg.norm(out)) <= float(jnp.linalg.norm(vel))

    def test_preserves_curl_fields(self):
        """A field already of the form curl(psi), psi = 0 on the ring, is
        (near-)fixed by the projection."""
        psi = _rand((48, 32), 11) * prj._ring_mask((48, 32), jnp.float32)
        # smooth it so the LS fit is well-conditioned in f32
        for _ in range(4):
            psi = jnp.asarray(grids.advect2d(psi, jnp.zeros((48, 32, 2)), 0.0))
            psi = 0.25 * (jnp.roll(psi, 1, 0) + jnp.roll(psi, -1, 0)
                          + jnp.roll(psi, 1, 1) + jnp.roll(psi, -1, 1))
        psi = psi * prj._ring_mask((48, 32), jnp.float32)
        v = fd.curl2d(psi[..., None])
        out = prj.project_curl2d(v, cycles=8)
        rel = float(jnp.linalg.norm(out - v) / jnp.linalg.norm(v))
        assert rel < 1e-3


class TestMatchedSmokeScene:
    def test_trajectory_on_manifold(self):
        from deepfluids_tpu.datagen.smoke2d import (Smoke2DConfig,
                                                    simulate_smoke2d)

        cfg = Smoke2DConfig(height=32, width=32, num_frames=8,
                            projection="matched", mg_cycles=6)
        vt, rt = simulate_smoke2d(jnp.float32(0.5), jnp.float32(0.1), cfg)
        assert bool(jnp.isfinite(vt).all())
        # every frame forward-div-free (the dataset contract)
        d = np.asarray(fd.divergence2d(vt[-1]))
        assert np.abs(d).max() < 1e-4
        # plume still rises: upward KE grows
        ke = np.asarray((vt ** 2).sum(axis=(1, 2, 3)))
        assert ke[-1] > ke[1]


class TestProjectCurl3D:
    def test_curl3_adjoint(self):
        psi = _rand((6, 8, 10, 3), 12)
        v = _rand((6, 8, 10, 3), 13)
        lhs = jnp.vdot(fd.curl3d(psi), v)
        rhs = jnp.vdot(psi, prj._curl3_adj(v))
        assert abs(float(lhs - rhs)) < 1e-3 * abs(float(lhs)) + 1e-5

    def test_on_manifold_walls_and_near_idempotent(self):
        vel = _rand((12, 16, 16, 3), 14)
        out, psi = prj.project_curl3d(vel, cycles=12, return_psi=True)
        np.testing.assert_allclose(np.asarray(out),
                                   np.asarray(fd.curl3d(psi)), atol=1e-6)
        o = np.asarray(out)
        assert np.abs(o[:, :, 0, 0]).max() == 0    # x-walls: u = 0
        assert np.abs(o[:, :, -1, 0]).max() == 0
        assert np.abs(o[:, 0, :, 1]).max() == 0    # y-walls: v = 0
        assert np.abs(o[:, -1, :, 1]).max() == 0
        assert np.abs(o[0, :, :, 2]).max() == 0    # z-walls: w = 0
        assert np.abs(o[-1, :, :, 2]).max() == 0
        out2 = prj.project_curl3d(out, cycles=12)
        rel = float(jnp.linalg.norm(out2 - out) / jnp.linalg.norm(out))
        # semidefinite system (gauge modes): near- rather than exactly
        # idempotent at finite cycles
        assert rel < 0.05
        assert float(jnp.linalg.norm(out)) <= float(jnp.linalg.norm(vel))


class TestMatchedSmoke3DScene:
    def test_trajectory_on_manifold(self):
        from deepfluids_tpu.datagen.smoke3d import (Smoke3DConfig,
                                                    simulate_smoke3d)

        cfg = Smoke3DConfig(depth=8, height=16, width=16, num_frames=6,
                            projection="matched", mg_cycles=10)
        vt, rt = simulate_smoke3d(jnp.float32(1.0), jnp.float32(0.08), cfg)
        assert bool(jnp.isfinite(vt).all())
        d = np.asarray(fd.divergence3d(vt[-1]))
        v_rms = float(np.sqrt((np.asarray(vt[-1]) ** 2).mean()))
        assert np.abs(d).max() < 0.05 * max(v_rms, 1e-6)
        ke = np.asarray((vt ** 2).sum(axis=(1, 2, 3, 4)))
        assert ke[-1] > ke[1]
