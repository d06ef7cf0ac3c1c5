"""Unit tests for the finite-difference physics core (SURVEY.md §4 test plan).

Pins down: analytic derivatives, exact interior divergence-freeness of
curl-produced fields (the reference's key architectural invariant), shape
preservation, batching, and the Pallas kernels against the jnp oracle.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepfluids_tpu import ops


def _grid2d(h, w):
    y = np.arange(h, dtype=np.float64)[:, None]
    x = np.arange(w, dtype=np.float64)[None, :]
    return y, x


class TestCurl2D:
    def test_shapes(self):
        psi = jnp.zeros((2, 16, 12, 1))
        u = ops.curl2d(psi)
        assert u.shape == (2, 16, 12, 2)

    def test_linear_psi_constant_velocity(self):
        # psi = 2y - 3x  ->  u = dpsi/dy = 2, v = -dpsi/dx = 3 (everywhere,
        # including the replicated edge, since derivatives are constant).
        h, w = 16, 12
        y, x = _grid2d(h, w)
        psi = (2.0 * y - 3.0 * x)[None, :, :, None]
        u = np.asarray(ops.curl2d(jnp.asarray(psi, jnp.float32)))
        np.testing.assert_allclose(u[..., 0], 2.0, atol=1e-5)
        np.testing.assert_allclose(u[..., 1], 3.0, atol=1e-5)

    def test_divergence_free_interior(self):
        # Random psi -> curl -> forward-diff divergence must vanish exactly
        # in the interior (forward differences commute).
        rng = np.random.default_rng(1)
        psi = jnp.asarray(rng.standard_normal((3, 24, 20, 1)), jnp.float32)
        u = ops.curl2d(psi)
        div = np.asarray(ops.divergence2d(u))[:, :-2, :-2, :]
        np.testing.assert_allclose(div, 0.0, atol=1e-5)

    def test_forward_diff_edge_replication(self):
        # psi = y^2: dpsi/dy forward diff at row i is (i+1)^2 - i^2 = 2i+1,
        # and the last row replicates row H-2's derivative.
        h, w = 8, 8
        y, x = _grid2d(h, w)
        psi = (y * y * np.ones_like(x))[None, :, :, None]
        u = np.asarray(ops.curl2d(jnp.asarray(psi, jnp.float32)))[0, :, :, 0]
        expect = 2.0 * np.arange(h) + 1.0
        expect[-1] = expect[-2]
        np.testing.assert_allclose(u[:, 0], expect, atol=1e-4)


class TestJacobian2D:
    def test_shapes(self):
        x = jnp.zeros((2, 16, 12, 2))
        j, w = ops.jacobian2d(x)
        assert j.shape == (2, 16, 12, 4)
        assert w.shape == (2, 16, 12, 1)

    def test_linear_field(self):
        # u = x + 2y, v = 3x + 4y -> J = (1, 2, 3, 4), vort = 3 - 2 = 1.
        h, w = 10, 14
        y, x = _grid2d(h, w)
        u = x + 2 * y
        v = 3 * x + 4 * y
        vel = jnp.asarray(np.stack([u, v], -1)[None], jnp.float32)
        j, vort = ops.jacobian2d(vel)
        j, vort = np.asarray(j), np.asarray(vort)
        for k, val in enumerate([1.0, 2.0, 3.0, 4.0]):
            np.testing.assert_allclose(j[..., k], val, atol=1e-5)
        np.testing.assert_allclose(vort[..., 0], 1.0, atol=1e-5)

    def test_vorticity_matches_jacobian(self):
        rng = np.random.default_rng(2)
        vel = jnp.asarray(rng.standard_normal((2, 12, 12, 2)), jnp.float32)
        _, w1 = ops.jacobian2d(vel)
        w2 = ops.vorticity2d(vel)
        np.testing.assert_allclose(np.asarray(w1), np.asarray(w2), atol=1e-6)


class TestCurl3D:
    def test_shapes(self):
        psi = jnp.zeros((2, 8, 10, 12, 3))
        u = ops.curl3d(psi)
        assert u.shape == (2, 8, 10, 12, 3)

    def test_divergence_free_interior(self):
        rng = np.random.default_rng(3)
        psi = jnp.asarray(rng.standard_normal((2, 10, 12, 14, 3)), jnp.float32)
        u = ops.curl3d(psi)
        div = np.asarray(ops.divergence3d(u))[:, :-2, :-2, :-2, :]
        np.testing.assert_allclose(div, 0.0, atol=1e-5)

    def test_analytic_curl(self):
        # Psi = (0, 0, c) with c = 2y - 5x -> u = dc/dy = 2, v = -dc/dx = 5, w = 0.
        d, h, w = 6, 8, 10
        z = np.zeros((d, h, w))
        y = np.arange(h, dtype=np.float64)[None, :, None] * np.ones((d, 1, w))
        x = np.arange(w, dtype=np.float64)[None, None, :] * np.ones((d, h, 1))
        c = 2.0 * y - 5.0 * x
        psi = jnp.asarray(np.stack([z, z, c], -1)[None], jnp.float32)
        u = np.asarray(ops.curl3d(psi))
        np.testing.assert_allclose(u[..., 0], 2.0, atol=1e-5)
        np.testing.assert_allclose(u[..., 1], 5.0, atol=1e-5)
        np.testing.assert_allclose(u[..., 2], 0.0, atol=1e-5)


class TestJacobian3D:
    def test_shapes_and_linear(self):
        d, h, w = 5, 6, 7
        z = np.arange(d, dtype=np.float64)[:, None, None] * np.ones((1, h, w))
        y = np.arange(h, dtype=np.float64)[None, :, None] * np.ones((d, 1, w))
        x = np.arange(w, dtype=np.float64)[None, None, :] * np.ones((d, h, 1))
        # u = x + 2y + 3z, v = 4x + 5y + 6z, w = 7x + 8y + 9z
        vel = np.stack(
            [x + 2 * y + 3 * z, 4 * x + 5 * y + 6 * z, 7 * x + 8 * y + 9 * z],
            axis=-1,
        )[None]
        j, vort = ops.jacobian3d(jnp.asarray(vel, jnp.float32))
        j, vort = np.asarray(j), np.asarray(vort)
        assert j.shape == (1, d, h, w, 9)
        assert vort.shape == (1, d, h, w, 3)
        for k in range(9):
            np.testing.assert_allclose(j[..., k], float(k + 1), atol=1e-4)
        # vort = (dwdy - dvdz, dudz - dwdx, dvdx - dudy) = (8-6, 3-7, 4-2)
        np.testing.assert_allclose(vort[..., 0], 2.0, atol=1e-4)
        np.testing.assert_allclose(vort[..., 1], -4.0, atol=1e-4)
        np.testing.assert_allclose(vort[..., 2], 2.0, atol=1e-4)


class TestGradFlow:
    def test_curl_is_differentiable(self):
        def loss(psi):
            return jnp.sum(ops.curl2d(psi) ** 2)

        g = jax.grad(loss)(jnp.ones((1, 8, 8, 1)))
        assert g.shape == (1, 8, 8, 1)
        assert np.isfinite(np.asarray(g)).all()


class TestPallasParity:
    """Pallas kernels (interpret mode on CPU) vs the jnp oracle."""

    @pytest.mark.parametrize("shape", [(2, 16, 12), (1, 128, 96), (3, 8, 8)])
    def test_curl2d_fused(self, shape):
        rng = np.random.default_rng(4)
        b, h, w = shape
        psi = jnp.asarray(rng.standard_normal((b, h, w, 1)), jnp.float32)
        got = np.asarray(ops.curl2d_fused(psi))
        want = np.asarray(ops.curl2d(psi))
        np.testing.assert_allclose(got, want, atol=1e-6)

    @pytest.mark.parametrize("shape", [(2, 16, 12), (1, 128, 96)])
    def test_jacobian2d_fused(self, shape):
        rng = np.random.default_rng(5)
        b, h, w = shape
        x = jnp.asarray(rng.standard_normal((b, h, w, 2)), jnp.float32)
        gj, gw = ops.jacobian2d_fused(x)
        wj, ww = ops.jacobian2d(x)
        np.testing.assert_allclose(np.asarray(gj), np.asarray(wj), atol=1e-6)
        np.testing.assert_allclose(np.asarray(gw), np.asarray(ww), atol=1e-6)

    @pytest.mark.parametrize("shape", [(2, 6, 10, 12), (1, 8, 16, 16)])
    def test_curl3d_fused(self, shape):
        rng = np.random.default_rng(6)
        b, d, h, w = shape
        psi = jnp.asarray(rng.standard_normal((b, d, h, w, 3)), jnp.float32)
        got = np.asarray(ops.curl3d_fused(psi))
        want = np.asarray(ops.curl3d(psi))
        np.testing.assert_allclose(got, want, atol=1e-6)

    @pytest.mark.parametrize("shape", [(2, 6, 10, 12)])
    def test_jacobian3d_fused(self, shape):
        rng = np.random.default_rng(7)
        b, d, h, w = shape
        x = jnp.asarray(rng.standard_normal((b, d, h, w, 3)), jnp.float32)
        gj, gw = ops.jacobian3d_fused(x)
        wj, ww = ops.jacobian3d(x)
        np.testing.assert_allclose(np.asarray(gj), np.asarray(wj), atol=1e-6)
        np.testing.assert_allclose(np.asarray(gw), np.asarray(ww), atol=1e-6)

    def test_curl3d_fused_divfree(self):
        rng = np.random.default_rng(8)
        psi = jnp.asarray(rng.standard_normal((1, 8, 12, 16, 3)), jnp.float32)
        u = ops.curl3d_fused(psi)
        div = np.asarray(ops.divergence3d(u))[:, :-2, :-2, :-2]
        np.testing.assert_allclose(div, 0.0, atol=1e-5)


class TestCustomVJP:
    """Differentiable fused stencils: grads must match jax.grad of the
    oracle (interpret mode on CPU)."""

    def test_curl2d_p_grad(self):
        rng = np.random.default_rng(9)
        psi = jnp.asarray(rng.standard_normal((2, 16, 12, 1)), jnp.float32)
        g = jnp.asarray(rng.standard_normal((2, 16, 12, 2)), jnp.float32)
        go = jax.grad(lambda p: jnp.sum(ops.curl2d(p) * g))(psi)
        from deepfluids_tpu.ops.pallas_fd import curl2d_p

        gp = jax.grad(lambda p: jnp.sum(curl2d_p(p) * g))(psi)
        np.testing.assert_allclose(np.asarray(go), np.asarray(gp),
                                   atol=1e-5)

    def test_jacobian2d_p_grad(self):
        rng = np.random.default_rng(10)
        x = jnp.asarray(rng.standard_normal((2, 16, 12, 2)), jnp.float32)
        gj = jnp.asarray(rng.standard_normal((2, 16, 12, 4)), jnp.float32)
        gw = jnp.asarray(rng.standard_normal((2, 16, 12, 1)), jnp.float32)
        from deepfluids_tpu.ops.pallas_fd import jacobian2d_p

        def lo(v):
            j, w = ops.jacobian2d(v)
            return jnp.sum(j * gj) + jnp.sum(w * gw)

        def lp(v):
            j, w = jacobian2d_p(v)
            return jnp.sum(j * gj) + jnp.sum(w * gw)

        np.testing.assert_allclose(np.asarray(jax.grad(lo)(x)),
                                   np.asarray(jax.grad(lp)(x)), atol=1e-5)

    def test_vjp_loss_path_end_to_end(self):
        # The actual train-loss composition through the dispatching wrappers.
        from deepfluids_tpu.train import generator_loss

        rng = np.random.default_rng(11)
        psi = jnp.asarray(rng.standard_normal((2, 16, 12, 1)), jnp.float32)
        x = jnp.asarray(rng.standard_normal((2, 16, 12, 2)), jnp.float32)
        g = jax.grad(lambda p: generator_loss(p, x, True, 1.0, 1.0)[0])(psi)
        assert np.isfinite(np.asarray(g)).all()

    def test_curl3d_p_grad(self):
        rng = np.random.default_rng(12)
        psi = jnp.asarray(rng.standard_normal((2, 6, 10, 12, 3)),
                          jnp.float32)
        g = jnp.asarray(rng.standard_normal((2, 6, 10, 12, 3)), jnp.float32)
        from deepfluids_tpu.ops.pallas_fd import curl3d_p

        go = jax.grad(lambda p: jnp.sum(ops.curl3d(p) * g))(psi)
        gp = jax.grad(lambda p: jnp.sum(curl3d_p(p) * g))(psi)
        np.testing.assert_allclose(np.asarray(go), np.asarray(gp),
                                   atol=1e-5)

    def test_jacobian3d_p_grad(self):
        rng = np.random.default_rng(13)
        x = jnp.asarray(rng.standard_normal((1, 6, 10, 12, 3)), jnp.float32)
        gj = jnp.asarray(rng.standard_normal((1, 6, 10, 12, 9)),
                         jnp.float32)
        gv = jnp.asarray(rng.standard_normal((1, 6, 10, 12, 3)),
                         jnp.float32)
        from deepfluids_tpu.ops.pallas_fd import jacobian3d_p

        def lo(v):
            j, w = ops.jacobian3d(v)
            return jnp.sum(j * gj) + jnp.sum(w * gv)

        def lp(v):
            j, w = jacobian3d_p(v)
            return jnp.sum(j * gj) + jnp.sum(w * gv)

        np.testing.assert_allclose(np.asarray(jax.grad(lo)(x)),
                                   np.asarray(jax.grad(lp)(x)), atol=1e-5)
