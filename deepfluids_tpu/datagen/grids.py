"""Shared grid utilities for the JAX solvers (2D and 3D).

Collocated (cell-centered) grids; semi-Lagrangian advection via order-1
``map_coordinates``; Jacobi pressure projection with Neumann (solid-wall)
boundaries.  Axis order matches the framework convention: 2D fields are
``[H, W]`` (y, x), 3D are ``[D, H, W]`` (z, y, x); velocity channels are
(u, v[, w]) = (x, y[, z]) components.

Equivalent role to mantaflow's advectSemiLagrange / solvePressure /
setWallBcs kernels (SURVEY.md §3.5 [M]) — rebuilt as pure JAX so the whole
frame loop is one compiled lax.scan.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.scipy.ndimage import map_coordinates


def sample2d(q: jnp.ndarray, coords_y: jnp.ndarray, coords_x: jnp.ndarray
             ) -> jnp.ndarray:
    """Bilinear sample of scalar grid q[H, W] at (y, x) coordinates."""
    h, w = q.shape
    cy = jnp.clip(coords_y, 0.0, h - 1.0)
    cx = jnp.clip(coords_x, 0.0, w - 1.0)
    return map_coordinates(q, [cy, cx], order=1, mode="nearest")


def advect2d(q: jnp.ndarray, vel: jnp.ndarray, dt: float) -> jnp.ndarray:
    """Semi-Lagrangian advection of q ([H, W] or [H, W, C]) by vel [H, W, 2]."""
    h, w = vel.shape[:2]
    yy = jnp.arange(h, dtype=jnp.float32)[:, None] * jnp.ones((1, w))
    xx = jnp.arange(w, dtype=jnp.float32)[None, :] * jnp.ones((h, 1))
    # backtrace: departure point = x - dt * u   (u = x-comp, v = y-comp)
    by = yy - dt * vel[..., 1]
    bx = xx - dt * vel[..., 0]
    if q.ndim == 2:
        return sample2d(q, by, bx)
    return jnp.stack(
        [sample2d(q[..., c], by, bx) for c in range(q.shape[-1])], axis=-1
    )


def divergence2d_c(vel: jnp.ndarray) -> jnp.ndarray:
    """Central-difference divergence of collocated vel [H, W, 2]."""
    u, v = vel[..., 0], vel[..., 1]
    dudx = (jnp.roll(u, -1, axis=1) - jnp.roll(u, 1, axis=1)) * 0.5
    dvdy = (jnp.roll(v, -1, axis=0) - jnp.roll(v, 1, axis=0)) * 0.5
    return dudx + dvdy


def pressure_project2d(vel: jnp.ndarray, iters: int = 50) -> jnp.ndarray:
    """Make vel approximately divergence-free via Jacobi + gradient subtract."""
    div = divergence2d_c(vel)

    def jacobi(p, _):
        pn = jnp.pad(p, 1, mode="edge")
        p_new = 0.25 * (
            pn[2:, 1:-1] + pn[:-2, 1:-1] + pn[1:-1, 2:] + pn[1:-1, :-2] - div
        )
        return p_new, None

    p, _ = jax.lax.scan(jacobi, jnp.zeros_like(div), None, length=iters)
    pn = jnp.pad(p, 1, mode="edge")
    gx = (pn[1:-1, 2:] - pn[1:-1, :-2]) * 0.5
    gy = (pn[2:, 1:-1] - pn[:-2, 1:-1]) * 0.5
    return vel - jnp.stack([gx, gy], axis=-1)


def laplacian2d(p: jnp.ndarray) -> jnp.ndarray:
    """5-point Laplacian with edge-replicated (Neumann) boundaries — the
    EXACT operator the Jacobi sweep in :func:`pressure_project2d` relaxes
    (p_new = (sum_neighbors - div)/4  <=>  laplacian2d(p) = div)."""
    pn = jnp.pad(p, 1, mode="edge")
    return (pn[2:, 1:-1] + pn[:-2, 1:-1] + pn[1:-1, 2:] + pn[1:-1, :-2]
            - 4.0 * p)


def solve_pressure2d_cg(div: jnp.ndarray, tol: float = 1e-6,
                        maxiter: int = 2000) -> jnp.ndarray:
    """Conjugate-gradient reference solve of ``laplacian2d(p) = div``.

    The independent-convergence oracle for the production Jacobi sweep
    (SURVEY.md §7 hard parts: "the pressure solve must be good enough that
    generated datasets have the same statistics" — mantaflow is
    unavailable here, so the closable check is Jacobi-vs-converged-CG on
    the IDENTICAL discretization; tools/solver_consistency.py runs it and
    tests/test_datagen.py pins it).  The pure-Neumann operator has a
    constant null space; the RHS is projected mean-zero and CG iterates on
    -laplacian (positive semidefinite).
    """
    # Hand-rolled deflated CG rather than jax.scipy.sparse.linalg.cg: on
    # this SINGULAR system rounding feeds the constant null-space mode and
    # plain CG exhibits plateau-rebound (residual 2.5e-4 @ iter 500 ->
    # 0.89 @ iter 1000, measured at 128x96 in f64) — library CG returns a
    # garbage iterate at maxiter.  Projecting the mean out of the residual
    # and search direction every iteration keeps the Krylov space inside
    # range(A), where the operator is SPD and convergence is guaranteed.
    # f32 still loses conjugacy over O(1000) iterations; under
    # jax_enable_x64 this promotion makes the solve run in real float64
    # (the study tool enables it), otherwise it is a no-op and the f32
    # path should keep tol modest (~1e-5).
    f64 = jnp.promote_types(div.dtype, jnp.float64)
    rhs = (div.astype(f64) - jnp.mean(div.astype(f64)))
    b = -rhs                                  # solve (-lap) p = -div, PSD
    A = lambda q: -laplacian2d(q)
    proj = lambda q: q - jnp.mean(q)          # deflate the constant mode
    atol2 = (tol * jnp.linalg.norm(b)) ** 2

    def cond(carry):
        _, r, _, rs, k = carry
        return jnp.logical_and(rs > atol2, k < maxiter)

    def body(carry):
        x, r, p, rs, k = carry
        Ap = A(p)
        alpha = rs / jnp.vdot(p, Ap)
        x = x + alpha * p
        r = proj(r - alpha * Ap)
        rs_new = jnp.vdot(r, r)
        p = proj(r + (rs_new / rs) * p)
        return x, r, p, rs_new, k + 1

    x0 = jnp.zeros_like(b)
    r0 = proj(b)
    x, _, _, _, _ = jax.lax.while_loop(
        cond, body, (x0, r0, r0, jnp.vdot(r0, r0), jnp.array(0)))
    return (x - jnp.mean(x)).astype(div.dtype)


def pressure_project2d_cg(vel: jnp.ndarray, tol: float = 1e-6,
                          maxiter: int = 2000) -> jnp.ndarray:
    """:func:`pressure_project2d` with the CG reference solve in place of
    the fixed Jacobi iteration count (same divergence, same gradient
    subtract) — the converged-projection oracle."""
    div = divergence2d_c(vel)
    p = solve_pressure2d_cg(div, tol=tol, maxiter=maxiter)
    pn = jnp.pad(p, 1, mode="edge")
    gx = (pn[1:-1, 2:] - pn[1:-1, :-2]) * 0.5
    gy = (pn[2:, 1:-1] - pn[:-2, 1:-1]) * 0.5
    return vel - jnp.stack([gx, gy], axis=-1)


def wall_bc2d(vel: jnp.ndarray) -> jnp.ndarray:
    """Zero wall-normal velocity on the box boundary (closed domain)."""
    u = vel[..., 0].at[:, 0].set(0.0).at[:, -1].set(0.0)
    v = vel[..., 1].at[0, :].set(0.0).at[-1, :].set(0.0)
    return jnp.stack([u, v], axis=-1)


# ---------------------------------------------------------------------------
# 3D variants
# ---------------------------------------------------------------------------

def sample3d(q, cz, cy, cx):
    d, h, w = q.shape
    cz = jnp.clip(cz, 0.0, d - 1.0)
    cy = jnp.clip(cy, 0.0, h - 1.0)
    cx = jnp.clip(cx, 0.0, w - 1.0)
    return map_coordinates(q, [cz, cy, cx], order=1, mode="nearest")


def advect3d(q, vel, dt):
    d, h, w = vel.shape[:3]
    zz = jnp.arange(d, dtype=jnp.float32)[:, None, None]
    yy = jnp.arange(h, dtype=jnp.float32)[None, :, None]
    xx = jnp.arange(w, dtype=jnp.float32)[None, None, :]
    zz, yy, xx = jnp.broadcast_arrays(
        zz * jnp.ones((1, h, w)), yy * jnp.ones((d, 1, w)),
        xx * jnp.ones((d, h, 1)),
    )
    bz = zz - dt * vel[..., 2]
    by = yy - dt * vel[..., 1]
    bx = xx - dt * vel[..., 0]
    if q.ndim == 3:
        return sample3d(q, bz, by, bx)
    return jnp.stack(
        [sample3d(q[..., c], bz, by, bx) for c in range(q.shape[-1])], axis=-1
    )


def divergence3d_c(vel):
    u, v, w = vel[..., 0], vel[..., 1], vel[..., 2]
    dudx = (jnp.roll(u, -1, axis=2) - jnp.roll(u, 1, axis=2)) * 0.5
    dvdy = (jnp.roll(v, -1, axis=1) - jnp.roll(v, 1, axis=1)) * 0.5
    dwdz = (jnp.roll(w, -1, axis=0) - jnp.roll(w, 1, axis=0)) * 0.5
    return dudx + dvdy + dwdz


def pressure_project3d(vel, iters: int = 40):
    div = divergence3d_c(vel)

    def jacobi(p, _):
        pn = jnp.pad(p, 1, mode="edge")
        p_new = (
            pn[2:, 1:-1, 1:-1] + pn[:-2, 1:-1, 1:-1]
            + pn[1:-1, 2:, 1:-1] + pn[1:-1, :-2, 1:-1]
            + pn[1:-1, 1:-1, 2:] + pn[1:-1, 1:-1, :-2] - div
        ) / 6.0
        return p_new, None

    p, _ = jax.lax.scan(jacobi, jnp.zeros_like(div), None, length=iters)
    pn = jnp.pad(p, 1, mode="edge")
    gx = (pn[1:-1, 1:-1, 2:] - pn[1:-1, 1:-1, :-2]) * 0.5
    gy = (pn[1:-1, 2:, 1:-1] - pn[1:-1, :-2, 1:-1]) * 0.5
    gz = (pn[2:, 1:-1, 1:-1] - pn[:-2, 1:-1, 1:-1]) * 0.5
    return vel - jnp.stack([gx, gy, gz], axis=-1)


def laplacian3d(p):
    """7-point Laplacian with edge-replicated (Neumann) boundaries — the
    EXACT operator the Jacobi sweep in :func:`pressure_project3d` relaxes
    (p_new = (sum_neighbors - div)/6  <=>  laplacian3d(p) = div)."""
    pn = jnp.pad(p, 1, mode="edge")
    return (pn[2:, 1:-1, 1:-1] + pn[:-2, 1:-1, 1:-1]
            + pn[1:-1, 2:, 1:-1] + pn[1:-1, :-2, 1:-1]
            + pn[1:-1, 1:-1, 2:] + pn[1:-1, 1:-1, :-2] - 6.0 * p)


def solve_pressure3d_cg(div, tol: float = 1e-6, maxiter: int = 4000):
    """Deflated-CG reference solve of ``laplacian3d(p) = div`` — the 3D
    analogue of :func:`solve_pressure2d_cg` (same singular pure-Neumann
    system, same constant-mode deflation every iteration; see that
    docstring for why library CG diverges here).  Run under
    jax_enable_x64 for a true converged oracle."""
    f64 = jnp.promote_types(div.dtype, jnp.float64)
    rhs = (div.astype(f64) - jnp.mean(div.astype(f64)))
    b = -rhs
    A = lambda q: -laplacian3d(q)
    proj = lambda q: q - jnp.mean(q)
    atol2 = (tol * jnp.linalg.norm(b)) ** 2

    def cond(carry):
        _, r, _, rs, k = carry
        return jnp.logical_and(rs > atol2, k < maxiter)

    def body(carry):
        x, r, p, rs, k = carry
        Ap = A(p)
        alpha = rs / jnp.vdot(p, Ap)
        x = x + alpha * p
        r = proj(r - alpha * Ap)
        rs_new = jnp.vdot(r, r)
        p = proj(r + (rs_new / rs) * p)
        return x, r, p, rs_new, k + 1

    x0 = jnp.zeros_like(b)
    r0 = proj(b)
    x, _, _, _, _ = jax.lax.while_loop(
        cond, body, (x0, r0, r0, jnp.vdot(r0, r0), jnp.array(0)))
    return (x - jnp.mean(x)).astype(div.dtype)


def pressure_project3d_cg(vel, tol: float = 1e-6, maxiter: int = 4000):
    """:func:`pressure_project3d` with the CG reference solve in place of
    the fixed Jacobi iteration count — the 3D converged-projection oracle
    (tools/solver_consistency.py 3d)."""
    div = divergence3d_c(vel)
    p = solve_pressure3d_cg(div, tol=tol, maxiter=maxiter)
    pn = jnp.pad(p, 1, mode="edge")
    gx = (pn[1:-1, 1:-1, 2:] - pn[1:-1, 1:-1, :-2]) * 0.5
    gy = (pn[1:-1, 2:, 1:-1] - pn[1:-1, :-2, 1:-1]) * 0.5
    gz = (pn[2:, 1:-1, 1:-1] - pn[:-2, 1:-1, 1:-1]) * 0.5
    return vel - jnp.stack([gx, gy, gz], axis=-1)


def wall_bc3d(vel):
    u = vel[..., 0].at[:, :, 0].set(0.0).at[:, :, -1].set(0.0)
    v = vel[..., 1].at[:, 0, :].set(0.0).at[:, -1, :].set(0.0)
    w = vel[..., 2].at[0, :, :].set(0.0).at[-1, :, :].set(0.0)
    return jnp.stack([u, v, w], axis=-1)
