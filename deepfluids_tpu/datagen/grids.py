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


def wall_bc3d(vel):
    u = vel[..., 0].at[:, :, 0].set(0.0).at[:, :, -1].set(0.0)
    v = vel[..., 1].at[:, 0, :].set(0.0).at[:, -1, :].set(0.0)
    w = vel[..., 2].at[0, :, :].set(0.0).at[-1, :, :].set(0.0)
    return jnp.stack([u, v, w], axis=-1)
