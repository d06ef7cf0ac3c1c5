"""Finite-difference differential operators (jnp oracle).

This is the physics core of the framework: the generator emits a stream
function psi (2D, 1 channel) or vector potential Psi (3D, 3 channels) and the
velocity field is obtained as its curl, which is divergence-free *by
construction* — incompressibility is an architectural guarantee, not a loss
term.  (Reference: deep-fluids ``ops.py`` curl/curl3/jacobian/jacobian3, per
SURVEY.md §2 [M] / BASELINE.json north_star [B].)

Discretization (matches the reference scheme described in SURVEY.md §2):
  * all derivatives are FORWARD first differences, ``d[i] = x[i+1] - x[i]``;
  * the lost last sample along the differenced axis is restored by EDGE
    REPLICATION of the final derivative value, so outputs keep the grid shape.

Axis / channel conventions used throughout the framework:
  * 2D fields: ``[..., H, W, C]`` with H = y (axis -3), W = x (axis -2).
    Velocity channels: ``c=0`` is u (x-component), ``c=1`` is v (y-component).
  * 3D fields: ``[..., D, H, W, C]`` with D = z (axis -4), H = y, W = x.
    Velocity channels: ``(u, v, w)`` = (x, y, z) components.

Because forward differences commute (D_x D_y == D_y D_x pointwise in the
interior), ``divergence(curl(psi)) == 0`` exactly (up to fp rounding) away
from the replicated edge — the property the tests pin down.

All functions accept arbitrary leading batch dimensions and are jit/vmap/grad
safe (pure, statically shaped).
"""

from __future__ import annotations

import jax.numpy as jnp


def _fdiff(x: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Forward difference along ``axis``, keeping shape via edge replication.

    d[i] = x[i+1] - x[i] for i < n-1;  d[n-1] = d[n-2]   (edge replication of
    the last derivative value, matching the reference's concat-of-last-slice).
    """
    d = jnp.diff(x, axis=axis)
    # Replicate the final derivative slice to restore the original length.
    idx = [slice(None)] * x.ndim
    idx[axis] = slice(-1, None)
    return jnp.concatenate([d, d[tuple(idx)]], axis=axis)


# ---------------------------------------------------------------------------
# 2D
# ---------------------------------------------------------------------------

def curl2d(psi: jnp.ndarray) -> jnp.ndarray:
    """2D curl of a stream function: u = d(psi)/dy, v = -d(psi)/dx.

    Args:
      psi: ``[..., H, W, 1]`` stream function.
    Returns:
      ``[..., H, W, 2]`` velocity, divergence-free under the matched
      forward-difference divergence.
    """
    p = psi[..., 0]
    u = _fdiff(p, axis=-2)   # d/dy (H axis of [..., H, W])
    v = -_fdiff(p, axis=-1)  # -d/dx (W axis)
    return jnp.stack([u, v], axis=-1)


def jacobian2d(x: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """All first derivatives of a 2D velocity field + vorticity.

    Args:
      x: ``[..., H, W, 2]`` velocity (u, v).
    Returns:
      (J, w): J = ``[..., H, W, 4]`` stacked ``(dudx, dudy, dvdx, dvdy)``;
      w = ``[..., H, W, 1]`` vorticity ``dvdx - dudy``.
    """
    u, v = x[..., 0], x[..., 1]
    dudx = _fdiff(u, axis=-1)
    dudy = _fdiff(u, axis=-2)
    dvdx = _fdiff(v, axis=-1)
    dvdy = _fdiff(v, axis=-2)
    j = jnp.stack([dudx, dudy, dvdx, dvdy], axis=-1)
    w = (dvdx - dudy)[..., None]
    return j, w


def vorticity2d(x: jnp.ndarray) -> jnp.ndarray:
    """Scalar vorticity ``dvdx - dudy`` of a 2D velocity field ``[..., H, W, 2]``."""
    return _fdiff(x[..., 1], axis=-1)[..., None] - _fdiff(x[..., 0], axis=-2)[..., None]


def divergence2d(x: jnp.ndarray) -> jnp.ndarray:
    """Forward-difference divergence ``dudx + dvdy`` of ``[..., H, W, 2]``.

    Matched to :func:`curl2d` so that ``divergence2d(curl2d(psi)) == 0``
    exactly in the interior (rows/cols before the replicated edge).
    """
    return (_fdiff(x[..., 0], axis=-1) + _fdiff(x[..., 1], axis=-2))[..., None]


# ---------------------------------------------------------------------------
# 3D
# ---------------------------------------------------------------------------

def curl3d(psi: jnp.ndarray) -> jnp.ndarray:
    """3D curl of a vector potential Psi = (a, b, c).

    u = dc/dy - db/dz,  v = da/dz - dc/dx,  w = db/dx - da/dy.

    Args:
      psi: ``[..., D, H, W, 3]`` vector potential (channels = x,y,z comps).
    Returns:
      ``[..., D, H, W, 3]`` velocity (u, v, w).
    """
    a, b, c = psi[..., 0], psi[..., 1], psi[..., 2]
    # axes of [..., D, H, W]: z = -3, y = -2, x = -1
    u = _fdiff(c, axis=-2) - _fdiff(b, axis=-3)
    v = _fdiff(a, axis=-3) - _fdiff(c, axis=-1)
    w = _fdiff(b, axis=-1) - _fdiff(a, axis=-2)
    return jnp.stack([u, v, w], axis=-1)


def jacobian3d(x: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """All 9 first derivatives of a 3D velocity field + the vorticity vector.

    Args:
      x: ``[..., D, H, W, 3]`` velocity (u, v, w).
    Returns:
      (J, vort): J = ``[..., D, H, W, 9]`` stacked
      ``(dudx, dudy, dudz, dvdx, dvdy, dvdz, dwdx, dwdy, dwdz)``;
      vort = ``[..., D, H, W, 3]`` = ``(dwdy - dvdz, dudz - dwdx, dvdx - dudy)``.
    """
    u, v, w = x[..., 0], x[..., 1], x[..., 2]
    dudx, dudy, dudz = _fdiff(u, -1), _fdiff(u, -2), _fdiff(u, -3)
    dvdx, dvdy, dvdz = _fdiff(v, -1), _fdiff(v, -2), _fdiff(v, -3)
    dwdx, dwdy, dwdz = _fdiff(w, -1), _fdiff(w, -2), _fdiff(w, -3)
    j = jnp.stack(
        [dudx, dudy, dudz, dvdx, dvdy, dvdz, dwdx, dwdy, dwdz], axis=-1
    )
    vort = jnp.stack([dwdy - dvdz, dudz - dwdx, dvdx - dudy], axis=-1)
    return j, vort


def vorticity3d(x: jnp.ndarray) -> jnp.ndarray:
    """Vorticity vector of a 3D velocity field ``[..., D, H, W, 3]``."""
    _, vort = jacobian3d(x)
    return vort


def divergence3d(x: jnp.ndarray) -> jnp.ndarray:
    """Forward-difference divergence of ``[..., D, H, W, 3]``; matched to curl3d."""
    return (
        _fdiff(x[..., 0], axis=-1)
        + _fdiff(x[..., 1], axis=-2)
        + _fdiff(x[..., 2], axis=-3)
    )[..., None]
