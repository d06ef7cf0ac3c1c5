"""2D liquid drop solver with a levelset free surface (JAX).

Scene family liquid_pos10_size4 (SURVEY.md §2 [B]): a liquid drop falls into
a basin; the dataset's field is the LEVELSET (signed distance, negative
inside the liquid) — the ``--data_type=levelset`` path of the reference.

Simplified grid liquid (vs the reference's FLIP): velocity lives on the full
grid; gravity acts on liquid cells; pressure projection enforces
incompressibility inside the liquid; the levelset is advected
semi-Lagrangian and re-normalized with a few redistancing sweeps.  This is a
solver replacement, not a numerical clone of mantaflow FLIP — the dataset
contract (levelset + velocity + args.txt) is what is preserved.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp

from deepfluids_tpu.datagen import grids


@dataclasses.dataclass(frozen=True)
class Liquid2DConfig:
    height: int = 128
    width: int = 96
    num_frames: int = 200
    dt: float = 0.5
    gravity: float = 0.15
    basin_level: float = 0.25   # fraction of height filled with liquid
    project_iters: int = 60
    redist_iters: int = 4


def _initial_levelset(h, w, pos_x, radius,
                      basin: float = Liquid2DConfig.basin_level):
    """Signed distance (in cells, neg = liquid): basin + falling drop."""
    yy = jnp.arange(h, dtype=jnp.float32)[:, None] * jnp.ones((1, w))
    xx = jnp.arange(w, dtype=jnp.float32)[None, :] * jnp.ones((h, 1))
    phi_basin = yy - basin * h          # <0 below the surface line
    cy, cx = 0.7 * h, pos_x * (w - 1)
    r = radius * w
    phi_drop = jnp.sqrt((yy - cy) ** 2 + (xx - cx) ** 2) - r
    return jnp.minimum(phi_basin, phi_drop)


def _redistance(phi, iters):
    """A few smoothing sweeps toward |grad phi| = 1 (cheap PDE redistance)."""
    def sweep(p, _):
        pn = jnp.pad(p, 1, mode="edge")
        gx = (pn[1:-1, 2:] - pn[1:-1, :-2]) * 0.5
        gy = (pn[2:, 1:-1] - pn[:-2, 1:-1]) * 0.5
        grad = jnp.sqrt(gx**2 + gy**2 + 1e-6)
        s = p / jnp.sqrt(p**2 + 1.0)
        return p - 0.3 * s * (grad - 1.0), None

    phi, _ = jax.lax.scan(sweep, phi, None, length=iters)
    return phi


@functools.partial(jax.jit, static_argnames=("cfg",))
def simulate_liquid2d(pos_x, radius, cfg: Liquid2DConfig):
    """One scene; returns (levelset_traj [T,H,W,1], vel_traj [T,H,W,2])."""
    h, w = cfg.height, cfg.width
    vel0 = jnp.zeros((h, w, 2), jnp.float32)
    phi0 = _initial_levelset(h, w, pos_x, radius, cfg.basin_level)

    def body(state, _):
        vel, phi = state
        liquid = (phi < 0.0).astype(jnp.float32)
        # gravity pulls liquid down (-y)
        vel = vel.at[..., 1].add(-cfg.dt * cfg.gravity * liquid)
        vel = grids.wall_bc2d(vel)
        vel = grids.pressure_project2d(vel, cfg.project_iters)
        # free surface: zero pressure coupling outside liquid -> damp air vel
        vel = vel * (0.2 + 0.8 * liquid[..., None])
        vel = grids.wall_bc2d(vel)
        phi = grids.advect2d(phi, vel, cfg.dt)
        phi = _redistance(phi, cfg.redist_iters)
        vel = grids.advect2d(vel, vel, cfg.dt)
        vel = grids.wall_bc2d(vel)
        return (vel, phi), (phi[..., None], vel)

    _, (phit, velt) = jax.lax.scan(
        body, (vel0, phi0), None, length=cfg.num_frames
    )
    return phit, velt


@functools.partial(jax.jit, static_argnames=("cfg",))
def simulate_liquid2d_batch(pos_x, radius, cfg: Liquid2DConfig):
    """Vectorized liquid scene sweep (see smoke2d.simulate_smoke2d_batch)."""
    return jax.vmap(lambda p, r: simulate_liquid2d(p, r, cfg))(pos_x, radius)
