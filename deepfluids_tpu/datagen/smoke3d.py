"""3D smoke plume solver (JAX; mantaflow smoke3 scene equivalent).

Scene family smoke3_vel5_buo3_f250 (SURVEY.md §2 [B]): parameters are source
inflow velocity and buoyancy strength; grid 112x64x32 (W x H x D) -> arrays
[D, H, W] = [32, 64, 112].
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp

from deepfluids_tpu.datagen import grids


@dataclasses.dataclass(frozen=True)
class Smoke3DConfig:
    depth: int = 32             # D (z)
    height: int = 64            # H (y)
    width: int = 112            # W (x)
    num_frames: int = 250
    dt: float = 1.0
    source_rate: float = 1.0
    project_iters: int = 40


def _source_mask3(d, h, w):
    """Soft spherical source near the bottom center."""
    zz = jnp.arange(d, dtype=jnp.float32)[:, None, None]
    yy = jnp.arange(h, dtype=jnp.float32)[None, :, None]
    xx = jnp.arange(w, dtype=jnp.float32)[None, None, :]
    cz, cy, cx = (d - 1) / 2.0, 0.1 * (h - 1), (w - 1) / 2.0
    r = 0.12 * w
    d2 = (zz - cz) ** 2 + (yy - cy) ** 2 + (xx - cx) ** 2
    return jnp.clip(1.0 - jnp.sqrt(d2) / r, 0.0, 1.0)


@functools.partial(jax.jit, static_argnames=("cfg",))
def simulate_smoke3d(inflow_vel, buoyancy, cfg: Smoke3DConfig):
    """One scene; returns (vel_traj [T,D,H,W,3], rho_traj [T,D,H,W]).

    Args:
      inflow_vel: upward source velocity injected inside the source mask.
      buoyancy: buoyancy coefficient (force per unit density).
    """
    d, h, w = cfg.depth, cfg.height, cfg.width
    vel0 = jnp.zeros((d, h, w, 3), jnp.float32)
    rho0 = jnp.zeros((d, h, w), jnp.float32)
    mask = _source_mask3(d, h, w)

    def body(state, _):
        vel, rho = state
        rho = jnp.clip(rho + cfg.source_rate * mask, 0.0, 1.0)
        # Source inflow: set vertical velocity inside the source.
        vel = vel.at[..., 1].set(
            vel[..., 1] * (1 - mask) + inflow_vel * mask
        )
        vel = vel.at[..., 1].add(cfg.dt * buoyancy * rho)
        vel = grids.wall_bc3d(vel)
        rho = grids.advect3d(rho, vel, cfg.dt)
        vel = grids.advect3d(vel, vel, cfg.dt)
        vel = grids.wall_bc3d(vel)
        vel = grids.pressure_project3d(vel, cfg.project_iters)
        vel = grids.wall_bc3d(vel)
        return (vel, rho), (vel, rho)

    _, (vt, rt) = jax.lax.scan(
        body, (vel0, rho0), None, length=cfg.num_frames
    )
    return vt, rt


@functools.partial(jax.jit, static_argnames=("cfg",))
def simulate_smoke3d_batch(inflow_vel, buoyancy, cfg: Smoke3DConfig):
    """Vectorized 3D scene sweep (see smoke2d.simulate_smoke2d_batch)."""
    return jax.vmap(lambda v, b: simulate_smoke3d(v, b, cfg))(inflow_vel,
                                                              buoyancy)
