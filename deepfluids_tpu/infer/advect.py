"""On-device density rendering: semi-Lagrangian advection through generated
velocity sequences.

Reference/north-star: BASELINE.json [B] "a batched semi-Lagrangian advection
pass renders density for visual validation without host round-trips" — the
reference visualized vorticity PNGs; rendering an advected smoke density
through the GENERATED velocities is the visual check that the learned fields
actually transport like the simulator's (paper's qualitative figures).

The whole trajectory is one ``lax.scan`` over frames; ``vmap`` batches it
across scenes.  Velocities can come straight from the generator on device —
no host transfer until the final density frames are fetched for PNG/GIF
export.
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from deepfluids_tpu.datagen.grids import advect2d, advect3d
from deepfluids_tpu.datagen.smoke2d import _source_mask


@partial(jax.jit, static_argnames=("inject",))
def advect_density(vel_seq: jnp.ndarray, rho0: jnp.ndarray,
                   source: jnp.ndarray | None = None,
                   dt: float = 1.0, inject: bool = True) -> jnp.ndarray:
    """Advect a density field through a velocity sequence (single scene).

    Args:
      vel_seq: ``[T, H, W, 2]`` or ``[T, D, H, W, 3]`` velocity frames in
        GRID units per step (denormalized).
      rho0: initial density ``[H, W]`` / ``[D, H, W]``.
      source: optional per-step inflow mask added after advection (same
        shape as rho0); None -> no injection.
      inject: whether to add `source` each step.
    Returns:
      ``[T, ...]`` density frames (after each step).
    """
    advect = advect2d if vel_seq.ndim == 4 else advect3d

    def step(rho, vel):
        # Inject BEFORE advecting — same ordering as the simulator's frame
        # loop (datagen.smoke2d.step), so rendered frames line up with d/.
        if inject and source is not None:
            rho = jnp.clip(rho + source, 0.0, 1.0)
        rho = advect(rho, vel, dt)
        return rho, rho

    _, frames = jax.lax.scan(step, rho0, vel_seq)
    return frames


def render_density_sweep(
    generate_fn: Callable[[jnp.ndarray], jnp.ndarray],
    manifest,
    scene_params: np.ndarray,
    num_frames: int,
    dt: float = 1.0,
    source_rate: float = 1.0,
) -> np.ndarray:
    """Generate a scene's velocity trajectory and advect smoke through it.

    Batched over scenes with vmap — the full pipeline (params -> fields ->
    advected density) is two compiled programs, all on device.

    Args:
      generate_fn: jittable ``p_norm [B, P] -> velocity [B, H, W, 2]``
        (normalized units; curl applied).
      scene_params: [S, num_param-1] raw non-frame parameters per scene.
      num_frames: frames per scene.
    Returns:
      densities [S, T, H, W] (numpy, host).
    """
    if len(manifest.resolution) != 2:
        raise ValueError(
            "render_density_sweep is 2D-only (advect_density itself "
            f"handles 3D); got resolution {manifest.resolution}")
    if manifest.num_param - 1 != 2:
        raise ValueError(
            "render_density_sweep interprets the two non-frame params as "
            "(source x-position, source radius) for its source mask; got "
            f"{manifest.num_param - 1} non-frame params "
            f"({manifest.param_names[:-1]})")
    s = scene_params.shape[0]
    frames = np.arange(num_frames, dtype=np.float32)
    # [S, T, P] raw params
    raw = np.concatenate([
        np.repeat(scene_params[:, None, :], num_frames, axis=1),
        np.repeat(frames[None, :, None], s, axis=0)], axis=-1)
    p_norm = jnp.asarray(manifest.normalize_params(raw))

    v_scale = manifest.v_scale
    h, w = manifest.resolution

    def one_scene(p_seq, pos_x, radius):
        vel = generate_fn(p_seq) * v_scale          # [T, H, W, 2], grid units
        # Same source geometry AND injection rate as the simulator
        # (datagen.smoke2d: pos_y=0.08, rho += source_rate*mask before
        # advection), so the rendered density is directly comparable to the
        # dataset's d/ frames.  Pass the dataset's Smoke2DConfig.source_rate.
        src = source_rate * _source_mask(h, w, pos_x, radius,
                                         jnp.float32(0.08))
        rho0 = jnp.zeros((h, w), jnp.float32)
        return advect_density(vel, rho0, src, dt=dt)

    pos = jnp.asarray(scene_params[:, 0], jnp.float32)
    rad = (jnp.asarray(scene_params[:, 1], jnp.float32)
           if scene_params.shape[1] > 1 else jnp.full((s,), 0.08))
    out = jax.jit(jax.vmap(one_scene))(p_norm, pos, rad)
    return np.asarray(out)
