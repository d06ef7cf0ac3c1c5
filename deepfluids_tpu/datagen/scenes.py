"""Scene configs — dataset writers mirroring the reference's four scenes.

Each function sweeps its parameter grid, runs the JAX solver per scene, and
writes the reference's on-disk contract (SURVEY.md §2 "Scene:*", §3.5):

    data/<name>/v/<i0>_<i1>_<frame>.npz   (x = field, y = raw params)
    data/<name>/d/...                     (density, smoke scenes)
    data/<name>/args.txt                  (JSON manifest)

Parameter vectors follow the reference convention: last param is frame time.
``scale``/count overrides exist so tests can generate tiny datasets in
seconds; the full-size defaults match SURVEY §6's benchmark configs.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from deepfluids_tpu.data.manifest import Manifest, save_manifest
from deepfluids_tpu.datagen.liquid2d import Liquid2DConfig, simulate_liquid2d
from deepfluids_tpu.datagen.smoke2d import Smoke2DConfig, simulate_smoke2d
from deepfluids_tpu.datagen.smoke3d import Smoke3DConfig, simulate_smoke3d


def _save_frames(out_dir, key, scene_idx, fields, params_per_frame):
    os.makedirs(os.path.join(out_dir, key), exist_ok=True)
    t = fields.shape[0]
    for f in range(t):
        name = "_".join(str(i) for i in scene_idx) + f"_{f}.npz"
        np.savez_compressed(
            os.path.join(out_dir, key, name),
            x=np.asarray(fields[f], np.float32),
            y=np.asarray(params_per_frame[f], np.float32),
        )


def _auto_scene_batch(tpu_default: int) -> int:
    """Scenes solved per device program: mantaflow ran one C++ scene at a
    time; on TPU we vmap a chunk of scenes through one compiled solver
    (jit-compile once, amortize dispatch). 1 on CPU keeps tests light."""
    return tpu_default if jax.default_backend() == "tpu" else 1


def smoke_pos21_size5(out_root: str, num_pos: int = 21, num_size: int = 5,
                      num_frames: int = 200, height: int = 128,
                      width: int = 96, name: str | None = None,
                      scene_batch: int = 0) -> str:
    """2D smoke plume: source x-position x source radius grid.

    Reference scene smoke_pos21_size5 (SURVEY §2): 21 x 5 x 200 frames on a
    128x96 grid; params p = [pos_x, radius, frame].
    """
    from deepfluids_tpu.datagen.smoke2d import simulate_smoke2d_batch

    name = name or f"smoke_pos{num_pos}_size{num_size}"
    out_dir = os.path.join(out_root, name)
    cfg = Smoke2DConfig(height=height, width=width, num_frames=num_frames)
    positions = np.linspace(0.2, 0.8, num_pos)
    radii = np.linspace(0.04, 0.12, num_size)
    sb = scene_batch or _auto_scene_batch(15)

    scene_list = [(i, j, px, r) for i, px in enumerate(positions)
                  for j, r in enumerate(radii)]
    v_min, v_max = np.inf, -np.inf
    for k in range(0, len(scene_list), sb):
        chunk = scene_list[k:k + sb]
        pxs = jnp.asarray([c[2] for c in chunk], jnp.float32)
        rs = jnp.asarray([c[3] for c in chunk], jnp.float32)
        vts, rts = simulate_smoke2d_batch(pxs, rs, cfg)
        vts, rts = np.asarray(vts), np.asarray(rts)
        for (i, j, px, r), vt, rt in zip(chunk, vts, rts):
            v_min = min(v_min, float(vt.min()))
            v_max = max(v_max, float(vt.max()))
            params = np.stack(
                [np.full(num_frames, px), np.full(num_frames, r),
                 np.arange(num_frames, dtype=np.float64)], axis=1
            )
            _save_frames(out_dir, "v", (i, j), vt, params)
            _save_frames(out_dir, "d", (i, j), rt[..., None], params)

    save_manifest(Manifest(
        param_names=["src_x_pos", "src_radius", "frame"],
        param_ranges=[[float(positions[0]), float(positions[-1])],
                      [float(radii[0]), float(radii[-1])],
                      [0.0, float(num_frames - 1)]],
        num_scenes=num_pos * num_size,
        num_frames=num_frames,
        resolution=[height, width],
        num_channels=2,
        v_range=[v_min, v_max],
        data_type="velocity",
    ), out_dir)
    return out_dir


def smoke_mov(out_root: str, num_scenes: int = 200, num_frames: int = 400,
              height: int = 128, width: int = 96, seed: int = 0,
              name: str | None = None) -> str:
    """2D moving-source smoke (reference smoke_mov200_f400, SURVEY §2).

    Source x-position follows a smooth random walk per scene; params
    p = [pos_x(t), frame] — the temporal dataset for AE + latent integration.
    """
    name = name or f"smoke_mov{num_scenes}_f{num_frames}"
    out_dir = os.path.join(out_root, name)
    cfg = Smoke2DConfig(height=height, width=width, num_frames=num_frames)
    rng = np.random.default_rng(seed)
    radius = 0.08
    sb = _auto_scene_batch(10)

    # Smooth random source trajectories in [0.2, 0.8], one per scene.
    n_knots = max(num_frames // 40, 2)
    all_xs = np.stack([
        np.interp(np.linspace(0, n_knots - 1, num_frames),
                  np.arange(n_knots), rng.uniform(0.2, 0.8, size=n_knots))
        for _ in range(num_scenes)]).astype(np.float32)

    sim_batch = jax.jit(
        jax.vmap(lambda xs: simulate_smoke2d(
            xs[0], jnp.float32(radius), cfg, pos_x_per_frame=xs,
            moving=True)),
        static_argnames=())

    v_min, v_max = np.inf, -np.inf
    for k in range(0, num_scenes, sb):
        xs_chunk = jnp.asarray(all_xs[k:k + sb])
        vts, rts = sim_batch(xs_chunk)
        vts, rts = np.asarray(vts), np.asarray(rts)
        for o in range(xs_chunk.shape[0]):
            s = k + o
            vt = vts[o]
            v_min = min(v_min, float(vt.min()))
            v_max = max(v_max, float(vt.max()))
            params = np.stack(
                [all_xs[s], np.arange(num_frames, dtype=np.float64)], axis=1
            )
            _save_frames(out_dir, "v", (s,), vt, params)
            _save_frames(out_dir, "d", (s,), rts[o][..., None], params)

    save_manifest(Manifest(
        param_names=["src_x_pos", "frame"],
        param_ranges=[[0.2, 0.8], [0.0, float(num_frames - 1)]],
        num_scenes=num_scenes,
        num_frames=num_frames,
        resolution=[height, width],
        num_channels=2,
        v_range=[v_min, v_max],
        data_type="velocity",
    ), out_dir)
    return out_dir


def liquid_pos10_size4(out_root: str, num_pos: int = 10, num_size: int = 4,
                       num_frames: int = 200, height: int = 128,
                       width: int = 96, name: str | None = None) -> str:
    """2D liquid drop: drop x-position x drop radius; levelset fields.

    Reference scene liquid_pos10_size4 (SURVEY §2) — the
    ``--data_type=levelset`` path; also dumps velocity under ``v/``.
    """
    from deepfluids_tpu.datagen.liquid2d import simulate_liquid2d_batch

    name = name or f"liquid_pos{num_pos}_size{num_size}"
    out_dir = os.path.join(out_root, name)
    cfg = Liquid2DConfig(height=height, width=width, num_frames=num_frames)
    positions = np.linspace(0.25, 0.75, num_pos)
    radii = np.linspace(0.06, 0.15, num_size)
    sb = _auto_scene_batch(10)

    scene_list = [(i, j, px, r) for i, px in enumerate(positions)
                  for j, r in enumerate(radii)]
    l_min, l_max = np.inf, -np.inf
    for k in range(0, len(scene_list), sb):
        chunk = scene_list[k:k + sb]
        pxs = jnp.asarray([c[2] for c in chunk], jnp.float32)
        rs = jnp.asarray([c[3] for c in chunk], jnp.float32)
        phits, velts = simulate_liquid2d_batch(pxs, rs, cfg)
        phits, velts = np.asarray(phits), np.asarray(velts)
        for (i, j, px, r), phit, velt in zip(chunk, phits, velts):
            l_min = min(l_min, float(phit.min()))
            l_max = max(l_max, float(phit.max()))
            params = np.stack(
                [np.full(num_frames, px), np.full(num_frames, r),
                 np.arange(num_frames, dtype=np.float64)], axis=1
            )
            _save_frames(out_dir, "l", (i, j), phit, params)
            _save_frames(out_dir, "v", (i, j), velt, params)

    save_manifest(Manifest(
        param_names=["drop_x_pos", "drop_radius", "frame"],
        param_ranges=[[float(positions[0]), float(positions[-1])],
                      [float(radii[0]), float(radii[-1])],
                      [0.0, float(num_frames - 1)]],
        num_scenes=num_pos * num_size,
        num_frames=num_frames,
        resolution=[height, width],
        num_channels=1,
        v_range=[l_min, l_max],
        data_type="levelset",
    ), out_dir)
    return out_dir


def smoke3_vel5_buo3(out_root: str, num_vel: int = 5, num_buo: int = 3,
                     num_frames: int = 250, depth: int = 32, height: int = 64,
                     width: int = 112, name: str | None = None) -> str:
    """3D smoke: inflow velocity x buoyancy grid (reference
    smoke3_vel5_buo3_f250, SURVEY §2); grid [D,H,W] = [32,64,112]."""
    name = name or f"smoke3_vel{num_vel}_buo{num_buo}"
    out_dir = os.path.join(out_root, name)
    cfg = Smoke3DConfig(depth=depth, height=height, width=width,
                        num_frames=num_frames)
    from deepfluids_tpu.datagen.smoke3d import simulate_smoke3d_batch

    vels = np.linspace(0.5, 1.5, num_vel)
    buos = np.linspace(0.04, 0.12, num_buo)
    # 3D trajectories are big (250 frames x 112x64x32x3 f32 ~= 690 MB per
    # scene on device) — small chunks.
    sb = _auto_scene_batch(3)

    scene_list = [(i, j, iv, b) for i, iv in enumerate(vels)
                  for j, b in enumerate(buos)]
    v_min, v_max = np.inf, -np.inf
    for k in range(0, len(scene_list), sb):
        chunk = scene_list[k:k + sb]
        ivs = jnp.asarray([c[2] for c in chunk], jnp.float32)
        bs = jnp.asarray([c[3] for c in chunk], jnp.float32)
        vts, rts = simulate_smoke3d_batch(ivs, bs, cfg)
        vts, rts = np.asarray(vts), np.asarray(rts)
        for (i, j, iv, b), vt, rt in zip(chunk, vts, rts):
            v_min = min(v_min, float(vt.min()))
            v_max = max(v_max, float(vt.max()))
            params = np.stack(
                [np.full(num_frames, iv), np.full(num_frames, b),
                 np.arange(num_frames, dtype=np.float64)], axis=1
            )
            _save_frames(out_dir, "v", (i, j), vt, params)
            _save_frames(out_dir, "d", (i, j), rt[..., None], params)

    save_manifest(Manifest(
        param_names=["inflow_vel", "buoyancy", "frame"],
        param_ranges=[[float(vels[0]), float(vels[-1])],
                      [float(buos[0]), float(buos[-1])],
                      [0.0, float(num_frames - 1)]],
        num_scenes=num_vel * num_buo,
        num_frames=num_frames,
        resolution=[depth, height, width],
        num_channels=3,
        v_range=[v_min, v_max],
        data_type="velocity",
    ), out_dir)
    return out_dir


SCENES = {
    "smoke_pos21_size5": smoke_pos21_size5,
    "smoke_mov": smoke_mov,
    "liquid_pos10_size4": liquid_pos10_size4,
    "smoke3_vel5_buo3": smoke3_vel5_buo3,
}
