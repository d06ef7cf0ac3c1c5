"""2D FLIP liquid solver with a particle-tracked free surface (JAX).

Scene family liquid_pos10_size4 (SURVEY.md §2 [B]): a liquid drop falls into
a basin; the dataset's field is the LEVELSET (signed distance, negative
inside the liquid) — the ``--data_type=levelset`` path of the reference.

This is a real FLIP method (the reference's mantaflow scenes were FLIP),
re-expressed as fixed-shape JAX so a whole trajectory is one compiled
``lax.scan``:

  * particles carry momentum (fixed lattice of 4/cell over the whole
    domain; an ``active`` mask selects the liquid — static shapes, so the
    scene parameters stay jit-traceable);
  * P2G: bilinear scatter of particle momentum/mass to the grid
    (``.at[].add``);
  * grid: gravity on liquid cells, wall BCs, and a FREE-SURFACE pressure
    projection (Jacobi with Dirichlet p = 0 in air — not the uniform
    projection the smoke solvers use);
  * G2P: FLIP delta transfer blended with PIC
    (v_p ← α·(v_p + Δu_grid) + (1-α)·u_grid, α = flip_ratio);
  * particles advect through the grid field (RK2 midpoint, CFL-clamped);
  * the levelset is rebuilt from particle occupancy and redistanced.

Mass is conserved exactly in the particle representation (particles are
never created/destroyed), unlike the previous grid-levelset variant whose
advected levelset could lose volume.
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
    redist_iters: int = 6
    flip_ratio: float = 0.95    # FLIP/PIC blend (1 = pure FLIP, noisy;
                                # 0 = pure PIC, dissipative)
    max_disp: float = 2.5       # CFL clamp: max particle move per step (cells)
    density_relax: float = 0.5  # volume-conservation strength: over-packed
                                # cells (particle mass > rest) get a
                                # positive divergence target so the
                                # projection pushes particles apart


def _phi_init(y, x, h, w, pos_x, radius, basin):
    """Analytic initial signed distance (cells, neg = liquid) at (y, x):
    basin up to ``basin*h`` plus a falling drop."""
    phi_basin = y - basin * h
    cy, cx = 0.7 * h, pos_x * (w - 1)
    r = radius * w
    phi_drop = jnp.sqrt((y - cy) ** 2 + (x - cx) ** 2) - r
    return jnp.minimum(phi_basin, phi_drop)


def _initial_levelset(h, w, pos_x, radius,
                      basin: float = Liquid2DConfig.basin_level):
    yy = jnp.arange(h, dtype=jnp.float32)[:, None] * jnp.ones((1, w))
    xx = jnp.arange(w, dtype=jnp.float32)[None, :] * jnp.ones((h, 1))
    return _phi_init(yy, xx, h, w, pos_x, radius, basin)


def _seed_particles(h, w, pos_x, radius, basin):
    """Fixed 2x2-per-cell lattice over the whole domain; particles inside
    the initial liquid are active.  Returns (py, px, pvy, pvx, active)."""
    ys = (jnp.arange(2 * h, dtype=jnp.float32) + 0.5) / 2.0 - 0.5
    xs = (jnp.arange(2 * w, dtype=jnp.float32) + 0.5) / 2.0 - 0.5
    py, px = [a.ravel() for a in jnp.meshgrid(ys, xs, indexing="ij")]
    phi_p = _phi_init(py, px, h, w, pos_x, radius, basin)
    active = (phi_p < 0.0).astype(jnp.float32)
    zeros = jnp.zeros_like(px)
    return py, px, zeros, zeros, active


def _bilinear_corners(py, px, h, w):
    """Corner indices + weights for bilinear P2G/G2P at cell centers."""
    y0 = jnp.clip(jnp.floor(py), 0, h - 2).astype(jnp.int32)
    x0 = jnp.clip(jnp.floor(px), 0, w - 2).astype(jnp.int32)
    fy = jnp.clip(py - y0, 0.0, 1.0)
    fx = jnp.clip(px - x0, 0.0, 1.0)
    corners = []
    for dy, wy in ((0, 1.0 - fy), (1, fy)):
        for dx, wx in ((0, 1.0 - fx), (1, fx)):
            corners.append((y0 + dy, x0 + dx, wy * wx))
    return corners


def _p2g(py, px, pvy, pvx, active, h, w):
    """Scatter particle momentum + mass to the grid (bilinear)."""
    mom_x = jnp.zeros((h, w), jnp.float32)
    mom_y = jnp.zeros((h, w), jnp.float32)
    mass = jnp.zeros((h, w), jnp.float32)
    for iy, ix, wgt in _bilinear_corners(py, px, h, w):
        wa = wgt * active
        mom_x = mom_x.at[iy, ix].add(wa * pvx)
        mom_y = mom_y.at[iy, ix].add(wa * pvy)
        mass = mass.at[iy, ix].add(wa)
    inv = 1.0 / jnp.maximum(mass, 1e-6)
    vel = jnp.stack([mom_x * inv, mom_y * inv], axis=-1)
    return vel, mass


def _box3(q):
    qn = jnp.pad(q, 1, mode="edge")
    return sum(qn[1 + dy:qn.shape[0] - 1 + dy, 1 + dx:qn.shape[1] - 1 + dx]
               for dy in (-1, 0, 1) for dx in (-1, 0, 1)) / 9.0


def _extrapolate_velocity(vel, liquid, sweeps: int = 4):
    """Extend liquid velocity into nearby air cells (masked diffusion).

    Without ghost velocities the collocated divergence sees a false jump
    at the free surface (air cells are zero), the projection builds
    back-pressure, and falling liquid 'parachutes' — mantaflow solves the
    same problem with velocity extrapolation before the solve."""
    def sweep(carry, _):
        v, w = carry
        wavg = _box3(w)
        avg = jnp.stack([_box3(v[..., c] * w) for c in range(2)], axis=-1)
        avg = avg / jnp.maximum(wavg, 1e-6)[..., None]
        known = (w > 0.0)[..., None]
        fill = (wavg > 1e-6)[..., None]
        v = jnp.where(known, v, jnp.where(fill, avg, v))
        w = jnp.maximum(w, (wavg > 1e-6).astype(jnp.float32))
        return (v, w), None

    (vel, _), _ = jax.lax.scan(sweep, (vel, liquid), None, length=sweeps)
    return vel


def _project_free_surface(vel, liquid, iters, div_src=None):
    """Jacobi pressure solve with Dirichlet p = 0 in air (free surface);
    divergence is driven to ``div_src`` (default 0) inside the liquid.

    ``div_src`` > 0 in over-packed cells is the standard FLIP volume-
    conservation correction: the projection then pushes particles apart
    instead of letting the liquid silently compress."""
    div = grids.divergence2d_c(vel)
    if div_src is not None:
        div = div - div_src
    div = div * liquid

    def jacobi(p, _):
        pn = jnp.pad(p, 1, mode="edge")
        p_new = 0.25 * (
            pn[2:, 1:-1] + pn[:-2, 1:-1] + pn[1:-1, 2:] + pn[1:-1, :-2] - div
        )
        return p_new * liquid, None  # air pressure pinned to 0

    p, _ = jax.lax.scan(jacobi, jnp.zeros_like(div), None, length=iters)
    pn = jnp.pad(p, 1, mode="edge")
    gx = (pn[1:-1, 2:] - pn[1:-1, :-2]) * 0.5
    gy = (pn[2:, 1:-1] - pn[:-2, 1:-1]) * 0.5
    return vel - jnp.stack([gx, gy], axis=-1)


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


def _levelset_from_mass(mass, redist_iters):
    """Occupancy -> signed levelset: interior where particle mass exceeds
    ~40% of a full cell's (4 particles), then redistanced."""
    occ = mass / 4.0
    # one 3x3 box blur knocks down particle-lattice aliasing
    occ = _box3(occ)
    phi = (0.4 - occ) * 3.0
    return _redistance(phi, redist_iters)


def _sample_vec(vel, py, px):
    return (grids.sample2d(vel[..., 0], py, px),
            grids.sample2d(vel[..., 1], py, px))


@functools.partial(jax.jit, static_argnames=("cfg",))
def simulate_liquid2d(pos_x, radius, cfg: Liquid2DConfig):
    """One scene; returns (levelset_traj [T,H,W,1], vel_traj [T,H,W,2])."""
    h, w = cfg.height, cfg.width
    py, px, pvy, pvx, active = _seed_particles(
        h, w, pos_x, radius, cfg.basin_level)

    def body(state, _):
        py, px, pvy, pvx = state
        # --- P2G (+ ghost velocities in the air band) ---
        vel_p2g, mass = _p2g(py, px, pvy, pvx, active, h, w)
        liquid = (mass > 0.4).astype(jnp.float32)
        vel_old = _extrapolate_velocity(vel_p2g, liquid)
        # --- grid forces + free-surface projection ---
        vel = vel_old.at[..., 1].add(-cfg.dt * cfg.gravity * liquid)
        vel = grids.wall_bc2d(vel)
        div_src = cfg.density_relax * jnp.maximum(mass / 4.0 - 1.0, 0.0)
        vel = _project_free_surface(vel, liquid, cfg.project_iters, div_src)
        vel = grids.wall_bc2d(vel)
        # --- G2P: FLIP delta + PIC blend ---
        ux, uy = _sample_vec(vel, py, px)
        dx_, dy_ = _sample_vec(vel - vel_old, py, px)
        a = cfg.flip_ratio
        pvx = a * (pvx + dx_) + (1.0 - a) * ux
        pvy = a * (pvy + dy_) + (1.0 - a) * uy
        # --- advect particles (RK2 midpoint through the grid field) ---
        mx, my = _sample_vec(vel, py + 0.5 * cfg.dt * uy,
                             px + 0.5 * cfg.dt * ux)
        dxp = jnp.clip(cfg.dt * mx, -cfg.max_disp, cfg.max_disp)
        dyp = jnp.clip(cfg.dt * my, -cfg.max_disp, cfg.max_disp)
        px = jnp.clip(px + dxp, 0.5, w - 1.5)
        py = jnp.clip(py + dyp, 0.5, h - 1.5)
        # --- outputs: levelset from particle occupancy + grid velocity ---
        _, mass2 = _p2g(py, px, pvy, pvx, active, h, w)
        phi = _levelset_from_mass(mass2, cfg.redist_iters)
        return (py, px, pvy, pvx), (phi[..., None], vel)

    _, (phit, velt) = jax.lax.scan(
        body, (py, px, pvy, pvx), None, length=cfg.num_frames
    )
    return phit, velt


@functools.partial(jax.jit, static_argnames=("cfg",))
def simulate_liquid2d_batch(pos_x, radius, cfg: Liquid2DConfig):
    """Vectorized liquid scene sweep (see smoke2d.simulate_smoke2d_batch)."""
    return jax.vmap(lambda p, r: simulate_liquid2d(p, r, cfg))(pos_x, radius)
