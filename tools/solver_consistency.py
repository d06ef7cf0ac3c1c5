"""Pressure-solve self-consistency study (SURVEY.md §7 "hard parts").

The SURVEY flags that "the pressure solve must be good enough that
generated datasets have the same statistics" as the reference's mantaflow
pipeline.  Mantaflow is unavailable in this environment, so this study
closes what can be closed: the production Jacobi sweep is compared against
an INDEPENDENT converged solver (conjugate gradients,
datagen.grids.solve_pressure2d_cg) on the identical discretization, on
two axes:

1. single-projection accuracy — divergence residual after projecting a
   developed turbulent-ish plume velocity field with Jacobi-k for several
   k vs the CG reference, plus the velocity-field distance to the
   converged projection;
2. trajectory statistics — a full smoke scene integrated with Jacobi-50
   (the production dataset setting) vs the SAME scene integrated with CG
   projection every step: kinetic-energy time series and the
   radially-binned energy spectrum of the final frame.

Appends one JSON record to BENCHMARKS.jsonl; tests/test_datagen.py pins
the qualitative conclusions at small scale so a solver regression fails
CI.  Run on CPU by default (JAX_PLATFORMS=cpu honored via jax.config) so
it never contends with chip benchmarks.

``python tools/solver_consistency.py 3d`` runs the 3D replica
(production smoke3 solver, Jacobi-40, vs a converged 3D deflated-CG
oracle at half resolution per axis — metric=solver_consistency_3d).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("JAX_PLATFORMS") == "cpu":
    jax.config.update("jax_platforms", "cpu")
# Real float64 for the CG reference solve (grids.solve_pressure2d_cg
# promotes); f32 CG loses conjugacy over the O(1000) iterations the
# converged reference needs at 128x96.
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

from deepfluids_tpu.datagen import grids
from deepfluids_tpu.datagen.smoke2d import Smoke2DConfig, simulate_smoke2d
from deepfluids_tpu.datagen.smoke3d import Smoke3DConfig, simulate_smoke3d

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def div_norm(vel: np.ndarray) -> float:
    """Interior L2 norm of central divergence (boundary rows/cols carry the
    Neumann closure and are excluded on BOTH solvers identically)."""
    d = np.asarray(grids.divergence2d_c(jnp.asarray(vel)))[1:-1, 1:-1]
    return float(np.sqrt(np.mean(d * d)))


def energy_spectrum(vel: np.ndarray, nbins: int = 16) -> np.ndarray:
    """Radially-binned kinetic-energy spectrum of vel [..., C] (2D or 3D:
    rfft over all grid axes, energy summed over velocity components)."""
    grid_axes = tuple(range(vel.ndim - 1))
    e = sum(np.abs(np.fft.rfftn(vel[..., c], axes=grid_axes)) ** 2
            for c in range(vel.shape[-1]))
    freqs = [np.fft.fftfreq(vel.shape[a]) for a in grid_axes[:-1]]
    freqs.append(np.fft.rfftfreq(vel.shape[grid_axes[-1]]))
    k = np.sqrt(sum(f ** 2 for f in np.meshgrid(*freqs, indexing="ij")))
    edges = np.linspace(0, k.max() + 1e-9, nbins + 1)
    out = np.zeros(nbins)
    for i in range(nbins):
        m = (k >= edges[i]) & (k < edges[i + 1])
        out[i] = e[m].sum()
    return out


def _traj_stats(va: np.ndarray, vb: np.ndarray, frames: int) -> dict:
    """Late-window statistical distance between two trajectories: relative
    kinetic-energy gap and radial-spectrum relative error (b = reference)."""
    late = slice(frames // 2, None)
    per_frame = tuple(range(1, va.ndim))
    ke_a = (va ** 2).sum(axis=per_frame)
    ke_b = (vb ** 2).sum(axis=per_frame)
    ke_rel = (ke_a[late].mean() - ke_b[late].mean()) / ke_b[late].mean()
    sp_a = np.mean([energy_spectrum(f) for f in va[late]], axis=0)
    sp_b = np.mean([energy_spectrum(f) for f in vb[late]], axis=0)
    live = sp_b > sp_b.max() * 1e-6          # bins carrying real energy
    sp_rel = np.abs(sp_a - sp_b)[live] / sp_b[live]
    return {"ke": float(ke_rel), "sp_med": float(np.median(sp_rel)),
            "sp_max": float(sp_rel.max())}


def run_study(height: int = 128, width: int = 96, frames: int = 100,
              jacobi_iters: tuple[int, ...] = (20, 50, 100),
              ensemble: int = 5) -> dict:
    cfg = dict(height=height, width=width, num_frames=frames)
    t0 = time.time()

    # --- trajectory ensemble: production Jacobi-50 vs converged CG, with a
    # CHAOS CONTROL.  Pointwise comparison is chaos-limited — after enough
    # frames ANY perturbation decorrelates the flows — so even late-window
    # time averages of a single developing plume carry realization
    # variance.  The control twin (Jacobi-50 vs Jacobi-50 with buoyancy
    # perturbed by 1e-4 — same solver, epsilon-different physics; 1e-6
    # rounds away entirely in f32) measures that chaos floor.  KE gaps are
    # SIGNED per scene: a solver bias shows a consistent sign across the
    # ensemble, chaos variance shows random signs.
    jc_stats, ctrl_stats = [], []
    for i in range(ensemble):
        pos = jnp.float32(0.2 + 0.6 * i / max(1, ensemble - 1))
        size = jnp.float32(0.06 + 0.01 * (i % 3))
        vj, _ = simulate_smoke2d(pos, size, Smoke2DConfig(**cfg))
        vc, _ = simulate_smoke2d(pos, size, Smoke2DConfig(projection="cg",
                                                          **cfg))
        vp, _ = simulate_smoke2d(pos, size, Smoke2DConfig(
            buoyancy=0.08 * (1 + 1e-4), **cfg))
        vj, vc, vp = np.asarray(vj), np.asarray(vc), np.asarray(vp)
        jc_stats.append(_traj_stats(vj, vc, frames))
        ctrl_stats.append(_traj_stats(vp, vj, frames))
        if i == 0:
            vj0, vc0 = vj, vc

    med = lambda recs, k: float(np.median([abs(r[k]) for r in recs]))
    signed = lambda recs: [round(r["ke"], 4) for r in recs]

    # early deterministic window: before chaos kicks in the two solvers
    # must agree pointwise (scene 0)
    ke_j = (vj0 ** 2).sum(axis=(1, 2, 3))
    ke_c = (vc0 ** 2).sum(axis=(1, 2, 3))
    early = slice(1, max(2, frames // 5))
    ke_rel_early = np.abs(ke_j[early] - ke_c[early]) / np.maximum(
        ke_c[early], 1e-12)

    traj_l2 = np.sqrt(((vj0 - vc0) ** 2).mean(axis=(1, 2, 3)))
    vscale = np.sqrt((vc0 ** 2).mean(axis=(1, 2, 3))).max()
    vj, vc = vj0, vc0

    # --- single-projection accuracy on the developed final CG frame ------
    vel = jnp.asarray(vc[-1])
    # re-disturb: advect once so the field has fresh divergence to remove
    dirty = grids.advect2d(vel, vel, 1.0)
    d0 = div_norm(np.asarray(dirty))
    proj = {}
    for k in jacobi_iters:
        pk = np.asarray(grids.pressure_project2d(dirty, iters=k))
        proj[f"jacobi_{k}"] = pk
    proj["cg"] = np.asarray(grids.pressure_project2d_cg(dirty, tol=1e-8))

    # How converged is the CG reference itself on the compact system?
    div_d = np.asarray(grids.divergence2d_c(dirty))
    pcg = np.asarray(grids.solve_pressure2d_cg(
        grids.divergence2d_c(dirty), tol=1e-10))
    compact_res = np.asarray(grids.laplacian2d(jnp.asarray(pcg))) - (
        div_d - div_d.mean())
    cg_compact_rel = float(np.sqrt((compact_res ** 2).mean())
                           / np.sqrt((div_d ** 2).mean()))

    residuals = {name: div_norm(v) / d0 for name, v in proj.items()}
    vrms = float(np.sqrt((proj["cg"] ** 2).mean()))
    vel_dist = {
        name: float(np.sqrt(((v - proj["cg"]) ** 2).mean()) / vrms)
        for name, v in proj.items() if name != "cg"
    }

    return {
        "metric": "solver_consistency_2d",
        "resolution": [height, width],
        "frames": frames,
        "cg_compact_residual_rel": round(cg_compact_rel, 9),
        "div_residual_vs_unprojected": {k: round(v, 6)
                                        for k, v in residuals.items()},
        "vel_rel_l2_to_converged": {k: round(v, 6)
                                    for k, v in vel_dist.items()},
        "ensemble": ensemble,
        "ke_rel_err_early_max": round(float(ke_rel_early.max()), 5),
        "ke_stat_rel_jacobi_vs_cg": round(med(jc_stats, "ke"), 5),
        "ke_stat_rel_chaos_control": round(med(ctrl_stats, "ke"), 5),
        "ke_signed_gaps_jacobi_vs_cg": signed(jc_stats),
        "ke_signed_gaps_chaos_control": signed(ctrl_stats),
        "spectrum_rel_med_jacobi_vs_cg": round(med(jc_stats, "sp_med"), 5),
        "spectrum_rel_med_chaos_control": round(med(ctrl_stats, "sp_med"), 5),
        "traj_l2_final_over_vscale": round(float(traj_l2[-1] / vscale), 5),
        "backend": jax.default_backend(),
        "secs": round(time.time() - t0, 1),
        "ts": time.strftime("%Y-%m-%d %H:%M:%S"),
    }


def div_norm3(vel: np.ndarray) -> float:
    """Interior L2 norm of central divergence in 3D (boundary shells carry
    the Neumann closure on BOTH solvers identically and are excluded)."""
    d = np.asarray(grids.divergence3d_c(jnp.asarray(vel)))[1:-1, 1:-1, 1:-1]
    return float(np.sqrt(np.mean(d * d)))


def run_study_3d(depth: int = 16, height: int = 32, width: int = 56,
                 frames: int = 80, jacobi_iters: tuple[int, ...] = (20, 40, 80),
                 ensemble: int = 3) -> dict:
    """3D replica of :func:`run_study` at half the production resolution
    per axis (f64 CG every step at 112x64x32 is CPU-prohibitive; the
    Jacobi-convergence question is resolution-monotone — the production
    grid is HARDER for a fixed iteration count, so gaps measured here are
    a lower bound).  Production smoke3 uses project_iters=40."""
    cfg = dict(depth=depth, height=height, width=width, num_frames=frames)
    t0 = time.time()

    jc_stats, ctrl_stats = [], []
    for i in range(ensemble):
        inflow = jnp.float32(1.0 + 1.0 * i / max(1, ensemble - 1))
        buo = jnp.float32(0.05 + 0.01 * (i % 2))
        vj, _ = simulate_smoke3d(inflow, buo, Smoke3DConfig(**cfg))
        vc, _ = simulate_smoke3d(inflow, buo,
                                 Smoke3DConfig(projection="cg", **cfg))
        vp, _ = simulate_smoke3d(inflow, buo * (1 + 1e-4),
                                 Smoke3DConfig(**cfg))
        vj, vc, vp = np.asarray(vj), np.asarray(vc), np.asarray(vp)
        jc_stats.append(_traj_stats(vj, vc, frames))
        ctrl_stats.append(_traj_stats(vp, vj, frames))
        if i == 0:
            vj0, vc0 = vj, vc

    med = lambda recs, k: float(np.median([abs(r[k]) for r in recs]))
    signed = lambda recs: [round(r["ke"], 4) for r in recs]

    per_frame = tuple(range(1, vj0.ndim))
    ke_j = (vj0 ** 2).sum(axis=per_frame)
    ke_c = (vc0 ** 2).sum(axis=per_frame)
    early = slice(1, max(2, frames // 5))
    ke_rel_early = np.abs(ke_j[early] - ke_c[early]) / np.maximum(
        ke_c[early], 1e-12)

    traj_l2 = np.sqrt(((vj0 - vc0) ** 2).mean(axis=per_frame))
    vscale = np.sqrt((vc0 ** 2).mean(axis=per_frame)).max()

    # --- single-projection accuracy on the developed final CG frame ------
    vel = jnp.asarray(vc0[-1])
    dirty = grids.advect3d(vel, vel, 1.0)
    d0 = div_norm3(np.asarray(dirty))
    proj = {}
    for k in jacobi_iters:
        proj[f"jacobi_{k}"] = np.asarray(
            grids.pressure_project3d(dirty, iters=k))
    proj["cg"] = np.asarray(grids.pressure_project3d_cg(dirty, tol=1e-8))

    div_d = np.asarray(grids.divergence3d_c(dirty))
    pcg = np.asarray(grids.solve_pressure3d_cg(
        grids.divergence3d_c(dirty), tol=1e-10))
    compact_res = np.asarray(grids.laplacian3d(jnp.asarray(pcg))) - (
        div_d - div_d.mean())
    cg_compact_rel = float(np.sqrt((compact_res ** 2).mean())
                           / np.sqrt((div_d ** 2).mean()))

    residuals = {name: div_norm3(v) / d0 for name, v in proj.items()}
    vrms = float(np.sqrt((proj["cg"] ** 2).mean()))
    vel_dist = {
        name: float(np.sqrt(((v - proj["cg"]) ** 2).mean()) / vrms)
        for name, v in proj.items() if name != "cg"
    }

    return {
        "metric": "solver_consistency_3d",
        "resolution": [depth, height, width],
        "frames": frames,
        "cg_compact_residual_rel": round(cg_compact_rel, 9),
        "div_residual_vs_unprojected": {k: round(v, 6)
                                        for k, v in residuals.items()},
        "vel_rel_l2_to_converged": {k: round(v, 6)
                                    for k, v in vel_dist.items()},
        "ensemble": ensemble,
        "ke_rel_err_early_max": round(float(ke_rel_early.max()), 5),
        "ke_stat_rel_jacobi_vs_cg": round(med(jc_stats, "ke"), 5),
        "ke_stat_rel_chaos_control": round(med(ctrl_stats, "ke"), 5),
        "ke_signed_gaps_jacobi_vs_cg": signed(jc_stats),
        "ke_signed_gaps_chaos_control": signed(ctrl_stats),
        "spectrum_rel_med_jacobi_vs_cg": round(med(jc_stats, "sp_med"), 5),
        "spectrum_rel_med_chaos_control": round(med(ctrl_stats, "sp_med"), 5),
        "traj_l2_final_over_vscale": round(float(traj_l2[-1] / vscale), 5),
        "backend": jax.default_backend(),
        "secs": round(time.time() - t0, 1),
        "ts": time.strftime("%Y-%m-%d %H:%M:%S"),
    }


def run_study_matched(height: int = 128, width: int = 96, frames: int = 100,
                      ensemble: int = 5) -> dict:
    """Statistical distance of the MATCHED (Leray/curl-manifold) datagen
    trajectories to the converged-CG reference, with the production-Jacobi
    gap measured on the SAME scenes for context.

    BENCHMARKS.md claims the matched round-3 datasets are "the MORE
    physical ones"; this pins that claim with the same late-window
    KE/spectrum statistics the jacobi-vs-cg study uses.  The matched
    projection differs from cg in boundary handling too (zero wall
    through-flow by construction, no trailing wall_bc), so its gap to cg
    includes that modeling difference — the comparison asks whether the
    matched family sits CLOSER to the converged solve than the production
    Jacobi family it replaced."""
    cfg = dict(height=height, width=width, num_frames=frames)
    t0 = time.time()

    m_stats, j_stats, ctrl_stats = [], [], []
    for i in range(ensemble):
        pos = jnp.float32(0.2 + 0.6 * i / max(1, ensemble - 1))
        size = jnp.float32(0.06 + 0.01 * (i % 3))
        vc, _ = simulate_smoke2d(pos, size,
                                 Smoke2DConfig(projection="cg", **cfg))
        vm, _ = simulate_smoke2d(pos, size,
                                 Smoke2DConfig(projection="matched", **cfg))
        vj, _ = simulate_smoke2d(pos, size, Smoke2DConfig(**cfg))
        vp, _ = simulate_smoke2d(pos, size, Smoke2DConfig(
            buoyancy=0.08 * (1 + 1e-4), **cfg))
        vc, vm, vj, vp = (np.asarray(v) for v in (vc, vm, vj, vp))
        m_stats.append(_traj_stats(vm, vc, frames))
        j_stats.append(_traj_stats(vj, vc, frames))
        ctrl_stats.append(_traj_stats(vp, vj, frames))

    med = lambda recs, k: float(np.median([abs(r[k]) for r in recs]))
    signed = lambda recs: [round(r["ke"], 4) for r in recs]

    return {
        "metric": "solver_consistency_matched2d",
        "resolution": [height, width],
        "frames": frames,
        "ensemble": ensemble,
        "ke_stat_rel_matched_vs_cg": round(med(m_stats, "ke"), 5),
        "ke_stat_rel_jacobi_vs_cg": round(med(j_stats, "ke"), 5),
        "ke_stat_rel_chaos_control": round(med(ctrl_stats, "ke"), 5),
        "ke_signed_gaps_matched_vs_cg": signed(m_stats),
        "ke_signed_gaps_jacobi_vs_cg": signed(j_stats),
        "spectrum_rel_med_matched_vs_cg": round(med(m_stats, "sp_med"), 5),
        "spectrum_rel_med_jacobi_vs_cg": round(med(j_stats, "sp_med"), 5),
        "spectrum_rel_med_chaos_control": round(med(ctrl_stats, "sp_med"), 5),
        "backend": jax.default_backend(),
        "secs": round(time.time() - t0, 1),
        "ts": time.strftime("%Y-%m-%d %H:%M:%S"),
    }


if __name__ == "__main__":
    if "3d" in sys.argv[1:]:
        if "--full" in sys.argv[1:]:
            # Production discretization (VERDICT r3 next #6): the half-res
            # default showed a -20 % KE bias with the OPPOSITE sign to 2D's
            # +50 %; confirm at the exact grid the smoke3 datasets use.
            # frames=150 keeps the f64-CG-every-step reference affordable on
            # one CPU (~8x the cells and ~2x the CG iters of half-res) while
            # still covering the developed late window the statistics use.
            rec = run_study_3d(depth=32, height=64, width=112, frames=150)
        else:
            rec = run_study_3d()
    elif "matched" in sys.argv[1:]:
        rec = run_study_matched()
    else:
        rec = run_study()
    print(json.dumps(rec))
    with open(os.path.join(ROOT, "BENCHMARKS.jsonl"), "a") as f:
        f.write(json.dumps(rec) + "\n")
