"""Fused finite-difference stencils as Pallas TPU kernels.

The reference leaned on cuDNN-fused TF ops for its hot path; the TPU-native
equivalent (BASELINE.json north_star [B]: "fused finite-difference Pallas
stencils") is a single-VMEM-pass kernel per field: the whole 2D grid
(128x96 f32 ~= 49 KB) fits comfortably in VMEM, so each grid program loads one
batch element once from HBM, computes every derivative on the VPU, and writes
all outputs — one HBM round-trip instead of one per derivative.

API mirrors :mod:`deepfluids_tpu.ops.fd` (the jnp oracle used as the testing
reference and the CPU fallback).  Kernels run compiled on TPU and in
interpreter mode elsewhere, so the same code path is unit-testable on CPU.

Exact same discretization as the oracle: forward differences, edge
replication (see fd.py docstring; reference deep-fluids ops.py per SURVEY §2).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def use_pallas() -> bool:
    """Whether the fused-stencil code path is selected (default: on TPU).

    ``DEEPFLUIDS_PALLAS=1/0`` overrides — tests force the path ON on the
    8-virtual-device CPU mesh (kernels then run in interpret mode, see
    :func:`_interpret`) to exercise the exact shard_map+pallas composition
    the multi-chip TPU trainer uses."""
    env = os.environ.get("DEEPFLUIDS_PALLAS")
    if env is not None:
        return env.lower() not in ("0", "false", "")
    return jax.default_backend() == "tpu"


def _interpret() -> bool:
    """Interpret-mode (pure jax eval) off-TPU; compiled Mosaic on TPU."""
    return jax.default_backend() != "tpu"


def _fd(x, axis):
    """Forward diff along ``axis`` of a 2D block, edge-replicated, in-kernel.

    Mosaic cannot lower sub-tile concatenates (offset-mismatched
    ``tpu.concatenate``), so instead of the oracle's diff+concat this uses two
    full-shape circular rolls and a masked select — pure VPU ops on aligned
    vectors:

      fwd[j]  = x[j+1] - x[j]   (wrong only at j = n-1, where roll wraps)
      bwd[j]  = x[j] - x[j-1]   (right at j = n-1: equals fwd[n-2])
      out[j]  = fwd[j] if j < n-1 else bwd[j]

    Differences are computed in f32 regardless of input dtype (Mosaic has no
    sub-32-bit rotate, and bf16 FD is numerically poor); callers cast back.
    """
    x = x.astype(jnp.float32)
    n = x.shape[axis]
    fwd = pltpu.roll(x, shift=n - 1, axis=axis) - x  # == roll(x, -1) - x
    bwd = x - pltpu.roll(x, shift=1, axis=axis)
    j = jax.lax.broadcasted_iota(jnp.int32, x.shape, axis)
    return jnp.where(j < n - 1, fwd, bwd)


def _fd_last(x):
    """Forward diff along the last axis (lanes), edge-replicated."""
    return _fd(x, 1)


def _fd_first(x):
    """Forward diff along the first axis (sublanes), edge-replicated."""
    return _fd(x, 0)


# Kernels operate in NCHW: the framework's NHWC layout would put the tiny
# channel dim (1-4) on the 128-lane axis, wasting >95% of every VMEM tile and
# OOMing VMEM for batched fields.  In NCHW the (H, W) plane lands on
# (sublanes, lanes).  The public wrappers transpose at the boundary (a ~100 KB
# XLA copy per field — negligible next to the saved HBM round-trips).


# ---------------------------------------------------------------------------
# curl2d: psi [B, H, W, 1] -> u [B, H, W, 2], one VMEM pass per batch element
# ---------------------------------------------------------------------------

def _curl2d_kernel(psi_ref, out_ref):
    p = psi_ref[0, 0, :, :]       # [H, W]
    dt = out_ref.dtype
    out_ref[0, 0, :, :] = _fd_first(p).astype(dt)    # u = d(psi)/dy
    out_ref[0, 1, :, :] = (-_fd_last(p)).astype(dt)  # v = -d(psi)/dx


@jax.jit
def curl2d_fused(psi: jnp.ndarray) -> jnp.ndarray:
    """Pallas-fused :func:`deepfluids_tpu.ops.fd.curl2d`.

    Args:
      psi: ``[B, H, W, 1]`` stream function (batched; exactly 4D).
    Returns:
      ``[B, H, W, 2]`` velocity.
    """
    b, h, w, _ = psi.shape
    pc = jnp.moveaxis(psi, -1, 1)  # [B, 1, H, W]
    out = pl.pallas_call(
        _curl2d_kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, 1, h, w), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 2, h, w), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, 2, h, w), psi.dtype),
        interpret=_interpret(),
    )(pc)
    return jnp.moveaxis(out, 1, -1)


# ---------------------------------------------------------------------------
# jacobian2d: x [B, H, W, 2] -> (J [B, H, W, 4], vort [B, H, W, 1])
# ---------------------------------------------------------------------------

def _jacobian2d_kernel(x_ref, j_ref, w_ref):
    u = x_ref[0, 0, :, :]
    v = x_ref[0, 1, :, :]
    dudx = _fd_last(u)
    dudy = _fd_first(u)
    dvdx = _fd_last(v)
    dvdy = _fd_first(v)
    dt = j_ref.dtype
    j_ref[0, 0, :, :] = dudx.astype(dt)
    j_ref[0, 1, :, :] = dudy.astype(dt)
    j_ref[0, 2, :, :] = dvdx.astype(dt)
    j_ref[0, 3, :, :] = dvdy.astype(dt)
    w_ref[0, 0, :, :] = (dvdx - dudy).astype(dt)


@jax.jit
def jacobian2d_fused(x: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Pallas-fused :func:`deepfluids_tpu.ops.fd.jacobian2d` (4D input).

    See :func:`deepfluids_tpu.ops.fd.jacobian2d` for semantics."""
    b, h, w, _ = x.shape
    xc = jnp.moveaxis(x, -1, 1)  # [B, 2, H, W]
    j, vort = pl.pallas_call(
        _jacobian2d_kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, 2, h, w), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, 4, h, w), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, h, w), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, 4, h, w), x.dtype),
            jax.ShapeDtypeStruct((b, 1, h, w), x.dtype),
        ),
        interpret=_interpret(),
    )(xc)
    return jnp.moveaxis(j, 1, -1), jnp.moveaxis(vort, 1, -1)


# ---------------------------------------------------------------------------
# 3D kernels.  Volumes are processed in NC DHW layout with (H, W) on the
# (sublane, lane) axes; the z-derivative walks depth slices with a fori_loop
# (D is small — 32 for the reference 3D grid).  VMEM budget at 112x64x32 f32
# (0.92 MB per channel-volume): curl3 keeps in(3ch)+out(3ch) = 5.5 MB per
# program; jacobian3 grids over (batch, source channel) so each program
# holds 1 input channel + its 3 derivative components = 3.7 MB — both fit
# with double buffering in 16 MB VMEM.
# ---------------------------------------------------------------------------


def _fd_z(vol_ref, ci, d, D):
    """Forward z-difference of channel ``ci`` at depth slice ``d``.

    Edge replication: the last slice reuses the previous difference, i.e.
    d_eff = min(d, D-2), out = vol[d_eff+1] - vol[d_eff].
    """
    d_eff = jnp.minimum(d, D - 2)
    a = vol_ref[0, ci, d_eff + 1, :, :].astype(jnp.float32)
    b = vol_ref[0, ci, d_eff, :, :].astype(jnp.float32)
    return a - b


def _curl3d_kernel(psi_ref, out_ref):
    """u = dc/dy - db/dz, v = da/dz - dc/dx, w = db/dx - da/dy."""
    D = psi_ref.shape[2]
    dt = out_ref.dtype

    def body(d, _):
        a = psi_ref[0, 0, d, :, :].astype(jnp.float32)
        b = psi_ref[0, 1, d, :, :].astype(jnp.float32)
        c = psi_ref[0, 2, d, :, :].astype(jnp.float32)
        dadz = _fd_z(psi_ref, 0, d, D)
        dbdz = _fd_z(psi_ref, 1, d, D)
        out_ref[0, 0, d, :, :] = (_fd_first(c) - dbdz).astype(dt)
        out_ref[0, 1, d, :, :] = (dadz - _fd_last(c)).astype(dt)
        out_ref[0, 2, d, :, :] = (_fd_last(b) - _fd_first(a)).astype(dt)
        return 0

    jax.lax.fori_loop(0, D, body, 0)


@jax.jit
def curl3d_fused(psi: jnp.ndarray) -> jnp.ndarray:
    """Pallas-fused :func:`deepfluids_tpu.ops.fd.curl3d`.

    Args:
      psi: ``[B, D, H, W, 3]`` vector potential (batched; exactly 5D).
    Returns:
      ``[B, D, H, W, 3]`` velocity (u, v, w).
    """
    b, d, h, w, _ = psi.shape
    pc = jnp.moveaxis(psi, -1, 1)  # [B, 3, D, H, W]
    out = pl.pallas_call(
        _curl3d_kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, 3, d, h, w), lambda i: (i, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 3, d, h, w), lambda i: (i, 0, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, 3, d, h, w), psi.dtype),
        interpret=_interpret(),
    )(pc)
    return jnp.moveaxis(out, 1, -1)


def _jacobian3d_kernel(x_ref, j_ref):
    """One source channel -> its (d/dx, d/dy, d/dz) derivative volumes."""
    D = x_ref.shape[2]
    dt = j_ref.dtype

    def body(d, _):
        s = x_ref[0, 0, d, :, :].astype(jnp.float32)
        j_ref[0, 0, d, :, :] = _fd_last(s).astype(dt)            # d/dx
        j_ref[0, 1, d, :, :] = _fd_first(s).astype(dt)           # d/dy
        j_ref[0, 2, d, :, :] = _fd_z(x_ref, 0, d, D).astype(dt)  # d/dz
        return 0

    jax.lax.fori_loop(0, D, body, 0)


@jax.jit
def jacobian3d_fused(x: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Pallas-fused :func:`deepfluids_tpu.ops.fd.jacobian3d` (5D input).

    Returns (J [B,D,H,W,9] in the oracle's source-channel-major order
    (dudx, dudy, dudz, dvdx, ...), vort [B,D,H,W,3]).  The vorticity is
    assembled from J slices outside the kernel (3 subtractions XLA fuses
    into the transpose back to channels-last).
    """
    b, d, h, w, _ = x.shape
    xc = jnp.moveaxis(x, -1, 1)  # [B, 3, D, H, W]
    j = pl.pallas_call(
        _jacobian3d_kernel,
        grid=(b, 3),
        in_specs=[
            pl.BlockSpec((1, 1, d, h, w), lambda i, c: (i, c, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 3, d, h, w), lambda i, c: (i, c, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, 9, d, h, w), x.dtype),
        interpret=_interpret(),
    )(xc)
    # vort = (dwdy - dvdz, dudz - dwdx, dvdx - dudy) = rows (7-5, 2-6, 3-1)
    vort = jnp.stack(
        [j[:, 7] - j[:, 5], j[:, 2] - j[:, 6], j[:, 3] - j[:, 1]], axis=1
    )
    return jnp.moveaxis(j, 1, -1), jnp.moveaxis(vort, 1, -1)


# ---------------------------------------------------------------------------
# Differentiable fused stencils (custom VJP) — usable inside the training
# loss.  The backward pass is the TRANSPOSED forward-difference stencil,
# also a single-VMEM-pass Pallas kernel.  For the edge-replicated forward
# diff d = W x (d[i] = x[i+1]-x[i] for i<n-1, d[n-1] = x[n-1]-x[n-2]),
# the cotangent is x_bar = W^T d_bar:
#
#   x_bar[j]    = d_bar[j-1] - d_bar[j]            (interior)
#   x_bar[0]    = -d_bar[0]
#   x_bar[n-2]  = d_bar[n-3] - d_bar[n-2] - d_bar[n-1]
#   x_bar[n-1]  = d_bar[n-2] + d_bar[n-1]
#
# (requires n >= 3, true for any field grid).  Validated against jax.grad
# of the jnp oracle in tests/test_ops.py.
# ---------------------------------------------------------------------------


def _fdt(d, axis):
    """Transpose of :func:`_fd` along ``axis`` of a 2D block (see above)."""
    d = d.astype(jnp.float32)
    n = d.shape[axis]
    r1 = pltpu.roll(d, shift=1, axis=axis)        # d_bar[j-1]
    rm1 = pltpu.roll(d, shift=n - 1, axis=axis)   # d_bar[j+1]
    j = jax.lax.broadcasted_iota(jnp.int32, d.shape, axis)
    x = r1 - d
    x = jnp.where(j == 0, -d, x)
    x = jnp.where(j == n - 2, r1 - d - rm1, x)
    x = jnp.where(j == n - 1, r1 + d, x)
    return x


def _curl2d_bwd_kernel(g_ref, out_ref):
    """psi_bar = fdt_y(u_bar) - fdt_x(v_bar)  (curl2d transpose)."""
    gu = g_ref[0, 0, :, :]
    gv = g_ref[0, 1, :, :]
    out_ref[0, 0, :, :] = (_fdt(gu, 0) - _fdt(gv, 1)).astype(out_ref.dtype)


def _curl2d_bwd(g: jnp.ndarray) -> jnp.ndarray:
    b, h, w, _ = g.shape
    gc = jnp.moveaxis(g, -1, 1)
    out = pl.pallas_call(
        _curl2d_bwd_kernel,
        grid=(b,),
        in_specs=[pl.BlockSpec((1, 2, h, w), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 1, h, w), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, 1, h, w), g.dtype),
        interpret=_interpret(),
    )(gc)
    return jnp.moveaxis(out, 1, -1)


def _check_min3(x, ndim_spatial: int, name: str) -> None:
    """The transposed stencils (_fdt/_fdt_z) require every differenced
    spatial extent >= 3: at n == 2 the last-row branch overwrites the
    first-row contribution and the cotangent is silently wrong (the
    forward kernels themselves are fine at n == 2).  Static shapes, so
    this is a trace-time check."""
    spatial = x.shape[1:1 + ndim_spatial]
    if any(n < 3 for n in spatial):
        raise ValueError(
            f"{name}: spatial dims {spatial} must all be >= 3 (the "
            f"transposed-stencil VJP is wrong at size 2; use the ops.fd "
            f"oracle for degenerate grids)")


@jax.custom_vjp
def curl2d_p(psi: jnp.ndarray) -> jnp.ndarray:
    """Differentiable :func:`curl2d_fused` — drop-in for ops.fd.curl2d in
    jitted loss functions (4D input)."""
    _check_min3(psi, 2, "curl2d_p")
    return curl2d_fused(psi)


def _curl2d_p_fwd(psi):
    _check_min3(psi, 2, "curl2d_p")
    return curl2d_fused(psi), None


def _curl2d_p_bwd(_, g):
    return (_curl2d_bwd(g),)


curl2d_p.defvjp(_curl2d_p_fwd, _curl2d_p_bwd)


def _jacobian2d_bwd_kernel(gj_ref, gw_ref, out_ref):
    """Transpose of jacobian2d (+vorticity):
    u_bar = fdt_x(J0) + fdt_y(J1) - fdt_y(w_bar)
    v_bar = fdt_x(J2) + fdt_y(J3) + fdt_x(w_bar)."""
    gw = gw_ref[0, 0, :, :]
    u = (_fdt(gj_ref[0, 0, :, :], 1) + _fdt(gj_ref[0, 1, :, :], 0)
         - _fdt(gw, 0))
    v = (_fdt(gj_ref[0, 2, :, :], 1) + _fdt(gj_ref[0, 3, :, :], 0)
         + _fdt(gw, 1))
    dt = out_ref.dtype
    out_ref[0, 0, :, :] = u.astype(dt)
    out_ref[0, 1, :, :] = v.astype(dt)


def _jacobian2d_bwd(gj: jnp.ndarray, gw: jnp.ndarray) -> jnp.ndarray:
    b, h, w, _ = gj.shape
    out = pl.pallas_call(
        _jacobian2d_bwd_kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, 4, h, w), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, h, w), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 2, h, w), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, 2, h, w), gj.dtype),
        interpret=_interpret(),
    )(jnp.moveaxis(gj, -1, 1), jnp.moveaxis(gw, -1, 1))
    return jnp.moveaxis(out, 1, -1)


@jax.custom_vjp
def jacobian2d_p(x: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Differentiable :func:`jacobian2d_fused` (4D input)."""
    _check_min3(x, 2, "jacobian2d_p")
    return jacobian2d_fused(x)


def _jacobian2d_p_fwd(x):
    _check_min3(x, 2, "jacobian2d_p")
    return jacobian2d_fused(x), None


def _jacobian2d_p_bwd(_, g):
    gj, gw = g
    return (_jacobian2d_bwd(gj, gw),)


jacobian2d_p.defvjp(_jacobian2d_p_fwd, _jacobian2d_p_bwd)


# ---------------------------------------------------------------------------
# 3D differentiable fused stencils.  Same transposed-stencil scheme as 2D;
# the transposed z-derivative is computed slice-wise (fori_loop over depth)
# with neighbor reads, mirroring _fd_z.
# ---------------------------------------------------------------------------


def _fdt_z(vol_ref, ci, j, D):
    """Transposed forward z-diff: cotangent slice j for channel ci.

    x_bar[j] = d[j-1] - d[j];  x_bar[0] = -d[0];
    x_bar[D-2] = d[D-3] - d[D-2] - d[D-1];  x_bar[D-1] = d[D-2] + d[D-1].
    """
    dm1 = vol_ref[0, ci, jnp.maximum(j - 1, 0), :, :].astype(jnp.float32)
    dj = vol_ref[0, ci, j, :, :].astype(jnp.float32)
    djp = vol_ref[0, ci, jnp.minimum(j + 1, D - 1), :, :].astype(jnp.float32)
    out = dm1 - dj
    out = jnp.where(j == 0, -dj, out)
    out = jnp.where(j == D - 2, dm1 - dj - djp, out)
    out = jnp.where(j == D - 1, dm1 + dj, out)
    return out


def _curl3d_bwd_kernel(g_ref, out_ref):
    """Transpose of curl3: given (gu, gv, gw) cotangents,
    a_bar = fdt_z(gv) - fdt_y(gw); b_bar = fdt_x(gw) - fdt_z(gu);
    c_bar = fdt_y(gu) - fdt_x(gv)."""
    D = g_ref.shape[2]
    dt = out_ref.dtype

    def body(d, _):
        gu = g_ref[0, 0, d, :, :].astype(jnp.float32)
        gv = g_ref[0, 1, d, :, :].astype(jnp.float32)
        gw = g_ref[0, 2, d, :, :].astype(jnp.float32)
        out_ref[0, 0, d, :, :] = (
            _fdt_z(g_ref, 1, d, D) - _fdt(gw, 0)).astype(dt)
        out_ref[0, 1, d, :, :] = (
            _fdt(gw, 1) - _fdt_z(g_ref, 0, d, D)).astype(dt)
        out_ref[0, 2, d, :, :] = (_fdt(gu, 0) - _fdt(gv, 1)).astype(dt)
        return 0

    jax.lax.fori_loop(0, D, body, 0)


def _curl3d_bwd(g: jnp.ndarray) -> jnp.ndarray:
    b, d, h, w, _ = g.shape
    out = pl.pallas_call(
        _curl3d_bwd_kernel,
        grid=(b,),
        in_specs=[pl.BlockSpec((1, 3, d, h, w), lambda i: (i, 0, 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 3, d, h, w), lambda i: (i, 0, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, 3, d, h, w), g.dtype),
        interpret=_interpret(),
    )(jnp.moveaxis(g, -1, 1))
    return jnp.moveaxis(out, 1, -1)


@jax.custom_vjp
def curl3d_p(psi: jnp.ndarray) -> jnp.ndarray:
    """Differentiable :func:`curl3d_fused` (5D input)."""
    _check_min3(psi, 3, "curl3d_p")
    return curl3d_fused(psi)


def _curl3d_p_fwd(psi):
    _check_min3(psi, 3, "curl3d_p")
    return curl3d_fused(psi), None


def _curl3d_p_bwd(_, g):
    return (_curl3d_bwd(g),)


curl3d_p.defvjp(_curl3d_p_fwd, _curl3d_p_bwd)


def _jacobian3d_bwd_kernel(gj_ref, out_ref):
    """Transpose of one source channel's (d/dx, d/dy, d/dz) block:
    x_bar = fdt_x(gj0) + fdt_y(gj1) + fdt_z(gj2)."""
    D = gj_ref.shape[2]
    dt = out_ref.dtype

    def body(d, _):
        g0 = gj_ref[0, 0, d, :, :].astype(jnp.float32)
        g1 = gj_ref[0, 1, d, :, :].astype(jnp.float32)
        out_ref[0, 0, d, :, :] = (
            _fdt(g0, 1) + _fdt(g1, 0) + _fdt_z(gj_ref, 2, d, D)).astype(dt)
        return 0

    jax.lax.fori_loop(0, D, body, 0)


def _jacobian3d_bwd(gj: jnp.ndarray) -> jnp.ndarray:
    """gj [B,D,H,W,9] (vorticity cotangent already folded in) -> x_bar
    [B,D,H,W,3]."""
    b, d, h, w, _ = gj.shape
    out = pl.pallas_call(
        _jacobian3d_bwd_kernel,
        grid=(b, 3),
        in_specs=[pl.BlockSpec((1, 3, d, h, w), lambda i, c: (i, c, 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 1, d, h, w), lambda i, c: (i, c, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, 3, d, h, w), gj.dtype),
        interpret=_interpret(),
    )(jnp.moveaxis(gj, -1, 1))
    return jnp.moveaxis(out, 1, -1)


@jax.custom_vjp
def jacobian3d_p(x: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Differentiable :func:`jacobian3d_fused` (5D input)."""
    _check_min3(x, 3, "jacobian3d_p")
    return jacobian3d_fused(x)


def _jacobian3d_p_fwd(x):
    _check_min3(x, 3, "jacobian3d_p")
    return jacobian3d_fused(x), None


def _jacobian3d_p_bwd(_, g):
    gj, gv = g
    # vort is linear in J (rows 7-5, 2-6, 3-1); fold its cotangent into gj.
    gj = (gj
          .at[..., 7].add(gv[..., 0]).at[..., 5].add(-gv[..., 0])
          .at[..., 2].add(gv[..., 1]).at[..., 6].add(-gv[..., 1])
          .at[..., 3].add(gv[..., 2]).at[..., 1].add(-gv[..., 2]))
    return (_jacobian3d_bwd(gj),)


jacobian3d_p.defvjp(_jacobian3d_p_fwd, _jacobian3d_p_bwd)
