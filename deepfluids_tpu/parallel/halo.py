"""Spatially-sharded finite-difference stencils with halo exchange.

SURVEY.md §2's parallelism table maps the reference's (absent) sequence/
context parallelism to **spatial sharding of grids with halo exchange over
ICI** — the capability that matters once fields outgrow one chip's HBM
(large 3D grids), even though the reference resolutions don't need it.

Scheme: the grid's H (y) axis is sharded over the mesh's data axis.  The
forward difference ``d[i] = x[i+1] - x[i]`` needs each shard's successor's
FIRST row — one `ppermute` neighbor shift per field (a single ICI hop on a
ring).  The global last row keeps the oracle's edge replication.  Everything
is `shard_map`-ped, so XLA overlaps the halo transfer with local compute.

The jnp oracle (`ops.fd`) remains the semantic reference: for any
replicated input, gathering the sharded result must equal the oracle's
(pinned by tests/test_parallel.py on the 8-device CPU mesh).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from deepfluids_tpu.parallel.mesh import DATA_AXIS


def _neighbor_first_row(x_local: jnp.ndarray, axis_name: str) -> jnp.ndarray:
    """Successor shard's first H-row (wraps at the ring end; caller fixes
    the global edge).  x_local: [B, H_loc, W, C] -> [B, 1, W, C]."""
    n = jax.lax.axis_size(axis_name)
    first = x_local[:, :1]
    return jax.lax.ppermute(first, axis_name,
                            [(i, (i - 1) % n) for i in range(n)])


def _fdiff_h_sharded(x_local: jnp.ndarray, axis_name: str) -> jnp.ndarray:
    """Forward diff along sharded H with edge replication at the global end."""
    idx = jax.lax.axis_index(axis_name)
    n = jax.lax.axis_size(axis_name)
    nxt = _neighbor_first_row(x_local, axis_name)
    ext = jnp.concatenate([x_local, nxt], axis=1)       # [B, H_loc+1, W, C]
    d = ext[:, 1:] - ext[:, :-1]                        # [B, H_loc, W, C]
    # Global last row (last shard's last local row): replicate previous diff.
    h_loc = x_local.shape[1]
    row = jax.lax.broadcasted_iota(jnp.int32, d.shape, 1)
    is_global_last = (idx == n - 1) & (row == h_loc - 1)
    prev = jnp.roll(d, 1, axis=1)                       # row h-2's diff at row h-1
    return jnp.where(is_global_last, prev, d)


def _fdiff_w(x_local: jnp.ndarray) -> jnp.ndarray:
    """Forward diff along (unsharded) W with edge replication."""
    d = x_local[:, :, 1:] - x_local[:, :, :-1]
    return jnp.concatenate([d, d[:, :, -1:]], axis=2)


def _specs(mesh: Mesh):
    return P(None, DATA_AXIS), NamedSharding(mesh, P(None, DATA_AXIS))


def curl2d_sharded(psi: jnp.ndarray, mesh: Mesh) -> jnp.ndarray:
    """H-sharded :func:`deepfluids_tpu.ops.fd.curl2d`.

    Args:
      psi: ``[B, H, W, 1]`` with H divisible by the data-axis size.
    Returns:
      ``[B, H, W, 2]`` velocity, sharded the same way.
    """
    spec, _ = _specs(mesh)

    def f(p):
        u = _fdiff_h_sharded(p[..., 0:1], DATA_AXIS)
        v = -_fdiff_w(p[..., 0:1])
        return jnp.concatenate([u, v], axis=-1)

    return shard_map(f, mesh=mesh, in_specs=(spec,), out_specs=spec)(psi)


def jacobian2d_sharded(x: jnp.ndarray, mesh: Mesh
                       ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """H-sharded :func:`deepfluids_tpu.ops.fd.jacobian2d` ([B,H,W,2] input)."""
    spec, _ = _specs(mesh)

    def f(v):
        dudx = _fdiff_w(v[..., 0:1])
        dudy = _fdiff_h_sharded(v[..., 0:1], DATA_AXIS)
        dvdx = _fdiff_w(v[..., 1:2])
        dvdy = _fdiff_h_sharded(v[..., 1:2], DATA_AXIS)
        j = jnp.concatenate([dudx, dudy, dvdx, dvdy], axis=-1)
        w = dvdx - dudy
        return j, w

    return shard_map(f, mesh=mesh, in_specs=(spec,),
                     out_specs=(spec, spec))(x)


def divergence2d_sharded(x: jnp.ndarray, mesh: Mesh) -> jnp.ndarray:
    """H-sharded forward-difference divergence (matched to curl2d_sharded)."""
    spec, _ = _specs(mesh)

    def f(v):
        return (_fdiff_w(v[..., 0:1])
                + _fdiff_h_sharded(v[..., 1:2], DATA_AXIS))

    return shard_map(f, mesh=mesh, in_specs=(spec,), out_specs=spec)(x)


# ---------------------------------------------------------------------------
# 3D: depth-sharded stencils (SURVEY.md §7 "3D halo exchange over ICI for
# sharded 112x64x32 grids").  D (z) is the sharded axis — one ppermute halo
# slice per z-derivative; in-plane derivatives stay local.
# ---------------------------------------------------------------------------


def _fdiff_d_sharded(x_local: jnp.ndarray, axis_name: str) -> jnp.ndarray:
    """Forward diff along sharded D of [B, D_loc, H, W, C], edge-replicated
    at the global end (same scheme as _fdiff_h_sharded)."""
    idx = jax.lax.axis_index(axis_name)
    n = jax.lax.axis_size(axis_name)
    first = x_local[:, :1]
    nxt = jax.lax.ppermute(first, axis_name,
                           [(i, (i - 1) % n) for i in range(n)])
    ext = jnp.concatenate([x_local, nxt], axis=1)
    d = ext[:, 1:] - ext[:, :-1]
    d_loc = x_local.shape[1]
    row = jax.lax.broadcasted_iota(jnp.int32, d.shape, 1)
    is_global_last = (idx == n - 1) & (row == d_loc - 1)
    prev = jnp.roll(d, 1, axis=1)
    return jnp.where(is_global_last, prev, d)


def _fdiff_local(x: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Edge-replicated forward diff along an UNSHARDED axis."""
    d = jnp.diff(x, axis=axis)
    idx = [slice(None)] * x.ndim
    idx[axis] = slice(-1, None)
    return jnp.concatenate([d, d[tuple(idx)]], axis=axis)


def curl3d_sharded(psi: jnp.ndarray, mesh: Mesh) -> jnp.ndarray:
    """D-sharded :func:`deepfluids_tpu.ops.fd.curl3d`.

    Args:
      psi: ``[B, D, H, W, 3]`` with D divisible by the data-axis size.
    Returns:
      ``[B, D, H, W, 3]`` velocity, sharded the same way.
    """
    spec = P(None, DATA_AXIS)

    def f(p):
        a, b, c = p[..., 0:1], p[..., 1:2], p[..., 2:3]
        dady = _fdiff_local(a, 2)
        dadz = _fdiff_d_sharded(a, DATA_AXIS)
        dbdx = _fdiff_local(b, 3)
        dbdz = _fdiff_d_sharded(b, DATA_AXIS)
        dcdx = _fdiff_local(c, 3)
        dcdy = _fdiff_local(c, 2)
        return jnp.concatenate(
            [dcdy - dbdz, dadz - dcdx, dbdx - dady], axis=-1)

    return shard_map(f, mesh=mesh, in_specs=(spec,), out_specs=spec)(psi)


def divergence3d_sharded(x: jnp.ndarray, mesh: Mesh) -> jnp.ndarray:
    """D-sharded forward-difference divergence (matched to curl3d_sharded)."""
    spec = P(None, DATA_AXIS)

    def f(v):
        return (_fdiff_local(v[..., 0:1], 3)
                + _fdiff_local(v[..., 1:2], 2)
                + _fdiff_d_sharded(v[..., 2:3], DATA_AXIS))

    return shard_map(f, mesh=mesh, in_specs=(spec,), out_specs=spec)(x)
