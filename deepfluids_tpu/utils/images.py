"""Field visualization: vorticity/magnitude PNGs, montages, GIFs.

Reference: deep-fluids ``util.py`` ``save_image`` + trainer test dumps
(SURVEY.md §2 "Util", L5 visualization layer [M]) — velocity fields rendered
as vorticity (diverging colormap) or magnitude images, tiled into grids
during training, assembled into GIFs for parameter/time sweeps.

Colorization is pure numpy (no matplotlib dependency in the hot path);
PIL writes PNGs, imageio assembles GIFs.
"""

from __future__ import annotations

import os
from typing import Sequence

import numpy as np

from deepfluids_tpu.ops import fd


def _colorize_diverging(x: np.ndarray, vmax: float | None = None) -> np.ndarray:
    """Signed scalar [H, W] -> uint8 RGB, blue-white-red diverging map."""
    vmax = vmax or (np.abs(x).max() + 1e-8)
    t = np.clip(x / vmax, -1.0, 1.0)
    r = np.where(t >= 0, 1.0, 1.0 + t)
    g = 1.0 - np.abs(t)
    b = np.where(t <= 0, 1.0, 1.0 - t)
    return (np.stack([r, g, b], axis=-1) * 255).astype(np.uint8)


def _colorize_magnitude(x: np.ndarray, vmax: float | None = None) -> np.ndarray:
    """Nonnegative scalar [H, W] -> uint8 RGB, black-body-style ramp."""
    vmax = vmax or (x.max() + 1e-8)
    t = np.clip(x / vmax, 0.0, 1.0)
    r = np.clip(3.0 * t, 0, 1)
    g = np.clip(3.0 * t - 1.0, 0, 1)
    b = np.clip(3.0 * t - 2.0, 0, 1)
    return (np.stack([r, g, b], axis=-1) * 255).astype(np.uint8)


def _np_fdiff(x: np.ndarray, axis: int) -> np.ndarray:
    """numpy twin of ops.fd._fdiff (forward diff, last-derivative edge
    replication) — bit-identical values with zero device dispatches, so
    threaded artifact writers never serialize on the runtime RPC channel."""
    d = np.diff(x, axis=axis)
    idx = [slice(None)] * x.ndim
    idx[axis] = slice(-1, None)
    return np.concatenate([d, d[tuple(idx)]], axis=axis)


def _np_vorticity2d(field: np.ndarray) -> np.ndarray:
    """dvdx - dudy of [H, W, 2] (matches ops.fd.vorticity2d exactly)."""
    return (_np_fdiff(field[..., 1], axis=-1)
            - _np_fdiff(field[..., 0], axis=-2))


def _render_scalar(field: np.ndarray, mode: str,
                   projection: str) -> tuple[np.ndarray, bool]:
    """The 2D scalar a field renders as, pre-colorization.

    Returns (scalar [H, W], diverging?) — diverging scalars colorize
    blue-white-red by |max|, magnitudes black-body by max.  Shared by
    :func:`field_to_image` and :func:`save_gif`'s global-scale pass so
    ``vmax`` always lives in the RENDERED quantity's units.
    """
    field = np.asarray(field, np.float32)
    if field.ndim == 4:  # 3D volume -> 2D plane
        if projection == "max":
            if mode == "vorticity" and field.shape[-1] == 3:
                # |vorticity| per voxel, max over depth; signed look kept
                # by projecting the in-plane component with largest |w|.
                vort = np.asarray(fd.vorticity3d(field[None])[0])
                wmag = np.linalg.norm(vort, axis=-1)     # [D, H, W]
                d_idx = wmag.argmax(axis=0)              # [H, W]
                hh, ww = np.indices(d_idx.shape)
                return vort[..., 2][d_idx, hh, ww], True
            return np.linalg.norm(field, axis=-1).max(axis=0), False
        field = field[field.shape[0] // 2]  # mid-depth slice
    if mode == "vorticity" and field.shape[-1] >= 2:
        return _np_vorticity2d(field[..., :2]), True
    if mode == "magnitude":
        return np.linalg.norm(field, axis=-1), False
    return field[..., 0], True  # levelset / generic scalar


def field_to_image(field: np.ndarray, mode: str = "vorticity",
                   vmax: float | None = None,
                   projection: str = "slice") -> np.ndarray:
    """Render one field to an RGB uint8 image (origin flipped so +y is up).

    Args:
      field: [H, W, C] (2D) or [D, H, W, C] (3D).
      mode: "vorticity" | "magnitude" | "levelset" | "scalar".
      projection: 3D-to-2D reduction — "slice" (mid-depth plane, the
        cheap default) or "max" (volume rendering via maximum-intensity
        projection of |vorticity| / magnitude along depth — the qualitative
        3D render surface the reference's paper figures used).
    """
    scalar, diverging = _render_scalar(field, mode, projection)
    img = (_colorize_diverging(scalar, vmax) if diverging
           else _colorize_magnitude(scalar, vmax))
    return img[::-1]  # flip y so the plume rises upward in the PNG


def save_field_image(path: str, field: np.ndarray, mode: str = "vorticity",
                     vmax: float | None = None,
                     projection: str = "slice") -> str:
    from PIL import Image

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    Image.fromarray(field_to_image(field, mode, vmax, projection)).save(path)
    return path


def save_image_grid(path: str, fields: Sequence[np.ndarray], ncol: int = 0,
                    mode: str = "vorticity", vmax: float | None = None,
                    projection: str = "slice") -> str:
    """Tile several fields into one PNG montage (reference save_image)."""
    from PIL import Image

    imgs = [field_to_image(f, mode, vmax, projection) for f in fields]
    n = len(imgs)
    ncol = ncol or int(np.ceil(np.sqrt(n)))
    nrow = int(np.ceil(n / ncol))
    h, w, _ = imgs[0].shape
    grid = np.zeros((nrow * h, ncol * w, 3), np.uint8)
    for i, im in enumerate(imgs):
        r, c = divmod(i, ncol)
        grid[r * h:(r + 1) * h, c * w:(c + 1) * w] = im
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    Image.fromarray(grid).save(path)
    return path


def save_gif(path: str, fields: Sequence[np.ndarray], mode: str = "vorticity",
             vmax: float | None = None, fps: int = 24,
             projection: str = "slice") -> str:
    """Assemble a field sequence into a GIF (reference test-time sweeps).

    ``vmax=None`` computes ONE shared scale over the whole sequence —
    per-frame auto-normalization would recenter the colors every frame
    (a decaying plume renders at constant full saturation and the
    temporal evolution the GIF exists to show is erased)."""
    import imageio

    if vmax is None:
        vmax = max((float(np.abs(_render_scalar(f, mode, projection)[0])
                          .max()) for f in fields), default=0.0) or None
    frames = [field_to_image(f, mode, vmax, projection) for f in fields]
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    imageio.mimsave(path, frames, duration=1.0 / fps, loop=0)
    return path
