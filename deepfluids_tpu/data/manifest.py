"""Dataset manifest — the ``args.txt`` contract.

The reference's data generator (mantaflow scene scripts) writes a
``data/<name>/args.txt`` manifest describing parameter names/ranges, scene and
frame counts, grid geometry, and the global velocity range used for [-1, 1]
normalization; the batch manager parses it (SURVEY.md §2 "Batch manager",
§3.5 [M][B]).  This module defines our (JSON) schema for the same role.

On-disk layout (kept from the reference):

    data/<name>/
      args.txt            # JSON manifest (this module)
      v/                  # one .npz per frame:  keys: x = field [H, W, C]
        <s0>_<s1>_..._<frame>.npz   #            y = raw param vector
      d/                  # (optional) density fields, same naming
      code<z_num>/        # (written after AE training) latent sequences:
        <scene>.npz       # keys: z = [T, z_num], p = [T, num_param] (raw)

Parameters follow the reference convention: the LAST parameter is frame time
(e.g. smoke_pos21_size5 has p = [src_x_pos, src_radius, frame]).
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Sequence


@dataclasses.dataclass
class Manifest:
    """Schema of ``args.txt``.

    Attributes:
      param_names: names of the simulation parameters; last one is frame time.
      param_ranges: [min, max] per parameter (raw units).
      num_scenes: number of distinct scenes (product of non-time param counts).
      num_frames: frames per scene.
      resolution: grid dims, (H, W) for 2D or (D, H, W) for 3D.
      num_channels: field channels (2 for 2D velocity, 3 for 3D, 1 levelset).
      v_range: [min, max] over all field values — normalization range.
      data_type: "velocity" or "levelset".
      param_counts: grid size per non-frame parameter axis (e.g. [21, 5]) —
        the sweep grid the dataset was generated on; None for datasets
        without a regular grid (smoke_mov) or manifests written before the
        field existed.
    """

    param_names: list[str]
    param_ranges: list[list[float]]
    num_scenes: int
    num_frames: int
    resolution: list[int]
    num_channels: int
    v_range: list[float]
    data_type: str = "velocity"
    param_counts: list[int] | None = None

    @property
    def num_param(self) -> int:
        return len(self.param_names)

    @property
    def is_3d(self) -> bool:
        return len(self.resolution) == 3

    @property
    def field_shape(self) -> tuple[int, ...]:
        return tuple(self.resolution) + (self.num_channels,)

    @property
    def v_scale(self) -> float:
        """Scale that maps fields into [-1, 1]: max absolute field value."""
        return max(abs(self.v_range[0]), abs(self.v_range[1])) or 1.0

    def normalize_field(self, x):
        return x / self.v_scale

    def denormalize_field(self, x):
        return x * self.v_scale

    def normalize_params(self, p):
        """Raw params -> [-1, 1] per the reference's convention."""
        import numpy as np

        lo = np.asarray([r[0] for r in self.param_ranges], dtype=np.float32)
        hi = np.asarray([r[1] for r in self.param_ranges], dtype=np.float32)
        span = np.where(hi > lo, hi - lo, 1.0)
        return (np.asarray(p, dtype=np.float32) - lo) / span * 2.0 - 1.0

    def denormalize_params(self, p):
        import numpy as np

        lo = np.asarray([r[0] for r in self.param_ranges], dtype=np.float32)
        hi = np.asarray([r[1] for r in self.param_ranges], dtype=np.float32)
        span = np.where(hi > lo, hi - lo, 1.0)
        return (np.asarray(p, dtype=np.float32) + 1.0) / 2.0 * span + lo


def save_manifest(m: Manifest, dataset_dir: str) -> str:
    os.makedirs(dataset_dir, exist_ok=True)
    path = os.path.join(dataset_dir, "args.txt")
    with open(path, "w") as f:
        json.dump(dataclasses.asdict(m), f, indent=2)
    return path


def load_manifest(dataset_dir: str) -> Manifest:
    path = os.path.join(dataset_dir, "args.txt")
    with open(path) as f:
        d = json.load(f)
    return Manifest(**d)
