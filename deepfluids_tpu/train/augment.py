"""Training-time x-mirror augmentation (beyond-reference quality lever).

Every scene family in datagen/ is statistically symmetric under a mirror
across the x (width) axis: gravity/buoyancy act along y, sources are
either x-centered (smoke3's bottom-center inflow) or placed by an x
position parameter whose sampling range is itself symmetric about the
domain center (src_x_pos/drop_x_pos in [0.2,0.8] / [0.25,0.75]).  So the
mirror of a dataset frame is another equally-likely frame, with

  * the u channel (x velocity, channel 0 — CLAUDE.md field conventions)
    negated, other channels (v[, w], levelsets) unchanged;
  * any ``*_x_pos`` parameter reflected, which in the [-1, 1]-normalized
    parameter space is a sign flip (valid exactly when the raw range is
    symmetric about the 0.5 domain center — validated here);
  * all other parameters (sizes, rates, frame index) unchanged.

Mirroring a random half of each training batch therefore doubles the
effective scene variety for free — aimed at the scene-generalization gap
the round-4 holdout rescores measured (cfg4 AE: train 0.093 vs holdout
0.291 on novel source trajectories).

Holdout caveat (leakage): for a GRID-sampled x-position family
(manifest.param_counts set — liquid_pos10_size4, smoke_pos21_size5) the
solver is deterministic and x-symmetric, so the mirror of the training
scene at position p IS (bit-noise aside) the dataset's scene at 1-p.  If
the reflected position lands on a held-out scene, augmentation feeds the
holdout's physics into training and the holdout stops measuring
generalization.  Scene families whose per-scene variation is randomly
sampled (smoke_mov's random source walks) don't collide this way.  The
trainer warns on the grid + holdout combination.

The flip mask is a pure function of (seed, global step), so augmented
runs keep the exact-resume contract (data.dataset.step_rng).  Everything
is shape-static and in-graph: one lax.rev + two selects, fused by XLA
into the batch gather.  The W axis is never device-sharded (DP shards
batch; --spatial_shard shards H/D), so the flip needs no collectives.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def flip_signs(manifest) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(channel_signs [C], param_signs [P]) of the x-mirror symmetry.

    Raises if a ``*_x_pos`` parameter's range is not symmetric about the
    0.5 domain center (then the reflected parameter would leave the
    sampled range and the mirrored pair (field, params) would be
    inconsistent with the dataset's own normalization).
    """
    chan = np.ones(manifest.num_channels, np.float32)
    if manifest.data_type == "velocity" and manifest.num_channels > 1:
        chan[0] = -1.0  # u = x component
    psign = np.ones(manifest.num_param, np.float32)
    for i, (name, (lo, hi)) in enumerate(
            zip(manifest.param_names, manifest.param_ranges)):
        if name.endswith("x_pos"):
            if abs((lo + hi) - 1.0) > 1e-6:
                raise ValueError(
                    f"--augment_flip_x: param {name!r} range [{lo}, {hi}] "
                    "is not symmetric about the 0.5 domain center; the "
                    "x-mirror is not a symmetry of this dataset")
            psign[i] = -1.0
    return jnp.asarray(chan), jnp.asarray(psign)


def flip_x_batch(x: jnp.ndarray, y: jnp.ndarray, rng: jax.Array,
                 chan_signs: jnp.ndarray,
                 param_signs: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Mirror a random half of the batch across x.

    x: [B, H, W, C] or [B, D, H, W, C] (W is always axis -2);
    y: [B, P] normalized params.
    """
    b = x.shape[0]
    mask = jax.random.bernoulli(rng, 0.5, (b,))
    xf = jnp.flip(x, axis=x.ndim - 2) * chan_signs
    yf = y * param_signs
    mf = mask.reshape((b,) + (1,) * (x.ndim - 1))
    return jnp.where(mf, xf, x), jnp.where(mask[:, None], yf, y)
