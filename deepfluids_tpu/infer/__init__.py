"""Inference: batched parameter sweeps, latent rollout, dataset encoding.

Reference parity target: ``Trainer.test()`` of byungsook/deep-fluids
(SURVEY.md §3.2/§3.4 [M][B]).  The reference looped the parameter grid at
batch 1 through sess.run; here sweeps are batched and jit-compiled (the [B]
north star: "inference batches across parameter sweeps"), and the latent
rollout is one `lax.scan` so whole trajectories stay on device.
"""

from deepfluids_tpu.infer.sweep import (
    param_grid,
    sweep_generator,
    sweep_on_device,
    run_test_sweep,
)
from deepfluids_tpu.infer.rollout import (
    encode_dataset,
    rollout_trajectory,
)
from deepfluids_tpu.infer.advect import (
    advect_density,
    render_density_sweep,
)

__all__ = [
    "param_grid",
    "sweep_generator",
    "sweep_on_device",
    "run_test_sweep",
    "encode_dataset",
    "rollout_trajectory",
    "advect_density",
    "render_density_sweep",
]
