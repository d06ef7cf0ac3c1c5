"""Optimizer, LR schedule, and TrainState construction.

Reference: deep-fluids ``trainer.py`` optimizer setup (SURVEY.md §2
"Trainer" [M][B]) — Adam with cosine LR decay

    lr(s) = lr_min + 0.5 · (lr_max − lr_min) · (1 + cos(π · s / S))

rebuilt on optax.  The TrainState is the standard Flax functional train
state (params + opt state + step), which pjit shards transparently.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax
from flax.training import train_state


class TrainState(train_state.TrainState):
    """Flax TrainState; `lr_fn` rides along for logging (static, non-pytree)."""


def cosine_lr_schedule(lr_max: float, lr_min: float,
                       max_step: int) -> optax.Schedule:
    """The reference's cosine decay (SURVEY.md §2), exact formula."""

    def schedule(step):
        s = jnp.minimum(step, max_step).astype(jnp.float32)
        return lr_min + 0.5 * (lr_max - lr_min) * (
            1.0 + jnp.cos(jnp.pi * s / max_step)
        )

    return schedule


def make_optimizer(lr_max: float = 1e-4, lr_min: float = 2.5e-6,
                   max_step: int = 100_000, beta1: float = 0.5,
                   beta2: float = 0.999,
                   grad_clip: float = 0.0) -> optax.GradientTransformation:
    """Adam + cosine decay; beta1=0.5 per the reference's BEGAN-style setup.

    ``grad_clip`` > 0 prepends global-norm clipping: long high-lr schedules
    on the full 3D dataset showed rare loss spikes (0.02 -> 17 at ~6k
    steps, bf16 conv compute) that cost thousands of steps to recover;
    clipping bounds the damage without changing steady-state dynamics.
    """
    adam = optax.adam(
        learning_rate=cosine_lr_schedule(lr_max, lr_min, max_step),
        b1=beta1, b2=beta2,
    )
    if grad_clip and grad_clip > 0:
        return optax.chain(optax.clip_by_global_norm(grad_clip), adam)
    return adam


def create_train_state(
    rng: jax.Array,
    model,
    example_inputs: tuple,
    tx: optax.GradientTransformation,
) -> TrainState:
    """Initialize params and wrap them with the optimizer into a TrainState."""
    params = model.init(rng, *example_inputs)["params"]
    return TrainState.create(apply_fn=model.apply, params=params, tx=tx)


def param_count(params: Any) -> int:
    return sum(p.size for p in jax.tree_util.tree_leaves(params))
