"""Loss functions for all three archs (de / ae / nn).

Reference: deep-fluids ``trainer.py`` loss wiring (SURVEY.md §3.1/3.3/3.4
[M][B]):

  de:  G = curl(psi);        loss = w1·L1(G, x) + w2·L1(J(G), J(x))
  ae:  x̂ = curl(dec(enc x)); loss = w1·L1(x̂,x) + w2·L1(∇x̂,∇x) + w3·L2(z_p, y)
  nn:  ẑ advanced w steps;    loss = mean_t L2(ẑ_t, z_t)

The jacobian term uses the same forward-difference scheme as the curl
(:mod:`deepfluids_tpu.ops.fd`), so the gradient penalty and the
divergence-free construction share one discretization.  For scalar (levelset)
fields — the liquid configs, where no curl applies — the "jacobian" term is
the L1 distance of the spatial gradient of the scalar field.

All functions are pure, statically shaped, and dispatch 2D vs 3D on rank
(4D = [B,H,W,C], 5D = [B,D,H,W,C]).
"""

from __future__ import annotations

import jax.numpy as jnp

from deepfluids_tpu.ops import fd, pallas_fd


def l1(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jnp.abs(a - b))


def l2(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jnp.square(a - b))


def _grad_scalar(x: jnp.ndarray) -> jnp.ndarray:
    """Spatial gradient of a scalar field [B, *spatial, 1] -> [B, *spatial, nd]."""
    s = x[..., 0]
    nd = x.ndim - 2
    comps = [fd._fdiff(s, axis=-(k + 1)) for k in range(nd)]  # x, y[, z]
    return jnp.stack(comps, axis=-1)


def jacobian_of(x: jnp.ndarray, fused: bool | None = None) -> jnp.ndarray:
    """Full first-derivative stack of a field; dispatches on rank/channels.

    [B,H,W,2] -> [B,H,W,4]; [B,D,H,W,3] -> [B,D,H,W,9]; scalar [...,1] ->
    spatial gradient.  ``fused`` selects the Pallas custom-VJP stencils
    (bit-identical to the oracle in f32); default = on-TPU.  Callers inside
    a MULTI-CHIP sharded computation must pass fused=False — pallas_call
    has no GSPMD partitioning rule, so XLA would all-gather the batch and
    run the stencil replicated (the Trainer handles this automatically).
    """
    if fused is None:
        fused = pallas_fd.use_pallas()
    if x.shape[-1] == 1:
        return _grad_scalar(x)
    if x.ndim == 4:
        if fused:
            j, _ = pallas_fd.jacobian2d_p(x)
        else:
            j, _ = fd.jacobian2d(x)
        return j
    if x.ndim == 5:
        if fused:
            j, _ = pallas_fd.jacobian3d_p(x)
        else:
            j, _ = fd.jacobian3d(x)
        return j
    raise ValueError(f"unsupported field shape {x.shape}")


def field_loss(pred: jnp.ndarray, target: jnp.ndarray,
               w1: float, w2: float,
               fused: bool | None = None) -> tuple[jnp.ndarray, dict]:
    """w1·L1(field) + w2·L1(jacobian) — the core reconstruction loss."""
    loss_f = l1(pred, target)
    loss_j = l1(jacobian_of(pred, fused), jacobian_of(target, fused))
    return w1 * loss_f + w2 * loss_j, {"loss_field": loss_f, "loss_jac": loss_j}


def apply_curl(out: jnp.ndarray, fused: bool | None = None) -> jnp.ndarray:
    """psi/Psi -> velocity via the matched curl; dispatches on rank.
    ``fused`` selects the Pallas custom-VJP stencils (see jacobian_of for
    the multi-chip caveat); default = on-TPU."""
    if fused is None:
        fused = pallas_fd.use_pallas()
    if out.ndim == 4:
        return pallas_fd.curl2d_p(out) if fused else fd.curl2d(out)
    if out.ndim == 5:
        return pallas_fd.curl3d_p(out) if fused else fd.curl3d(out)
    raise ValueError(f"unsupported potential shape {out.shape}")


def generator_loss(net_out: jnp.ndarray, x: jnp.ndarray, use_curl: bool,
                   w1: float, w2: float,
                   fused: bool | None = None) -> tuple[jnp.ndarray, dict]:
    """Arch "de" loss.  net_out is psi (use_curl) or the field directly."""
    pred = apply_curl(net_out, fused) if use_curl else net_out
    loss, aux = field_loss(pred, x, w1, w2, fused)
    aux["pred"] = pred
    return loss, aux


def autoencoder_loss(net_out: jnp.ndarray, z: jnp.ndarray, x: jnp.ndarray,
                     y: jnp.ndarray, use_curl: bool, num_param: int,
                     w1: float, w2: float, w3: float,
                     fused: bool | None = None) -> tuple[jnp.ndarray, dict]:
    """Arch "ae" loss: reconstruction + latent-parameter supervision.

    z[:, :num_param] is driven to equal the normalized sim params y so the
    latent space is steerable (SURVEY.md §3.3).
    """
    pred = apply_curl(net_out, fused) if use_curl else net_out
    rec, aux = field_loss(pred, x, w1, w2, fused)
    loss_p = l2(z[:, :num_param], y[:, :num_param])
    aux.update({"loss_param": loss_p, "pred": pred})
    return rec + w3 * loss_p, aux


def latent_window_loss(z_pred: jnp.ndarray, z_true: jnp.ndarray,
                       num_param: int) -> tuple[jnp.ndarray, dict]:
    """Arch "nn" loss over a rollout window.

    Args:
      z_pred/z_true: [W, B, z_num] latent trajectories (step 0 identical by
        construction).  Only the free block is integrated, but the loss spans
        the full code as in the reference (the param block matches exactly).
    """
    loss = l2(z_pred[1:], z_true[1:])
    return loss, {"loss_z": loss}
