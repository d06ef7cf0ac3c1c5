"""Encoder + Autoencoder (arch "ae").

Reference: deep-fluids ``model.py`` encoder + AE wiring (SURVEY.md §2, §3.3
[M][B]): a stride-2 conv encoder mirroring the generator compresses a field to
a latent code ``z``; the FIRST ``num_param`` dims of ``z`` are supervised to
equal the (normalized) simulation parameters, making the latent steerable; the
decoder is the GeneratorBE body emitting a stream function / vector potential
whose curl reconstructs the velocity.

Latent layout convention (used by the latent integrator, SURVEY.md §3.4):
    z = [ p_hat (num_param dims, supervised) ; z_free (z_num - num_param) ]
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from deepfluids_tpu.models.generator import (GeneratorBE, default_repeat,
                                             spatial_constraint)


class Encoder(nn.Module):
    """Velocity/levelset field -> latent code z.

    Mirror of :class:`GeneratorBE`: ``repeat`` stages of {num_conv 3x3 convs
    (lrelu) + skip} with stride-2 conv downsampling between stages, then a
    dense head to ``z_num``.
    """

    z_num: int = 16
    filters: int = 128
    num_conv: int = 4
    repeat: int = 0
    act_slope: float = 0.2
    dtype: jnp.dtype = jnp.float32
    spatial_mesh: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        spatial = x.shape[1:-1]
        rep = self.repeat or default_repeat(tuple(spatial) + (0,))
        ndim = len(spatial)
        kernel = (3,) * ndim
        act = lambda v: nn.leaky_relu(v, negative_slope=self.act_slope)

        h = nn.Conv(self.filters, kernel, dtype=self.dtype,
                    name="conv_in")(x.astype(self.dtype))
        h = spatial_constraint(h, self.spatial_mesh)
        h0 = h
        for stage in range(rep):
            for c in range(self.num_conv):
                h = act(nn.Conv(self.filters, kernel, dtype=self.dtype,
                                name=f"conv_{stage}_{c}")(h))
                h = spatial_constraint(h, self.spatial_mesh)
            h = h + h0
            if stage < rep - 1:
                h = act(nn.Conv(self.filters, kernel, strides=(2,) * ndim,
                                dtype=self.dtype, name=f"down_{stage}")(h))
                h = spatial_constraint(h, self.spatial_mesh)
                h0 = h
        h = h.reshape((h.shape[0], -1))
        z = nn.Dense(self.z_num, dtype=self.dtype, name="fc_out")(h)
        return z.astype(jnp.float32)


class Autoencoder(nn.Module):
    """Encoder + GeneratorBE decoder; returns (psi_hat, z).

    The caller applies curl to psi_hat (same contract as the generator) and
    supervises ``z[:, :num_param]`` against the sim parameters.
    """

    output_shape: tuple[int, ...] = (128, 96, 1)
    z_num: int = 16
    filters: int = 128
    num_conv: int = 4
    repeat: int = 0
    act_slope: float = 0.2
    dtype: jnp.dtype = jnp.float32
    spatial_mesh: Any = None

    def setup(self):
        self.encoder = Encoder(
            z_num=self.z_num, filters=self.filters, num_conv=self.num_conv,
            repeat=self.repeat, act_slope=self.act_slope, dtype=self.dtype,
            spatial_mesh=self.spatial_mesh,
        )
        self.decoder = GeneratorBE(
            output_shape=self.output_shape, filters=self.filters,
            num_conv=self.num_conv, repeat=self.repeat,
            act_slope=self.act_slope, dtype=self.dtype,
            spatial_mesh=self.spatial_mesh,
        )

    def __call__(self, x: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
        z = self.encoder(x)
        psi = self.decoder(z)
        return psi, z

    def encode(self, x: jnp.ndarray) -> jnp.ndarray:
        return self.encoder(x)

    def decode(self, z: jnp.ndarray) -> jnp.ndarray:
        return self.decoder(z)
