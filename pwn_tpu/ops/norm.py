"""Normalization variants (reference `modules.py::normalize` [R],
SURVEY.md §2a "normalization (instance/weight norm variants)").

The reference exposed instance-norm and weight-norm wrappers around its
convs; the MoL teacher/IAF student here train fine without them, but they
are part of the reference's op surface, so both are provided:

* `instance_norm` — per-(batch, channel) normalization over time.
* `weight_norm` — reparameterize a conv kernel as g * v / ||v|| (per
  output channel); `WeightNormConv1d` is a drop-in causal conv module
  using it (params: v (K, Cin, Cout), g (Cout,)).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from pwn_tpu.ops.conv import causal_conv1d

_conv_init = jax.nn.initializers.variance_scaling(
    1.0, "fan_in", "truncated_normal", in_axis=(0, 1), out_axis=2
)


def instance_norm(
    x: jax.Array,
    gamma: jax.Array | None = None,
    beta: jax.Array | None = None,
    eps: float = 1e-5,
    axis: int = 1,
) -> jax.Array:
    """Normalize (B, T, C) over the time axis per batch/channel."""
    mean = jnp.mean(x, axis=axis, keepdims=True)
    var = jnp.var(x, axis=axis, keepdims=True)
    out = (x - mean) * jax.lax.rsqrt(var + eps)
    if gamma is not None:
        out = out * gamma
    if beta is not None:
        out = out + beta
    return out


def weight_norm(v: jax.Array, g: jax.Array, eps: float = 1e-8) -> jax.Array:
    """Kernel (K, Cin, Cout) = g * v / ||v||_{K,Cin} per output channel."""
    norm = jnp.sqrt(jnp.sum(jnp.square(v), axis=(0, 1), keepdims=True))
    return v * (g / jnp.maximum(norm, eps))


class WeightNormConv1d(nn.Module):
    """Causal dilated conv with weight-normalized kernel."""

    features: int
    kernel_size: int = 1
    dilation: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        v = self.param(
            "v", _conv_init, (self.kernel_size, x.shape[-1], self.features)
        )
        # init g to ||v|| — of the ACTUAL v just created (closing over
        # it), not a fresh draw with g's own RNG fold — so the initial
        # effective kernel v*g/||v|| equals v EXACTLY and the function
        # matches a plain conv at init
        g = self.param(
            "g",
            lambda key, shape: jnp.sqrt(
                jnp.sum(jnp.square(v), axis=(0, 1))
            ),
            (self.features,),
        )
        b = self.param("bias", jax.nn.initializers.zeros, (self.features,))
        kernel = weight_norm(v, g)
        return causal_conv1d(
            x.astype(self.dtype),
            kernel.astype(self.dtype),
            self.dilation,
            b.astype(self.dtype),
        )


class InstanceNorm(nn.Module):
    """Learnable instance norm over time for (B, T, C)."""

    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        c = x.shape[-1]
        gamma = self.param("gamma", jax.nn.initializers.ones, (c,))
        beta = self.param("beta", jax.nn.initializers.zeros, (c,))
        return instance_norm(x, gamma, beta, self.eps)
