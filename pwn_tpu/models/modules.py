"""Flax building blocks shared by teacher and student.

Reference parity: `modules.py` [R] (SURVEY.md §2a) — causal conv1d with
dilation, gated activation unit with conditioning, residual+skip block,
transposed-conv mel upsampler.  Rebuilt TPU-first:

* channels-last layout, K=2 convs as shifted matmuls (see ops/conv.py),
* params stored fp32, compute in a configurable dtype (bf16 on TPU),
  with the output head forced back to fp32 for the loss,
* stable module names (`front`, `layer_{i}`, `head1`, `head2`, ...) so the
  `lax.scan` fast-sampling path (models/sampling.py) can address the same
  parameter pytree without re-tracing module structure.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from pwn_tpu.ops.conv import causal_conv1d, conv_transpose1d, shift_right

_conv_kernel_init = jax.nn.initializers.variance_scaling(
    1.0, "fan_in", "truncated_normal", in_axis=(0, 1), out_axis=2
)


class CausalConv1d(nn.Module):
    """Causal dilated 1-D conv, kernel shape (K, Cin, Cout)."""

    features: int
    kernel_size: int = 1
    dilation: int = 1
    dtype: jnp.dtype = jnp.float32
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        kernel = self.param(
            "kernel",
            _conv_kernel_init,
            (self.kernel_size, x.shape[-1], self.features),
        )
        bias = (
            self.param("bias", jax.nn.initializers.zeros, (self.features,))
            if self.use_bias
            else None
        )
        x = x.astype(self.dtype)
        kernel = kernel.astype(self.dtype)
        bias = bias.astype(self.dtype) if bias is not None else None
        return causal_conv1d(x, kernel, self.dilation, bias)


class GatedResidualLayer(nn.Module):
    """One WaveNet layer: dilated conv -> conditioned gated unit ->
    residual + skip 1x1 projections.

        h  = W_dilated *_d x  +  W_cond * c
        z  = tanh(h_a) * sigmoid(h_b)
        out_residual = x + W_res z ;  out_skip = W_skip z
    """

    residual_channels: int
    gate_channels: int
    skip_channels: int
    kernel_size: int = 2
    dilation: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jax.Array, cond: jax.Array
    ) -> Tuple[jax.Array, jax.Array]:
        h = CausalConv1d(
            self.gate_channels,
            self.kernel_size,
            self.dilation,
            dtype=self.dtype,
            name="dilated",
        )(x)
        h = h + CausalConv1d(
            self.gate_channels, 1, dtype=self.dtype, name="cond"
        )(cond)
        a, b = jnp.split(h, 2, axis=-1)
        z = jnp.tanh(a) * jax.nn.sigmoid(b)
        res = CausalConv1d(
            self.residual_channels, 1, dtype=self.dtype, name="res"
        )(z)
        skip = CausalConv1d(
            self.skip_channels, 1, dtype=self.dtype, name="skip"
        )(z)
        return x + res, skip


class WaveNetStack(nn.Module):
    """Front 1x1 -> dilated gated layers (skip sum) -> relu/1x1 head.

    The shared trunk of the teacher (out_dim = 3*n_mixtures) and of each
    student IAF flow (out_dim = 2: mu, log_s).  `dilations` fixes the
    per-layer dilation schedule.
    """

    dilations: Sequence[int]
    residual_channels: int
    gate_channels: int
    skip_channels: int
    out_dim: int
    kernel_size: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, cond: jax.Array) -> jax.Array:
        x = CausalConv1d(
            self.residual_channels, 1, dtype=self.dtype, name="front"
        )(x)
        skip_total = jnp.zeros(
            x.shape[:-1] + (self.skip_channels,), dtype=self.dtype
        )
        for i, dilation in enumerate(self.dilations):
            x, skip = GatedResidualLayer(
                self.residual_channels,
                self.gate_channels,
                self.skip_channels,
                self.kernel_size,
                dilation,
                dtype=self.dtype,
                name=f"layer_{i}",
            )(x, cond)
            skip_total = skip_total + skip
        h = jax.nn.relu(skip_total)
        h = jax.nn.relu(
            CausalConv1d(self.skip_channels, 1, dtype=self.dtype,
                         name="head1")(h)
        )
        out = CausalConv1d(self.out_dim, 1, dtype=self.dtype, name="head2")(h)
        return out.astype(jnp.float32)


class UpsampleNet(nn.Module):
    """Mel-frame -> sample-rate conditioning upsampler.

    Stack of transposed convs over time; the product of `strides` equals
    the STFT hop length, so (B, F, n_mels) -> (B, F*hop, n_mels).
    Reference parity: transposed-conv mel upsampling in `modules.py` [R].
    """

    strides: Sequence[int]
    channels: int
    kernel_mult: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, mel: jax.Array) -> jax.Array:
        x = mel.astype(self.dtype)
        for i, stride in enumerate(self.strides):
            kernel = self.param(
                f"kernel_{i}",
                _conv_kernel_init,
                (stride * self.kernel_mult, x.shape[-1], self.channels),
            )
            bias = self.param(
                f"bias_{i}", jax.nn.initializers.zeros, (self.channels,)
            )
            x = conv_transpose1d(
                x, kernel.astype(self.dtype), stride, bias.astype(self.dtype)
            )
            x = jax.nn.leaky_relu(x, 0.4)
        return x


def shift_right_scalar(x: jax.Array) -> jax.Array:
    """(B, T) waveform -> (B, T, 1) of previous samples (AR input)."""
    return shift_right(x[..., None], 1)
