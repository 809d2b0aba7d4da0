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

from pwn_tpu.ops import pallas as pallas_ops
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

    Two execution paths over the SAME parameters:
      * `fused=True`: the Pallas TPU kernel (ops/pallas/gated_layer.py) —
        one VMEM-resident pass per time-tile, differentiable via its
        custom VJP;
      * `fused=False`: composed XLA ops (shifted-matmul conv + einsums).
    Params are owned directly (not via child CausalConv1d modules) so both
    paths and the AR fast-sampler address one flat layout:
    w_dilated (2, C, G), b_dilated, w_cond (M, G), b_cond,
    w_res (G/2, C), b_res, w_skip (G/2, S), b_skip.
    """

    residual_channels: int
    gate_channels: int
    skip_channels: int
    kernel_size: int = 2
    dilation: int = 1
    dtype: jnp.dtype = jnp.float32
    fused: bool = False

    @nn.compact
    def __call__(
        self, x: jax.Array, cond: jax.Array
    ) -> Tuple[jax.Array, jax.Array]:
        if self.kernel_size != 2:
            raise NotImplementedError(
                "gated residual layers use kernel_size=2 (WaveNet)"
            )
        C, G, S = (
            self.residual_channels,
            self.gate_channels,
            self.skip_channels,
        )
        M = cond.shape[-1]
        zeros = jax.nn.initializers.zeros
        w_dilated = self.param("w_dilated", _conv_kernel_init, (2, C, G))
        b_dilated = self.param("b_dilated", zeros, (G,))
        w_cond = self.param(
            "w_cond",
            jax.nn.initializers.variance_scaling(
                1.0, "fan_in", "truncated_normal"
            ),
            (M, G),
        )
        b_cond = self.param("b_cond", zeros, (G,))
        w_res = self.param(
            "w_res",
            jax.nn.initializers.variance_scaling(
                1.0, "fan_in", "truncated_normal"
            ),
            (G // 2, C),
        )
        b_res = self.param("b_res", zeros, (C,))
        w_skip = self.param(
            "w_skip",
            jax.nn.initializers.variance_scaling(
                1.0, "fan_in", "truncated_normal"
            ),
            (G // 2, S),
        )
        b_skip = self.param("b_skip", zeros, (S,))

        x = x.astype(self.dtype)
        cond = cond.astype(self.dtype)

        if self.fused and self.dilation <= pallas_ops.TIME_TILE:
            return pallas_ops.fused_gated_residual(
                x, cond, w_dilated, b_dilated, w_cond, b_cond, w_res,
                b_res, w_skip, b_skip, dilation=self.dilation,
            )

        dt = self.dtype
        h = causal_conv1d(
            x, w_dilated.astype(dt), self.dilation, b_dilated.astype(dt)
        )
        h = h + jnp.einsum("btm,mg->btg", cond, w_cond.astype(dt)) + (
            b_cond.astype(dt)
        )
        a, b = jnp.split(h, 2, axis=-1)
        z = jnp.tanh(a) * jax.nn.sigmoid(b)
        res = jnp.einsum("btg,gc->btc", z, w_res.astype(dt)) + b_res.astype(
            dt
        )
        skip = jnp.einsum("btg,gs->bts", z, w_skip.astype(dt)) + (
            b_skip.astype(dt)
        )
        return x + res, skip


def resolve_fused(flag: str) -> bool:
    """Resolve a config 'fused_layers' flag ("on"/"off"/"auto").

    auto = fused Pallas kernels anywhere but plain CPU (where they would
    run in the slow interpreter — CI covers them explicitly instead).
    """
    if flag == "on":
        return True
    if flag == "off":
        return False
    return jax.default_backend() != "cpu"


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
    fused: bool = False

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
                fused=self.fused,
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
