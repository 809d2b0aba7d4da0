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

from typing import Sequence

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


class GatedLayerParams(nn.Module):
    """Parameter holder for one gated residual layer.

    Declares the flat per-layer parameter set under a stable scope name
    (`layer_{i}`) so the AR fast-sampler (models/sampling.py) and the TP
    sharding rules (parallel/tp.py) address one layout regardless of
    which compute path runs:
        w_dilated (2, C, G), b_dilated, w_cond (M, G), b_cond,
        w_res (G/2, C), b_res, w_skip (G/2, S), b_skip
    """

    residual_channels: int
    gate_channels: int
    skip_channels: int

    @nn.compact
    def __call__(self, cond_dim: int):
        C, G, S = (
            self.residual_channels,
            self.gate_channels,
            self.skip_channels,
        )
        zeros = jax.nn.initializers.zeros
        vs = jax.nn.initializers.variance_scaling(
            1.0, "fan_in", "truncated_normal"
        )
        return {
            "w_dilated": self.param("w_dilated", _conv_kernel_init,
                                    (2, C, G)),
            "b_dilated": self.param("b_dilated", zeros, (G,)),
            "w_cond": self.param("w_cond", vs, (cond_dim, G)),
            "b_cond": self.param("b_cond", zeros, (G,)),
            "w_res": self.param("w_res", vs, (G // 2, C)),
            "b_res": self.param("b_res", zeros, (C,)),
            "w_skip": self.param("w_skip", vs, (G // 2, S)),
            "b_skip": self.param("b_skip", zeros, (S,)),
        }


def gated_layer_xla(x, cond, lp, dilation, dtype):
    """Unrolled XLA layer compute (the training fwd/bwd path).

        h  = W_dilated *_d x  +  W_cond * c
        z  = tanh(h_a) * sigmoid(h_b)
        out_residual = x + W_res z ;  out_skip = W_skip z

    Formulated as the same two wide GEMMs the scan/mega paths use
    ([x | shift(x,d) | cond] @ stacked gate weights; z @ [W_res|W_skip]):
    measured 1.44x faster for teacher training fwd+bwd than the
    3-skinny-einsum form on v5e (41.9 vs 60.2 ms/step), because the
    wide contraction fills the MXU and halves the intermediate count.
    """
    dt = dtype
    w_in = jnp.concatenate(
        [lp["w_dilated"][1], lp["w_dilated"][0], lp["w_cond"]], axis=0
    ).astype(dt)
    cat = jnp.concatenate([x, shift_right(x, dilation), cond], axis=-1)
    g = jnp.einsum("btk,kg->btg", cat, w_in) + (
        lp["b_dilated"] + lp["b_cond"]
    ).astype(dt)
    a, b = jnp.split(g, 2, axis=-1)
    z = jnp.tanh(a) * jax.nn.sigmoid(b)
    w_out = jnp.concatenate(
        [lp["w_res"], lp["w_skip"]], axis=1
    ).astype(dt)
    out = jnp.einsum("btg,go->bto", z, w_out)
    C = x.shape[-1]
    res = x + out[..., :C] + lp["b_res"].astype(dt)
    skip = out[..., C:] + lp["b_skip"].astype(dt)
    return res, skip


def resolve_fused(flag: str) -> bool:
    """Back-compat bool view of `resolve_stack_mode` (per-layer kernel)."""
    return resolve_stack_mode(flag) == "layer"


def resolve_stack_mode(flag: str) -> str:
    """Resolve a config 'fused_layers' flag to an execution mode.

      "off"          -> "xla"   (lax.scan / unrolled XLA paths)
      "on" / "layer" -> "layer" (per-layer Pallas gated kernel)
      "mega"         -> "mega"  (whole-stack Pallas megakernel,
                        XLA-recompute backward)
      "mega_train"   -> "mega_train" (megakernel forward saving
                        per-layer inputs + fused Pallas backward —
                        the training-step mode)
      "mega_dx"      -> "mega_dx" (same forward; backward restricted
                        to input/cond cotangents — the FROZEN-stack
                        scoring mode, e.g. the distillation teacher)
      "auto"         -> "mega" off-CPU, "xla" on CPU (the interpreter
                        would crawl; CI covers the kernels explicitly)
    """
    if flag in ("on", "layer"):
        return "layer"
    if flag == "mega":
        return "mega"
    if flag in ("mega_train", "mega_dx"):
        return flag if jax.default_backend() != "cpu" else "xla"
    if flag == "off":
        return "xla"
    return "mega" if jax.default_backend() != "cpu" else "xla"


class WaveNetStack(nn.Module):
    """Front 1x1 -> dilated gated layers (skip sum) -> relu/1x1 head.

    The shared trunk of the teacher (out_dim = 3*n_mixtures) and of each
    student IAF flow (out_dim = 2: mu, log_s).  `dilations` fixes the
    per-layer dilation schedule.

    Four execution paths over ONE parameter layout (pick via `mega`,
    `fused`, `use_scan`; models resolve them from the config's
    fused_layers flag + the training/inference site):

      mega     — whole-stack Pallas megakernel (ops/pallas/flow_stack):
                 fastest forward on TPU; inter-layer activations stay
                 in VMEM (default on TPU via fused_layers="auto")
      scan     — ONE lax.scan over stacked per-layer weights with a
                 wide-contraction gate GEMM on [x | shift(x,d) | cond];
                 fastest pure-XLA forward (1.5x over unrolled)
      unrolled — flat per-layer XLA graph (gated_layer_xla, wide-GEMM
                 form): fastest BACKWARD -> the training path
      layer    — per-layer Pallas gated kernel (ops/pallas/gated_layer)
    """

    dilations: Sequence[int]
    residual_channels: int
    gate_channels: int
    skip_channels: int
    out_dim: int
    kernel_size: int = 2
    dtype: jnp.dtype = jnp.float32
    fused: bool = False
    # Whole-stack Pallas megakernel (ops/pallas/flow_stack.py): all layers
    # process each time-tile with histories VMEM-resident — the fastest
    # forward on TPU (inter-layer activations never touch HBM).
    mega: bool = False
    # Training variant: megakernel forward that saves per-layer inputs +
    # a fused Pallas backward (anti-causal wavefront) instead of the
    # XLA-recompute VJP.
    mega_train: bool = False
    # Frozen-stack scoring variant: mega_train forward, backward
    # restricted to dx/dcond (no weight-grad dots) — for scoring a
    # stop-gradient'd stack inside jax.grad (distillation teacher).
    mega_dx: bool = False
    # lax.scan over stacked layer weights: fastest pure-XLA FORWARD (1.5x
    # over the unrolled graph on v5e), but its backward executes as a
    # second scan that is ~1.6x slower than the unrolled backward — so
    # training steps construct their models with use_scan=False and
    # inference with True. All paths share one parameter layout and
    # match numerically.
    use_scan: bool = True

    @nn.compact
    def __call__(self, x: jax.Array, cond: jax.Array) -> jax.Array:
        if self.kernel_size != 2:
            raise NotImplementedError(
                "WaveNetStack uses kernel_size=2 (WaveNet)"
            )
        C, G, S = (
            self.residual_channels,
            self.gate_channels,
            self.skip_channels,
        )
        dt = self.dtype
        x = CausalConv1d(C, 1, dtype=dt, name="front")(x)
        cond = cond.astype(dt)
        layer_params = [
            GatedLayerParams(C, G, S, name=f"layer_{i}")(cond.shape[-1])
            for i in range(len(self.dilations))
        ]

        from pwn_tpu.ops.pallas.flow_stack import mega_fits_vmem

        # Megakernel eligibility: dilation bound (one-tile history reach)
        # AND the whole-stack weights + histories must fit VMEM.  A
        # requested-but-ineligible mega falls back to the PER-LAYER Pallas
        # kernel (one layer's weights resident at a time — measured 2.4x
        # over XLA at config[4] sizes, r2 TPU session 1), then to XLA.
        tile_ok = max(self.dilations) <= pallas_ops.TIME_TILE
        mega_ok = tile_ok and mega_fits_vmem(
            len(self.dilations), C, G, S, cond.shape[-1],
            jnp.dtype(dt).itemsize,
        )

        if (self.mega_train or self.mega_dx) and mega_ok:
            from pwn_tpu.ops.pallas.flow_stack import (
                fused_flow_stack_score,
                fused_flow_stack_train,
            )

            fused_fn = (fused_flow_stack_score if self.mega_dx
                        else fused_flow_stack_train)
            w_in, b_g, w_out, b_res, b_skip = self._stacked(layer_params)
            skip_total = fused_fn(
                x, cond, w_in, b_g,
                w_out,
                jnp.concatenate([b_res, b_skip], axis=1),
                dilations=tuple(self.dilations),
            )
        elif self.mega and mega_ok:
            from pwn_tpu.ops.pallas.flow_stack import fused_flow_stack

            w_in, b_g, w_out, b_res, b_skip = self._stacked(layer_params)
            skip_total = fused_flow_stack(
                x, cond, w_in, b_g,
                w_out,
                jnp.concatenate([b_res, b_skip], axis=1),
                dilations=tuple(self.dilations),
            )
        elif (self.fused or self.mega or self.mega_train
              or self.mega_dx) and tile_ok:
            skip_total = jnp.zeros(x.shape[:-1] + (S,), dtype=dt)
            for lp, dilation in zip(layer_params, self.dilations):
                x, skip = pallas_ops.fused_gated_residual(
                    x, cond, lp["w_dilated"], lp["b_dilated"],
                    lp["w_cond"], lp["b_cond"], lp["w_res"], lp["b_res"],
                    lp["w_skip"], lp["b_skip"], dilation=dilation,
                )
                skip_total = skip_total + skip
        elif self.use_scan:
            x, skip_total = self._scan_stack(x, cond, layer_params)
        else:
            skip_total = jnp.zeros(x.shape[:-1] + (S,), dtype=dt)
            for lp, dilation in zip(layer_params, self.dilations):
                x, skip = gated_layer_xla(x, cond, lp, dilation, dt)
                skip_total = skip_total + skip

        h = jax.nn.relu(skip_total)
        h = jax.nn.relu(
            CausalConv1d(S, 1, dtype=dt, name="head1")(h)
        )
        out = CausalConv1d(self.out_dim, 1, dtype=dt, name="head2")(h)
        return out.astype(jnp.float32)

    def _scan_stack(self, x, cond, layer_params):
        """One lax.scan over stacked layer weights (see class docstring)."""
        dt = self.dtype
        C, S = self.residual_channels, self.skip_channels
        T = x.shape[1]
        d_max = max(self.dilations)
        w_in, b_g, w_out, b_res, b_skip = self._stacked(layer_params)
        dils = jnp.asarray(self.dilations, jnp.int32)

        def body(carry, inputs):
            x, skip = carry
            w_in_l, b_g_l, w_out_l, b_res_l, b_skip_l, d = inputs
            # shift(x, d) with per-layer d: static-size dynamic_slice
            # into a max-dilation left pad (zeros = causal padding);
            # also correct when d >= T.
            xp = jnp.pad(x, ((0, 0), (d_max, 0), (0, 0)))
            shifted = jax.lax.dynamic_slice_in_dim(
                xp, d_max - d, T, axis=1
            )
            cat = jnp.concatenate([x, shifted, cond], axis=-1)
            g = jnp.einsum("btk,kg->btg", cat, w_in_l) + b_g_l
            a, b = jnp.split(g, 2, axis=-1)
            z = jnp.tanh(a) * jax.nn.sigmoid(b)
            out = jnp.einsum("btg,go->bto", z, w_out_l)
            x = x + out[..., :C] + b_res_l
            skip = skip + out[..., C:] + b_skip_l
            return (x, skip), None

        (x, skip_total), _ = jax.lax.scan(
            body,
            (x, jnp.zeros(x.shape[:-1] + (S,), dt)),
            (w_in, b_g, w_out, b_res, b_skip, dils),
        )
        return x, skip_total

    def _stacked(self, layer_params):
        """Stack per-layer params into the (L, ...) layout shared by the
        scan path and the flow-stack megakernel.  Gate operand order
        matches both kernels' concat: [x, shifted, cond]."""
        dt = self.dtype

        def stk(name):
            return jnp.stack([lp[name] for lp in layer_params])

        w_in = jnp.concatenate(
            [stk("w_dilated")[:, 1], stk("w_dilated")[:, 0],
             stk("w_cond")],
            axis=1,
        ).astype(dt)  # (L, 2C+M, G)
        b_g = (stk("b_dilated") + stk("b_cond")).astype(dt)
        w_out = jnp.concatenate([stk("w_res"), stk("w_skip")],
                                axis=2).astype(dt)  # (L, G/2, C+S)
        return w_in, b_g, w_out, stk("b_res").astype(dt), (
            stk("b_skip").astype(dt)
        )


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
    # Weight-normalized kernels (g * v / ||v||, ops/norm.py — the
    # reference's `normalize` wrapper [R]).  Wired HERE and not into the
    # gated stack: the stack's flat param layout (w_dilated/w_cond/...)
    # is shared by the scan path, three Pallas kernel families, the AR
    # sampler, and the TP sharding rules (CLAUDE.md invariants) — a
    # reparameterization there would fork every kernel for a technique
    # the models demonstrably train without.  The upsampler is pure XLA
    # on every path, so the flag is safe end-to-end.  Default off: the
    # goldens pin the plain parameterization.
    weight_norm: bool = False

    @nn.compact
    def __call__(self, mel: jax.Array) -> jax.Array:
        from pwn_tpu.ops.norm import weight_norm as _wn

        x = mel.astype(self.dtype)
        for i, stride in enumerate(self.strides):
            kshape = (stride * self.kernel_mult, x.shape[-1],
                      self.channels)
            if self.weight_norm:
                v = self.param(f"v_{i}", _conv_kernel_init, kshape)
                # g init = ||v|| of the ACTUAL v (closed over — not a
                # fresh draw with g's own RNG fold), so the initial
                # effective kernel equals v exactly and the function
                # matches the plain conv at init (same trick as
                # ops/norm.py::WeightNormConv1d)
                g = self.param(
                    f"g_{i}",
                    lambda key, _, v=v: jnp.sqrt(jnp.sum(
                        jnp.square(v), axis=(0, 1),
                    )),
                    (self.channels,),
                )
                kernel = _wn(v, g)
            else:
                kernel = self.param(f"kernel_{i}", _conv_kernel_init,
                                    kshape)
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
