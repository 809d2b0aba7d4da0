"""W8A8 dynamically-quantized flow-stack megakernel (serving path).

Same whole-stack wavefront as `flow_stack._kernel` (every dilated layer
processes one time-tile with per-layer histories VMEM-resident), but the
two per-layer GEMMs run on the MXU in int8: v5e executes int8 matmuls at
~394 TOPS, 2x the bf16 peak — and the generation megakernel is
MXU-bound (~50-62% analytic bf16 MFU, BASELINE.md), so serving has real
headroom above the bf16 kernel.  Int8 weights also HALVE the kernel's
VMEM weight footprint, restoring whole-stack megakernel eligibility for
config[4]-scale stacks that exceed `mega_fits_vmem` at bf16.

Quantization scheme (all scales dynamic, no calibration):

  weights    symmetric per-output-channel int8:
               wq[k, g] = round(w[k, g] / s_w[g]),  s_w[g] = amax_k/127
  gate input the lane-concat [x | shift(x,d)] and the conditioning are
             quantized SEPARATELY (their magnitudes differ; one shared
             row scale would crush the smaller stream):
               per-ROW symmetric int8, s_row = amax_row/127, recomputed
               per layer for the residual stream and ONCE per tile for
               the conditioning (it is layer-invariant)
  gated act  z = tanh*sigmoid is (-1,1)-bounded; per-row int8
  dequant    g = (A_int32 * s_rowA * s_wA) + (C_int32 * s_rowC * s_wC)
             exact rank-1 scaling — int32 accumulation on the MXU,
             fp32 epilogue

The residual stream, biases, skip accumulator, and the relu/1x1 head
(outside this kernel) stay bf16/fp32 — only the MXU contractions are
int8.  Serving-only: generation is never differentiated, so no VJP.

Reference parity note: the reference [R] has no quantized path at all
(TF-1.x fp32 throughout, SURVEY.md §2a); this is a beyond-reference
TPU-native serving feature, opt-in via `fused_layers="q8"` /
`generate --quant int8`.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pwn_tpu.ops.pallas.flow_stack import FLOW_TILE, MEGA_VMEM_BUDGET
from pwn_tpu.ops.pallas.gated_layer import TIME_TILE

_EPS = 1e-8


def quantize_weight_per_channel(w: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Symmetric per-output-channel int8 for a (L, K, G) weight stack.

    Returns (wq int8 (L, K, G), scale fp32 (L, 1, G)) with
    w ~= wq * scale."""
    w = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(w), axis=1, keepdims=True)  # (L, 1, G)
    scale = jnp.maximum(amax, _EPS) / 127.0
    wq = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    return wq, scale


def _rowquant(x_f32: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Per-row symmetric int8 of a (R, K) fp32 operand.

    Returns (q int8 (R, K), row_scale fp32 (R, 1)) with x ~= q * row_scale.
    """
    amax = jnp.max(jnp.abs(x_f32), axis=-1, keepdims=True)
    s = jnp.maximum(amax, _EPS) / 127.0
    q = jnp.clip(jnp.round(x_f32 / s), -127, 127).astype(jnp.int8)
    return q, s


def _idot(qa: jax.Array, qb: jax.Array) -> jax.Array:
    """int8 x int8 -> int32 MXU contraction."""
    return jax.lax.dot_general(
        qa, qb, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )


def _q8_kernel(x0_ref, cond_ref, wq_xs_ref, s_xs_ref, wq_c_ref, s_c_ref,
               b_g_ref, wq_out_ref, s_out_ref, b_rs_ref, skip_ref, hist,
               *, dilations: Sequence[int], C: int, S: int, tile: int,
               bb: int):
    """Grid cell = (batch-block, time-tile); see flow_stack._kernel for
    the wavefront/history mechanics (identical here)."""
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _reset():
        hist[...] = jnp.zeros_like(hist)

    f32 = jnp.float32
    x = x0_ref[...]          # (bb, TT, C) bf16
    # conditioning is layer-invariant: quantize once per tile
    cond_f = cond_ref[...].astype(f32).reshape(bb * tile, -1)
    qcond, s_rowc = _rowquant(cond_f)
    skip_acc = jnp.zeros((bb, tile, S), f32)

    for l, d in enumerate(dilations):
        prev = hist[l]
        hist[l] = x
        if d == tile:
            shifted = prev
        else:
            shifted = jnp.concatenate(
                [prev[:, tile - d:], x[:, : tile - d]], axis=1
            )
        catx = jnp.concatenate([x, shifted], axis=-1).astype(f32).reshape(
            bb * tile, 2 * C
        )
        qx, s_rowx = _rowquant(catx)
        acc = (
            _idot(qx, wq_xs_ref[l]).astype(f32) * s_rowx * s_xs_ref[l]
            + _idot(qcond, wq_c_ref[l]).astype(f32) * s_rowc * s_c_ref[l]
        )
        g = acc + b_g_ref[l].astype(f32)
        half = g.shape[-1] // 2
        zf = jnp.tanh(g[:, :half]) * jax.nn.sigmoid(g[:, half:])
        qz, s_rowz = _rowquant(zf)
        out = (
            _idot(qz, wq_out_ref[l]).astype(f32) * s_rowz * s_out_ref[l]
            + b_rs_ref[l].astype(f32)
        ).reshape(bb, tile, C + S)
        x = x + out[..., :C].astype(x.dtype)
        skip_acc = skip_acc + out[..., C:]

    skip_ref[...] = skip_acc.astype(x.dtype)


def q8_reference_xla(x0, cond, w_in, b_g, w_out, b_rs, dilations):
    """Bit-exact XLA emulation of the quantized kernel (fp32 integer
    arithmetic: all accumulations stay < 2^24, so float dots of the
    rounded operands reproduce the int32 MXU results exactly).  Used by
    the interpret-mode equivalence test and as the CPU fallback."""
    B, T, C = x0.shape
    dt = x0.dtype
    f32 = jnp.float32

    wq_xs, s_xs, wq_c, s_c, wq_out, s_out = quantize_stack_weights(
        w_in, w_out, C
    )
    cond_f = cond.astype(dt).astype(f32)
    qcond, s_rowc = _rowquant(cond_f.reshape(B * T, -1))
    qcond = qcond.astype(f32)

    x = x0
    S = w_out.shape[-1] - C
    skip = jnp.zeros((B, T, S), f32)
    for l, d in enumerate(dilations):
        xp = jnp.pad(x, ((0, 0), (d, 0), (0, 0)))[:, :T]
        catx = jnp.concatenate([x, xp], axis=-1).astype(f32).reshape(
            B * T, 2 * C
        )
        qx, s_rowx = _rowquant(catx)
        acc = (
            jnp.dot(qx.astype(f32), wq_xs[l].astype(f32)) * s_rowx * s_xs[l]
            + jnp.dot(qcond, wq_c[l].astype(f32)) * s_rowc * s_c[l]
        )
        g = acc + b_g[l].astype(f32)
        a, b = jnp.split(g, 2, axis=-1)
        zf = jnp.tanh(a) * jax.nn.sigmoid(b)
        qz, s_rowz = _rowquant(zf)
        out = (
            jnp.dot(qz.astype(f32), wq_out[l].astype(f32))
            * s_rowz * s_out[l]
            + b_rs[l].astype(f32)
        ).reshape(B, T, C + S)
        x = x + out[..., :C].astype(dt)
        skip = skip + out[..., C:]
    return skip.astype(dt)


def quantize_stack_weights(w_in, w_out, C):
    """Split the stacked gate weights (L, 2C+M, G) into the
    residual-stream segment (first 2C rows) and the conditioning segment,
    then per-output-channel-quantize each plus the out weights."""
    wq_xs, s_xs = quantize_weight_per_channel(w_in[:, : 2 * C])
    wq_c, s_c = quantize_weight_per_channel(w_in[:, 2 * C:])
    wq_out, s_out = quantize_weight_per_channel(w_out)
    return wq_xs, s_xs, wq_c, s_c, wq_out, s_out


def q8_vmem_bytes(n_layers: int, C: int, G: int, S: int, M: int) -> int:
    """Lower-bound VMEM footprint of the q8 megakernel at bb=1: int8
    weights + fp32 scales/biases + bf16 history + io blocks."""
    tile = max(FLOW_TILE, TIME_TILE)
    weights = n_layers * (
        2 * C * G + M * G + (G // 2) * (C + S)   # int8
        + (G + (C + S)) * 4 * 2                  # scales + biases fp32
    )
    history = n_layers * tile * C * 2            # bf16, bb = 1
    io_blocks = 2 * tile * (C + M + S) * 2
    return weights + history + io_blocks


def q8_fits_vmem(n_layers: int, C: int, G: int, S: int, M: int) -> bool:
    return q8_vmem_bytes(n_layers, C, G, S, M) <= MEGA_VMEM_BUDGET


def fused_flow_stack_q8(
    x0: jax.Array,    # (B, T, C) front-embedded input
    cond: jax.Array,  # (B, T, M)
    w_in: jax.Array,  # (L, 2C+M, G)
    b_g: jax.Array,   # (L, G)
    w_out: jax.Array,  # (L, G/2, C+S)
    b_rs: jax.Array,  # (L, C+S)
    *,
    dilations: Tuple[int, ...],
    interpret: bool | None = None,
) -> jax.Array:
    """Quantized whole-stack forward; returns skip_total (B, T, S).

    Serving-only (no VJP).  Weight quantization runs in XLA at trace
    time (a few tiny reductions per call; fused away under jit)."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    B, T, C = x0.shape
    M = cond.shape[-1]
    L, K_in, G = w_in.shape
    S = w_out.shape[-1] - C
    tile = max(FLOW_TILE, TIME_TILE)
    if max(dilations) > tile:
        raise ValueError(
            f"max dilation {max(dilations)} > TIME_TILE {tile}"
        )
    pad = (-T) % tile
    if pad:
        x0 = jnp.pad(x0, ((0, 0), (0, pad), (0, 0)))
        cond = jnp.pad(cond, ((0, 0), (0, pad), (0, 0)))
    Tp = T + pad
    dt = x0.dtype
    cond = cond.astype(dt)

    wq_xs, s_xs, wq_c, s_c, wq_out, s_out = quantize_stack_weights(
        w_in, w_out, C
    )

    hist_budget = 4 * 1024 * 1024
    bb = B
    while bb > 1 and L * bb * tile * C * x0.dtype.itemsize > hist_budget:
        bb //= 2
    while B % bb:
        bb -= 1

    grid = (B // bb, Tp // tile)
    tmap = lambda b, i: (b, i, 0)  # noqa: E731
    full3 = lambda b, i: (0, 0, 0)  # noqa: E731

    skip = pl.pallas_call(
        functools.partial(
            _q8_kernel, dilations=tuple(dilations), C=C, S=S, tile=tile,
            bb=bb,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bb, tile, C), tmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, tile, M), tmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((L, 2 * C, G), full3, memory_space=pltpu.VMEM),
            pl.BlockSpec((L, 1, G), full3, memory_space=pltpu.VMEM),
            pl.BlockSpec((L, M, G), full3, memory_space=pltpu.VMEM),
            pl.BlockSpec((L, 1, G), full3, memory_space=pltpu.VMEM),
            pl.BlockSpec((L, 1, G), full3, memory_space=pltpu.VMEM),
            pl.BlockSpec((L, G // 2, C + S), full3,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((L, 1, C + S), full3, memory_space=pltpu.VMEM),
            pl.BlockSpec((L, 1, C + S), full3, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bb, tile, S), tmap,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Tp, S), dt),
        scratch_shapes=[pltpu.VMEM((L, bb, tile, C), dt)],
        cost_estimate=pl.CostEstimate(
            flops=2 * B * Tp * L * (K_in * G + (G // 2) * (C + S)),
            bytes_accessed=B * Tp * (2 * C + M + S) * x0.dtype.itemsize,
            transcendentals=B * Tp * L * G,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(x0, cond, wq_xs, s_xs, wq_c, s_c,
      b_g.astype(jnp.float32)[:, None, :], wq_out, s_out,
      b_rs.astype(jnp.float32)[:, None, :])

    if pad:
        skip = skip[:, :T]
    return skip
