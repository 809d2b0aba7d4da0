"""Whole-stack Pallas "megakernel": every dilated layer of a WaveNet
stack processes one time-tile before the grid advances — per-layer
activation histories live in VMEM, so inter-layer activations NEVER
touch HBM.

Motivation (measured, v5e): the lax.scan stack runs at ~33 TFLOP/s
because each layer's gate concat / shifted operand / partial sums are
HBM-materialized between GEMMs; the pure GEMM floor at the same shapes
is ~128 TFLOP/s.  This kernel removes the intermediate traffic:

    HBM reads per tile : x0 tile, cond tile          (+weights, resident)
    HBM writes per tile: x_out tile, skip tile
    everything else    : VMEM scratch

Causality across tiles is a wavefront: layer l at tile i needs layer
l's input at times [i*TT - d_l, i*TT) — exactly the previous tile of
that layer's input stream, kept in `hist[l]` (TT samples per layer).
Zero-initialized history at tile 0 reproduces causal zero padding.
Requires max(dilations) <= TIME_TILE (same bound as the per-layer
kernel; all baseline configs satisfy it).

Grid: (B/bb, T/TT) with a batch BLOCK of bb rows per cell (sized so the
(L, bb, TT, C) history fits VMEM) — larger GEMM row counts fill the MXU
pipeline; `hist` resets at tile 0 of each batch block.  Backward: custom VJP that recomputes via the
pure-XLA reference (jax.vjp of the scan-equivalent function), so the
kernel is usable inside jax.grad (distillation scores the teacher on
student samples pathwise).
"""

from __future__ import annotations

import functools
import os
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pwn_tpu.ops.pallas.gated_layer import TIME_TILE

# Flow-stack time-tile (must be >= the largest dilation). Bigger tiles
# amortize per-grid-cell overheads at the cost of VMEM history (the
# batch-block shrinks to compensate). Overridable for experiments.
FLOW_TILE = int(os.environ.get("PWN_TPU_FLOW_TILE", str(TIME_TILE)))


def _kernel(x0_ref, cond_ref, w_in_ref, b_g_ref, w_out_ref, b_rs_ref,
            skip_ref, hist, *, dilations: Sequence[int],
            C: int, S: int, tile: int, bb: int):
    """Grid cell = (batch-block, time-tile).

    A whole batch-block of `bb` rows rides in each cell so the GEMMs see
    bb*TT rows (4096 at student sizes) instead of TT — measured ~2x over
    the one-row-per-cell version (small 512-row GEMMs underfill the MXU
    pipeline).  `bb` is sized so the (L, bb, TT, C) history fits VMEM.
    """
    i = pl.program_id(1)  # time-tile index within this batch block

    @pl.when(i == 0)
    def _reset():
        hist[...] = jnp.zeros_like(hist)

    f32 = jnp.float32
    x = x0_ref[...]        # (bb, TT, C) compute dtype
    cond_t = cond_ref[...]  # (bb, TT, M)
    skip_acc = jnp.zeros((bb, tile, S), f32)

    for l, d in enumerate(dilations):
        prev = hist[l]     # (bb, TT, C): this layer's input at tile i-1
        hist[l] = x        # store for tile i+1 BEFORE x is overwritten
        if d == tile:
            # full-tile shift: avoid the 0-length slice Mosaic rejects
            shifted = prev
        else:
            shifted = jnp.concatenate(
                [prev[:, tile - d :], x[:, : tile - d]], axis=1
            )
        cat = jnp.concatenate([x, shifted, cond_t], axis=-1)
        g = (
            jnp.dot(cat.reshape(bb * tile, -1), w_in_ref[l],
                    preferred_element_type=f32)
            + b_g_ref[l].astype(f32)
        )
        half = g.shape[-1] // 2
        z = (jnp.tanh(g[:, :half]) * jax.nn.sigmoid(g[:, half:])).astype(
            x.dtype
        )
        out = (
            jnp.dot(z, w_out_ref[l], preferred_element_type=f32)
            + b_rs_ref[l].astype(f32)
        ).reshape(bb, tile, C + S)
        x = x + out[..., :C].astype(x.dtype)
        skip_acc = skip_acc + out[..., C:]

    # the residual-path output is NOT emitted: the caller's head only
    # consumes the skip sum, so x stays VMEM-local (saves one (B,T,C)
    # HBM write per stack)
    skip_ref[...] = skip_acc.astype(x.dtype)


def _reference_xla(x0, cond, w_in, b_g, w_out, b_rs, dilations):
    """Semantically-identical pure-XLA stack (scan), used for the custom
    VJP backward and for equivalence tests."""
    from pwn_tpu.ops.conv import shift_right

    C = x0.shape[-1]
    dt = x0.dtype

    def body(carry, inputs):
        x, skip = carry
        w_in_l, b_g_l, w_out_l, b_rs_l, d = inputs
        T = x.shape[1]
        d_max = max(dilations)
        xp = jnp.pad(x, ((0, 0), (d_max, 0), (0, 0)))
        shifted = jax.lax.dynamic_slice_in_dim(xp, d_max - d, T, axis=1)
        cat = jnp.concatenate([x, shifted, cond.astype(dt)], axis=-1)
        g = jnp.einsum("btk,kg->btg", cat, w_in_l).astype(
            jnp.float32
        ) + b_g_l.astype(jnp.float32)
        a, b = jnp.split(g, 2, axis=-1)
        z = (jnp.tanh(a) * jax.nn.sigmoid(b)).astype(dt)
        out = jnp.einsum("btg,go->bto", z, w_out_l).astype(
            jnp.float32
        ) + b_rs_l.astype(jnp.float32)
        x = x + out[..., :C].astype(dt)
        skip = skip + out[..., C:]
        return (x, skip), None

    dils = jnp.asarray(dilations, jnp.int32)
    S = w_out.shape[-1] - C
    (_, skip), _ = jax.lax.scan(
        body,
        (x0, jnp.zeros(x0.shape[:-1] + (S,), jnp.float32)),
        (w_in, b_g, w_out, b_rs, dils),
    )
    return skip.astype(dt)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _flow_stack(dilations, interpret, x0, cond, w_in, b_g, w_out, b_rs):
    return _flow_stack_fwd_impl(dilations, interpret, x0, cond, w_in,
                                b_g, w_out, b_rs)


def _flow_stack_fwd_impl(dilations, interpret, x0, cond, w_in, b_g,
                         w_out, b_rs):
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
    w_in = w_in.astype(dt)
    w_out = w_out.astype(dt)

    # batch-block size: largest divisor of B whose history fits ~4 MB of
    # VMEM (leaving room for the resident weights + pipeline buffers)
    hist_budget = 4 * 1024 * 1024
    bb = B
    while bb > 1 and L * bb * tile * C * x0.dtype.itemsize > hist_budget:
        bb //= 2
    while B % bb:
        bb -= 1

    grid = (B // bb, Tp // tile)
    tmap = lambda b, i: (b, i, 0)  # noqa: E731
    full3 = lambda b, i: (0, 0, 0)  # noqa: E731
    full2 = lambda b, i: (0, 0)  # noqa: E731

    skip = pl.pallas_call(
        functools.partial(
            _kernel, dilations=tuple(dilations), C=C, S=S, tile=tile,
            bb=bb,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bb, tile, C), tmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, tile, M), tmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((L, K_in, G), full3, memory_space=pltpu.VMEM),
            pl.BlockSpec((L, G), full2, memory_space=pltpu.VMEM),
            pl.BlockSpec((L, G // 2, C + S), full3,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((L, C + S), full2, memory_space=pltpu.VMEM),
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
        interpret=interpret,
    )(x0, cond, w_in, b_g.astype(jnp.float32), w_out,
      b_rs.astype(jnp.float32))

    if pad:
        skip = skip[:, :T]
    return skip


def _reference_xla_unrolled(x0, cond, w_in, b_g, w_out, b_rs, dilations):
    """Unrolled-layer reference — same math as `_reference_xla` but as a
    flat per-layer graph: XLA's backward through the unrolled form is
    measurably faster than through a scan (see WaveNetStack notes), so
    the custom VJP differentiates THIS form."""
    from pwn_tpu.ops.conv import shift_right

    C = x0.shape[-1]
    dt = x0.dtype
    x = x0
    S = w_out.shape[-1] - C
    skip = jnp.zeros(x0.shape[:-1] + (S,), jnp.float32)
    condc = cond.astype(dt)
    for l, d in enumerate(dilations):
        shifted = shift_right(x, d, axis=1)
        cat = jnp.concatenate([x, shifted, condc], axis=-1)
        g = jnp.einsum("btk,kg->btg", cat, w_in[l]).astype(
            jnp.float32
        ) + b_g[l].astype(jnp.float32)
        a, b = jnp.split(g, 2, axis=-1)
        z = (jnp.tanh(a) * jax.nn.sigmoid(b)).astype(dt)
        out = jnp.einsum("btg,go->bto", z, w_out[l]).astype(
            jnp.float32
        ) + b_rs[l].astype(jnp.float32)
        x = x + out[..., :C].astype(dt)
        skip = skip + out[..., C:]
    return skip.astype(dt)


def _fwd(dilations, interpret, *args):
    return _flow_stack(dilations, interpret, *args), args


def _bwd(dilations, interpret, residuals, cots):
    ref = functools.partial(_reference_xla_unrolled, dilations=dilations)
    _, vjp = jax.vjp(ref, *residuals)
    return vjp(cots)


_flow_stack.defvjp(_fwd, _bwd)


def fused_flow_stack(
    x0: jax.Array,    # (B, T, C) front-embedded input
    cond: jax.Array,  # (B, T, M)
    w_in: jax.Array,  # (L, 2C+M, G) gate weights [x | shift | cond]
    b_g: jax.Array,   # (L, G)
    w_out: jax.Array,  # (L, G/2, C+S) combined res|skip
    b_rs: jax.Array,  # (L, C+S)
    *,
    dilations: Tuple[int, ...],
    interpret: bool | None = None,
) -> Tuple[jax.Array, jax.Array]:
    """Differentiable whole-stack forward. Returns skip_total (B, T, S).

    (The residual-path output is intentionally not returned — the head
    consumes only the skip sum, and omitting it saves an HBM write.)"""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    return _flow_stack(
        tuple(dilations), interpret, x0, cond, w_in, b_g, w_out, b_rs
    )
