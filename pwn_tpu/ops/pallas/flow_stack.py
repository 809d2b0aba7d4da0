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


def _hist_budget_bytes() -> int:
    """VMEM budget for the (L, bb, tile, C) dilation-history scratch —
    sets the batch block bb. Env-overridable for kernel experiments
    (read at trace time)."""
    return int(
        float(os.environ.get("PWN_TPU_MEGA_HIST_MB", "4")) * 1024 * 1024
    )


# Batch blocks above 4 MISCOMPILE on the Mosaic backend: at bb=8 the
# kernel's output diverges from the fp32 reference by ~1.1 on values
# bounded by ~4, while bb<=4 matches at bf16 accumulation level (0.017)
# and interpret mode is bit-identical across bb — measured on v5e for
# every (grid0, C, tile) combination probed (r3 session 2: C=32/64,
# grid0=1/2, tile=512/1024; tools/r3s2_mega_tune.py + /tmp probes).
# Presets never resolved bb>4, but small-channel models (C<=32) would
# have under the 4 MB default budget. Clamp until the Mosaic bug is
# understood.
MAX_BATCH_BLOCK = 4


def _pick_bb(B: int, per_row_bytes: int, budget: int) -> int:
    """Largest divisor of B, at most MAX_BATCH_BLOCK, whose history
    footprint bb*per_row_bytes fits the budget."""
    bb = min(B, MAX_BATCH_BLOCK)
    while bb > 1 and bb * per_row_bytes > budget:
        bb //= 2
    while B % bb:
        bb -= 1
    return bb


def _act_bf16() -> bool:
    """Compute the gate tanh/sigmoid in the kernel's compute dtype
    instead of fp32 (experiment knob; read at trace time)."""
    return os.environ.get("PWN_TPU_MEGA_ACT_BF16", "0") == "1"


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
    act_dt = x.dtype if _act_bf16() else f32

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
        ).astype(act_dt)
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
    # VMEM (leaving room for the resident weights + pipeline buffers),
    # clamped to MAX_BATCH_BLOCK (bb=8 miscompiles — see above)
    bb = _pick_bb(B, L * tile * C * x0.dtype.itemsize,
                  _hist_budget_bytes())

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
        # large-history experiment layouts exceed the 16 MB default
        # scoped-vmem cap; v5e has 128 MB (see the backward's note)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
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


# Eligibility budget for the megakernel: VMEM is ~16 MB/core on v4/v5e;
# leave headroom for Mosaic's pipeline double-buffers and register spill.
MEGA_VMEM_BUDGET = 12 * 1024 * 1024


def mega_vmem_bytes(n_layers: int, C: int, G: int, S: int, M: int,
                    itemsize: int) -> int:
    """Lower-bound VMEM footprint of the flow-stack megakernel.

    The kernel keeps EVERY layer's weights plus an (L, bb, tile, C)
    dilation history resident; this evaluates the footprint at the
    smallest batch block (bb=1), i.e. the best the batch-halving loop in
    `_flow_stack_fwd_impl` can do.  Stacks over `MEGA_VMEM_BUDGET` here
    cannot compile no matter the batch block — callers should fall back
    to the per-layer gated kernel (one layer's weights at a time;
    measured 2.4x over XLA at config[4] sizes, r2 TPU session 1).
    """
    tile = max(FLOW_TILE, TIME_TILE)
    K_in = 2 * C + M
    weights = n_layers * (
        K_in * G * itemsize          # w_in (compute dtype)
        + G * 4                      # b_g (fp32)
        + (G // 2) * (C + S) * itemsize  # w_out
        + (C + S) * 4                # b_rs (fp32)
    )
    history = n_layers * tile * C * itemsize           # bb = 1
    io_blocks = 2 * tile * (C + M + S) * itemsize      # double-buffered
    return weights + history + io_blocks


def mega_fits_vmem(n_layers: int, C: int, G: int, S: int, M: int,
                   itemsize: int) -> bool:
    return (
        mega_vmem_bytes(n_layers, C, G, S, M, itemsize)
        <= MEGA_VMEM_BUDGET
    )


# ===========================================================================
# Training path: Pallas forward-with-activation-save + Pallas backward
# (VERDICT r1 item 2 — the megakernel's VJP used to recompute in pure XLA,
# leaving teacher training at ~27% MFU).
#
# Design: an anti-causal mirror of the forward wavefront.  Time tiles run
# REVERSED (the shifted-operand cotangent flows from x[t+d] back to x[t],
# so each layer keeps a one-tile cotangent history for the EARLIER tile);
# within a tile, layers run reversed with the dx chain carried entirely
# in-register, so the (B,T,G) gate tensor, the activation, and all their
# cotangents never touch HBM.  Because the fp32 weight-grad accumulators
# must stay VMEM-resident across the whole grid, the stack is split into
# layer CHUNKS sized to VMEM (one pallas_call per chunk, top chunk first;
# dx crosses HBM once per chunk boundary instead of once per layer).
# ===========================================================================


def _fwd_save_kernel(x0_ref, cond_ref, w_in_ref, b_g_ref, w_out_ref,
                     b_rs_ref, skip_ref, acts_ref, hist, *,
                     dilations: Sequence[int], C: int, S: int, tile: int,
                     bb: int):
    """Forward identical to `_kernel`, additionally writing each layer's
    INPUT x_l to acts_ref[l] (the residuals the backward needs)."""
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _reset():
        hist[...] = jnp.zeros_like(hist)

    f32 = jnp.float32
    x = x0_ref[...]
    cond_t = cond_ref[...]
    skip_acc = jnp.zeros((bb, tile, S), f32)

    for l, d in enumerate(dilations):
        prev = hist[l]
        hist[l] = x
        acts_ref[l] = x  # save layer input for the backward
        if d == tile:
            shifted = prev
        else:
            shifted = jnp.concatenate(
                [prev[:, tile - d:], x[:, : tile - d]], axis=1
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

    skip_ref[...] = skip_acc.astype(x.dtype)


def _bwd_chunk_kernel(acts_ref, acts_prev_ref, cond_ref, dskip_ref,
                      w_in_ref, b_g_ref, w_out_ref, dx_top_ref,
                      dx_ref, dcond_ref, *rest,
                      dilations: Sequence[int],
                      C: int, S: int, M: int, tile: int, bb: int,
                      n_tiles: int, want_wgrads: bool = True):
    """One (batch-block, reversed-time-tile) grid cell for a CHUNK of
    layers [l0, l1).  `dilations` holds the chunk's per-layer dilations
    (static).  Per cell, layers run reversed with the dx chain carried in
    registers; for each layer:

        recompute  g -> (ta, sb, z)          from saved input acts[l]
        dout = [dx_{l+1} | dskip]
        dz -> (da, db) -> dg -> dcat; dw_out/db_rs/dw_in/db_g accumulate
        dx_l = dx_{l+1} + dcat_x + unshift(dcat_shift) + hist[l]

    `hist[l]` carries the first-d-rows cotangent to the earlier tile
    (anti-causal mirror of the forward wavefront history).
    """
    if want_wgrads:
        dw_in_ref, db_g_ref, dw_out_ref, db_rs_ref, hist = rest
    else:
        # frozen-stack scoring (distillation teacher): only the
        # input/cond cotangents are produced
        (hist,) = rest
    ri = pl.program_id(1)   # reversed tile index: tile = nT-1-ri
    f32 = jnp.float32
    Lc = len(dilations)

    @pl.when(ri == 0)
    def _reset():
        hist[...] = jnp.zeros_like(hist)

    if want_wgrads:
        @pl.when((pl.program_id(0) == 0) & (ri == 0))
        def _init_weight_grads():
            dw_in_ref[...] = jnp.zeros_like(dw_in_ref)
            db_g_ref[...] = jnp.zeros_like(db_g_ref)
            dw_out_ref[...] = jnp.zeros_like(dw_out_ref)
            db_rs_ref[...] = jnp.zeros_like(db_rs_ref)

    dt = acts_ref.dtype
    # the chronologically-first tile has zero causal history; the prev
    # view is index-clamped there, so mask it
    not_first = (ri != n_tiles - 1).astype(dt)
    cond_t = cond_ref[...]
    dskip_t = dskip_ref[...].astype(f32).reshape(bb * tile, S)

    dx = dx_top_ref[...].astype(f32)          # cotangent of x_{l1}
    dcond_acc = jnp.zeros((bb, tile, M), f32)

    for li in range(Lc - 1, -1, -1):
        d = dilations[li]
        x = acts_ref[li]                      # (bb, tile, C) layer input
        prev = acts_prev_ref[li] * not_first

        # ---- forward recompute ----
        if d == tile:
            shifted = prev
        else:
            shifted = jnp.concatenate(
                [prev[:, tile - d:], x[:, : tile - d]], axis=1
            )
        cat2 = jnp.concatenate([x, shifted, cond_t], axis=-1).reshape(
            bb * tile, 2 * C + M
        )
        g = (
            jnp.dot(cat2, w_in_ref[li], preferred_element_type=f32)
            + b_g_ref[li].astype(f32)  # (1, G) row broadcast
        )
        half = g.shape[-1] // 2
        ta = jnp.tanh(g[:, :half])
        sb = jax.nn.sigmoid(g[:, half:])

        # ---- cotangent chain ----
        dout = jnp.concatenate(
            [dx.reshape(bb * tile, C), dskip_t], axis=-1
        ).astype(dt)                           # (bbT, C+S)
        dz = jnp.dot(dout, w_out_ref[li].T,
                     preferred_element_type=f32)
        da = dz * sb * (1.0 - ta * ta)
        db = dz * ta * sb * (1.0 - sb)
        dg = jnp.concatenate([da, db], axis=-1).astype(dt)
        # dcat = dg @ w_in.T, split into the three K_in segments as
        # SEPARATE dots (sublane slices of w_in, offsets multiple of 8).
        # A single dot + lane slices `dcat[..., C:2C]` produces a
        # lane-offset-64 value when C == 64, and Mosaic cannot
        # time-concatenate that against offset-0 zeros: "result/input
        # offset mismatch on non-concat dimension" (the student-width
        # HTTP-500, r2 session 8).  Matmul outputs are always offset-0.
        w_li = w_in_ref[li]
        dcx = jnp.dot(dg, w_li[:C].T, preferred_element_type=f32)
        dcs = jnp.dot(dg, w_li[C: 2 * C].T, preferred_element_type=f32)
        dcc = jnp.dot(dg, w_li[2 * C:].T, preferred_element_type=f32)

        if want_wgrads:
            z = (ta * sb).astype(dt)
            dw_out_ref[li] += jnp.dot(z.T, dout,
                                      preferred_element_type=f32)
            db_rs_ref[li] += jnp.sum(dout.astype(f32), axis=0)
            dw_in_ref[li] += jnp.dot(cat2.T, dg,
                                     preferred_element_type=f32)
            db_g_ref[li] += jnp.sum(dg.astype(f32), axis=0)

        dcs = dcs.reshape(bb, tile, C)  # cotangent into shift(x, d)
        dcond_acc = dcond_acc + dcc.reshape(bb, tile, M)

        # shift(x,d)[t] = x[t-d]: rows [d, tile) act within this tile;
        # rows [0, d) belong to the earlier tile -> stash in hist
        if d == tile:
            within = jnp.zeros_like(dcs)
            stash = dcs
        else:
            within = jnp.concatenate(
                [dcs[:, d:], jnp.zeros_like(dcs[:, :d])], axis=1
            )
            stash = jnp.concatenate(
                [jnp.zeros_like(dcs[:, d:]), dcs[:, :d]], axis=1
            )
        from_later = hist[li].astype(f32)  # zeroed at ri==0 by _reset
        hist[li] = stash.astype(dt)

        dx = dx + dcx.reshape(bb, tile, C) + within + from_later

    dx_ref[...] = dx.astype(dx_ref.dtype)
    dcond_ref[...] = dcond_acc.astype(dcond_ref.dtype)


def _flow_stack_train_fwd_impl(dilations, interpret, x0, cond, w_in, b_g,
                               w_out, b_rs):
    """Pallas forward that also emits the per-layer inputs (L, B, Tp, C)."""
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

    # hist scratch + the acts output block both hold (L, bb, tile, C);
    # bb clamped to MAX_BATCH_BLOCK (bb=8 miscompiles — see above)
    bb = _pick_bb(B, 2 * L * tile * C * x0.dtype.itemsize,
                  _hist_budget_bytes())

    grid = (B // bb, Tp // tile)
    tmap = lambda b, i: (b, i, 0)  # noqa: E731
    amap = lambda b, i: (0, b, i, 0)  # noqa: E731
    full3 = lambda b, i: (0, 0, 0)  # noqa: E731
    full2 = lambda b, i: (0, 0)  # noqa: E731

    skip, acts = pl.pallas_call(
        functools.partial(
            _fwd_save_kernel, dilations=tuple(dilations), C=C, S=S,
            tile=tile, bb=bb,
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
        out_specs=[
            pl.BlockSpec((bb, tile, S), tmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((L, bb, tile, C), amap,
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, Tp, S), dt),
            jax.ShapeDtypeStruct((L, B, Tp, C), dt),
        ],
        scratch_shapes=[pltpu.VMEM((L, bb, tile, C), dt)],
        cost_estimate=pl.CostEstimate(
            flops=2 * B * Tp * L * (K_in * G + (G // 2) * (C + S)),
            bytes_accessed=B * Tp * (2 * C + M + S + L * C)
            * x0.dtype.itemsize,
            transcendentals=B * Tp * L * G,
        ),
        # same raised scoped-VMEM cap as the inference forward and the
        # backward chunks: this call's footprint is strictly LARGER
        # (hist scratch plus the double-buffered (L, bb, tile, C) acts
        # output block), so an experiment layout that clears Mosaic's
        # 16 MB default elsewhere must not crash only here
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(x0, cond, w_in, b_g.astype(jnp.float32), w_out,
      b_rs.astype(jnp.float32))

    if pad:
        return skip[:, :T], acts, pad
    return skip, acts, 0


def _bwd_chunk_layout(L, B, tile, C, M, S, K_in, G, itemsize,
                      want_wgrads=True):
    """Pick (chunk_layers, bb): the largest divisor of L whose fp32
    weight-grad accumulators + weights + activation views + history fit
    the VMEM budget, with the largest batch block that still fits.

    Override with PWN_TPU_BWD_CHUNK="Lc,bb" (layout experiments: the
    Mosaic backend crashed on some shallow-stack layouts, r2 session 5)."""
    forced = os.environ.get("PWN_TPU_BWD_CHUNK")
    if forced:
        lc, bb = (int(v) for v in forced.split(","))
        if L % lc or B % bb or lc < 1 or bb < 1:
            raise ValueError(
                f"PWN_TPU_BWD_CHUNK={forced!r}: chunk_layers must "
                f"divide L={L} and bb must divide B={B} — the grids "
                "floor the division, so a non-divisor layout silently "
                "DROPS layers/batch rows from the backward (wrong "
                "gradients, no error in dx-only mode)"
            )
        return lc, bb
    budget = 10 * 1024 * 1024

    def vmem(Lc, bb):
        dw = Lc * (K_in * G + (G // 2) * (C + S) + G + C + S) * 4 \
            if want_wgrads else 0
        w = Lc * (K_in * G + (G // 2) * (C + S)) * itemsize
        act = 3 * Lc * bb * tile * C * itemsize  # 2 views + hist
        io = bb * tile * (2 * C + 2 * M + S) * 4
        return dw + w + act + io

    divisors = [d for d in range(L, 0, -1) if L % d == 0]
    for Lc in divisors:
        # same bb>4 Mosaic-miscompile clamp as the forward (MAX_BATCH_BLOCK)
        bb = min(B, MAX_BATCH_BLOCK)
        while bb > 1 and vmem(Lc, bb) > budget:
            bb //= 2
        while B % bb:
            bb -= 1
        if vmem(Lc, bb) <= budget:
            return Lc, bb
    return 1, 1


def _flow_stack_train_bwd_impl(dilations, interpret, acts, cond, w_in,
                               b_g, w_out, dskip, want_wgrads=True):
    """Pallas backward: layer-chunked anti-causal wavefront (see header).

    want_wgrads=False is the frozen-stack scoring mode (the distillation
    teacher): only dx/dcond are produced — the dw_out/dw_in accumulation
    dots (~40% of backward MXU work) and their fp32 VMEM accumulators are
    skipped entirely."""
    L, B, Tp, C = acts.shape
    M = cond.shape[-1]
    K_in, G = w_in.shape[1], w_in.shape[2]
    S = w_out.shape[-1] - C
    tile = max(FLOW_TILE, TIME_TILE)
    n_tiles = Tp // tile
    dt = acts.dtype
    cond = cond.astype(dt)
    dskip = dskip.astype(dt)
    w_in = w_in.astype(dt)
    w_out = w_out.astype(dt)
    b_g32 = b_g.astype(jnp.float32)

    Lc, bb = _bwd_chunk_layout(L, B, tile, C, M, S, K_in, G, dt.itemsize,
                               want_wgrads)
    n_chunks = L // Lc

    grid = (B // bb, n_tiles)
    tmap = lambda b, ri: (b, n_tiles - 1 - ri, 0)  # noqa: E731
    full2 = lambda b, ri: (0, 0)  # noqa: E731
    full3 = lambda b, ri: (0, 0, 0)  # noqa: E731

    dx = jnp.zeros((B, Tp, C), dt)  # cotangent of x_L (skip-only output)
    dcond_parts = []
    dw_in_parts, db_g_parts = [], []
    dw_out_parts, db_rs_parts = [], []

    # top chunk first: dx flows downward through chunk boundaries
    for ci in range(n_chunks - 1, -1, -1):
        l0, l1 = ci * Lc, (ci + 1) * Lc
        a_cur = functools.partial(
            lambda ci_, b, ri: (ci_, b, n_tiles - 1 - ri, 0), ci
        )
        a_prev = functools.partial(
            lambda ci_, b, ri: (
                ci_, b, jnp.maximum(n_tiles - 2 - ri, 0), 0
            ),
            ci,
        )
        wmap = functools.partial(lambda ci_, b, ri: (ci_, 0, 0), ci)
        # biases ride as (L, 1, G)-shaped arrays so the (Lc, 1, G) block
        # keeps its last two dims array-equal — a 2-D (Lc, G) block with
        # Lc < L violates Mosaic's (8, 128) block-tiling rule
        bmap = functools.partial(lambda ci_, b, ri: (ci_, 0, 0), ci)

        wg_specs = [
            pl.BlockSpec((Lc, K_in, G), full3, memory_space=pltpu.VMEM),
            pl.BlockSpec((Lc, 1, G), full3, memory_space=pltpu.VMEM),
            pl.BlockSpec((Lc, G // 2, C + S), full3,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Lc, 1, C + S), full3, memory_space=pltpu.VMEM),
        ] if want_wgrads else []
        wg_shapes = [
            jax.ShapeDtypeStruct((Lc, K_in, G), jnp.float32),
            jax.ShapeDtypeStruct((Lc, 1, G), jnp.float32),
            jax.ShapeDtypeStruct((Lc, G // 2, C + S), jnp.float32),
            jax.ShapeDtypeStruct((Lc, 1, C + S), jnp.float32),
        ] if want_wgrads else []
        outs = pl.pallas_call(
            functools.partial(
                _bwd_chunk_kernel, dilations=tuple(dilations[l0:l1]),
                C=C, S=S, M=M, tile=tile, bb=bb, n_tiles=n_tiles,
                want_wgrads=want_wgrads,
            ),
            grid=grid,
            in_specs=[
                pl.BlockSpec((Lc, bb, tile, C), a_cur,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((Lc, bb, tile, C), a_prev,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((bb, tile, M), tmap,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((bb, tile, S), tmap,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((Lc, K_in, G), wmap,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((Lc, 1, G), bmap, memory_space=pltpu.VMEM),
                pl.BlockSpec((Lc, G // 2, C + S), wmap,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((bb, tile, C), tmap,
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((bb, tile, C), tmap,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((bb, tile, M), tmap,
                             memory_space=pltpu.VMEM),
            ] + wg_specs,
            out_shape=[
                jax.ShapeDtypeStruct((B, Tp, C), dt),
                jax.ShapeDtypeStruct((B, Tp, M), dt),
            ] + wg_shapes,
            scratch_shapes=[pltpu.VMEM((Lc, bb, tile, C), dt)],
            cost_estimate=pl.CostEstimate(
                flops=(4 if want_wgrads else 3) * B * Tp * Lc
                * (K_in * G + (G // 2) * (C + S)),
                bytes_accessed=B * Tp * (2 * Lc * C + M + S + 2 * C + M)
                * dt.itemsize,
                transcendentals=B * Tp * Lc * G,
            ),
            # the default 16 MB scoped-vmem cap rejects student-width
            # chunks (19.2 MB scoped at L=10: double-buffered act views
            # + fp32 weight-grad accumulators + the unrolled-loop live
            # set); v5e VMEM is 128 MB — raise the cap like the public
            # splash-attention kernel does (r2 session 8)
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 * 1024 * 1024,
            ),
            interpret=interpret,
        )(acts, acts, cond, dskip, w_in, b_g32[:, None, :], w_out, dx)
        if want_wgrads:
            dx, dcond_c, dw_in_c, db_g_c, dw_out_c, db_rs_c = outs
            dw_in_parts.insert(0, dw_in_c)
            db_g_parts.insert(0, db_g_c[:, 0])
            dw_out_parts.insert(0, dw_out_c)
            db_rs_parts.insert(0, db_rs_c[:, 0])
        else:
            dx, dcond_c = outs
        dcond_parts.append(dcond_c.astype(jnp.float32))

    dcond = sum(dcond_parts).astype(dt)
    if not want_wgrads:
        return dx, dcond
    return (
        dx,
        dcond,
        jnp.concatenate(dw_in_parts, axis=0),
        jnp.concatenate(db_g_parts, axis=0),
        jnp.concatenate(dw_out_parts, axis=0),
        jnp.concatenate(db_rs_parts, axis=0),
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _flow_stack_train(dilations, interpret, x0, cond, w_in, b_g, w_out,
                      b_rs):
    skip, _, _ = _flow_stack_train_fwd_impl(
        dilations, interpret, x0, cond, w_in, b_g, w_out, b_rs
    )
    return skip


def _train_fwd(dilations, interpret, x0, cond, w_in, b_g, w_out, b_rs):
    skip, acts, pad = _flow_stack_train_fwd_impl(
        dilations, interpret, x0, cond, w_in, b_g, w_out, b_rs
    )
    return skip, (acts, cond, w_in, b_g, w_out, pad, x0.shape[1])


def _train_bwd(dilations, interpret, res, dskip):
    acts, cond, w_in, b_g, w_out, pad, T = res
    if pad:
        dskip = jnp.pad(dskip, ((0, 0), (0, pad), (0, 0)))
        cond = jnp.pad(cond, ((0, 0), (0, pad), (0, 0)))
    dx, dcond, dw_in, db_g, dw_out, db_rs = _flow_stack_train_bwd_impl(
        dilations, interpret, acts, cond, w_in, b_g, w_out, dskip
    )
    if pad:
        dx = dx[:, :T]
        dcond = dcond[:, :T]
    return (dx, dcond, dw_in.astype(w_in.dtype), db_g, dw_out.astype(
        w_out.dtype), db_rs)


_flow_stack_train.defvjp(_train_fwd, _train_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _flow_stack_score(dilations, interpret, x0, cond, w_in, b_g, w_out,
                      b_rs):
    skip, _, _ = _flow_stack_train_fwd_impl(
        dilations, interpret, x0, cond, w_in, b_g, w_out, b_rs
    )
    return skip


def _score_fwd(dilations, interpret, x0, cond, w_in, b_g, w_out, b_rs):
    skip, acts, pad = _flow_stack_train_fwd_impl(
        dilations, interpret, x0, cond, w_in, b_g, w_out, b_rs
    )
    return skip, (acts, cond, w_in, b_g, w_out, b_rs, pad, x0.shape[1])


def _score_bwd(dilations, interpret, res, dskip):
    acts, cond, w_in, b_g, w_out, b_rs, pad, T = res
    if pad:
        dskip = jnp.pad(dskip, ((0, 0), (0, pad), (0, 0)))
        cond = jnp.pad(cond, ((0, 0), (0, pad), (0, 0)))
    dx, dcond = _flow_stack_train_bwd_impl(
        dilations, interpret, acts, cond, w_in, b_g, w_out, dskip,
        want_wgrads=False,
    )
    if pad:
        dx = dx[:, :T]
        dcond = dcond[:, :T]
    # the stack is frozen in scoring mode (teacher under stop_gradient):
    # weight cotangents are symbolic zeros, DCE'd downstream
    return (dx, dcond, jnp.zeros_like(w_in), jnp.zeros_like(b_g),
            jnp.zeros_like(w_out), jnp.zeros_like(b_rs))


_flow_stack_score.defvjp(_score_fwd, _score_bwd)


def fused_flow_stack_score(
    x0: jax.Array,
    cond: jax.Array,
    w_in: jax.Array,
    b_g: jax.Array,
    w_out: jax.Array,
    b_rs: jax.Array,
    *,
    dilations: Tuple[int, ...],
    interpret: bool | None = None,
) -> jax.Array:
    """FROZEN-stack forward for probability scoring inside a grad (the
    distillation teacher): same semantics as `fused_flow_stack`, but the
    VJP is the fused Pallas backward restricted to dx/dcond — the
    weight-gradient dots and accumulators are skipped (the params sit
    under stop_gradient, so their cotangents are zeros)."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    return _flow_stack_score(
        tuple(dilations), interpret, x0, cond, w_in, b_g, w_out, b_rs
    )


def fused_flow_stack_train(
    x0: jax.Array,
    cond: jax.Array,
    w_in: jax.Array,
    b_g: jax.Array,
    w_out: jax.Array,
    b_rs: jax.Array,
    *,
    dilations: Tuple[int, ...],
    interpret: bool | None = None,
) -> jax.Array:
    """Training-oriented whole-stack forward: same semantics as
    `fused_flow_stack`, but its VJP is a fused Pallas backward kernel
    instead of an XLA recompute (VERDICT r1 item 2).  The forward
    additionally writes the (L, B, T, C) per-layer inputs to HBM as
    backward residuals."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    return _flow_stack_train(
        tuple(dilations), interpret, x0, cond, w_in, b_g, w_out, b_rs
    )
