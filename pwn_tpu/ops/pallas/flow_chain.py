"""Fully-fused IAF flow step: front 1x1 -> dilated gated stack -> head
-> z-affine update, ONE pallas_call per flow (generation-only).

Round-1 history (BASELINE.md): fusing just the relu/1x1 head into the
flow-stack megakernel REGRESSED 1346x -> 917x because the (bb, TT, 2)
mu/log_s output block wasted 126/128 store lanes.  The fix is to move
the WHOLE per-flow tail inside the kernel: mu/log_s stay in registers,
the z update z' = z*exp(log_s)+mu happens in-kernel, and the only HBM
store is the fully-lane-packed (bb, TT) float32 z' tile.  Compared with
the flow_stack megakernel + XLA glue per flow this also removes the
front 1x1 (+ its shifted-z HBM read), the (bb, T, S) skip write/read,
and the separate head GEMM launches.

One flow per call (not all flows in one kernel): the activation history
scratch scales with layers x batch-block, and fusing all F flows would
shrink the batch block to 1 — measured ~2x slower GEMMs (flow_stack.py
grid notes).  The inter-flow z round-trip is a (B, T) float32 array,
negligible next to the weight traffic.

Causality matches flow_stack: a wavefront over time tiles with per-layer
one-tile input histories.  The strictly causal one-sample shift feeding
the stack (z'[t] depends on z[<=t] via z[t-1]) is precomputed in XLA and
passed as a second input stream.  Requires max(dilations) <= tile.

Reference parity: this computes exactly StudentIAF.flows_from_z's loop
body (models/student.py) — shift_right(z, 1) -> WaveNetStack (front,
gated layers, relu/1x1 head) -> clip(log_s) -> affine update.
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pwn_tpu.ops.pallas.flow_stack import FLOW_TILE
from pwn_tpu.ops.pallas.gated_layer import TIME_TILE


def _kernel(z_ref, zs_ref, cond_ref, wf_ref, bf_ref, w_in_ref, b_g_ref,
            w_out_ref, b_rs_ref, w_h1_ref, b_h1_ref, w_h2_ref, b_h2_ref,
            zout_ref, hist, *, dilations: Sequence[int], C: int,
            S: int, tile: int, bb: int, clamp: float, dt):
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _reset():
        hist[...] = jnp.zeros_like(hist)

    f32 = jnp.float32
    z = z_ref[...]                       # (bb, tile) f32 base/chain noise
    cond_t = cond_ref[...]               # (bb, tile, M) compute dtype

    # strictly causal one-sample shift, computed OUTSIDE the kernel and
    # passed as an input: an in-kernel cross-tile stitch needs a
    # `zhist[:, -1:]` lane slice at offset 127, and Mosaic cannot
    # concatenate mismatched lane offsets on a non-concat dimension
    # (the same "offset mismatch" backend crash as the C=64 backward —
    # r2 session 8).  One extra (B, T) f32 HBM read, negligible next to
    # the resident weights.
    z_shift = zs_ref[...]

    # front 1x1 on the 1-channel shifted z: a broadcast multiply-add,
    # no MXU needed (w_front is (1, C))
    x = (
        z_shift[..., None].astype(dt) * wf_ref[0][None, None, :]
        + bf_ref[0][None, None, :]
    ).astype(dt)                          # (bb, tile, C)

    skip_acc = jnp.zeros((bb, tile, S), f32)
    for l, d in enumerate(dilations):
        prev = hist[l]
        hist[l] = x
        if d == tile:
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
        za = (jnp.tanh(g[:, :half]) * jax.nn.sigmoid(g[:, half:])).astype(
            dt
        )
        out = (
            jnp.dot(za, w_out_ref[l], preferred_element_type=f32)
            + b_rs_ref[l].astype(f32)
        ).reshape(bb, tile, C + S)
        x = x + out[..., :C].astype(dt)
        skip_acc = skip_acc + out[..., C:]

    # head: relu -> S->S 1x1 -> relu -> S->2 1x1 (mu, log_s stay VMEM)
    h = jax.nn.relu(skip_acc.astype(dt))
    h1 = jax.nn.relu(
        jnp.dot(h.reshape(bb * tile, S), w_h1_ref[...],
                preferred_element_type=f32)
        + b_h1_ref[0].astype(f32)
    ).astype(dt)
    out2 = (
        jnp.dot(h1, w_h2_ref[...], preferred_element_type=f32)
        + b_h2_ref[0].astype(f32)
    ).reshape(bb, tile, 2)
    mu = out2[..., 0]
    log_s = jnp.clip(out2[..., 1], -clamp, clamp)
    zout_ref[...] = z * jnp.exp(log_s) + mu


def fused_flow_step(
    z: jax.Array,        # (B, T) float32 chain state
    cond: jax.Array,     # (B, T, M) conditioning (compute dtype)
    w_front: jax.Array,  # (1, C)   front 1x1 kernel (squeezed K dim)
    b_front: jax.Array,  # (C,)
    w_in: jax.Array,     # (L, 2C+M, G) stacked gate weights
    b_g: jax.Array,      # (L, G)
    w_out: jax.Array,    # (L, G/2, C+S)
    b_rs: jax.Array,     # (L, C+S)
    w_h1: jax.Array,     # (S, S)  head1 1x1
    b_h1: jax.Array,     # (S,)
    w_h2: jax.Array,     # (S, 2)  head2 1x1 (mu, log_s)
    b_h2: jax.Array,     # (2,)
    *,
    dilations: Sequence[int],
    clamp: float,
    interpret: bool | None = None,
) -> jax.Array:
    """One IAF flow applied to z under cond; returns z' (B, T) float32."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    B, T = z.shape
    M = cond.shape[-1]
    L, K_in, G = w_in.shape
    S = w_h1.shape[0]
    C = w_out.shape[-1] - S
    tile = max(FLOW_TILE, TIME_TILE)
    if max(dilations) > tile:
        raise ValueError(f"max dilation {max(dilations)} > tile {tile}")
    z = z.astype(jnp.float32)
    z_shift = jnp.pad(z, ((0, 0), (1, 0)))[:, :-1]
    pad = (-T) % tile
    if pad:
        z = jnp.pad(z, ((0, 0), (0, pad)))
        z_shift = jnp.pad(z_shift, ((0, 0), (0, pad)))
        cond = jnp.pad(cond, ((0, 0), (0, pad), (0, 0)))
    Tp = T + pad
    dt = cond.dtype
    w_in = w_in.astype(dt)
    w_out = w_out.astype(dt)
    w_front = w_front.astype(dt)
    b_front = b_front.astype(dt)
    w_h1 = w_h1.astype(dt)
    w_h2 = w_h2.astype(dt)

    # Batch-block sizing.  The (bb, tile) z/z' blocks are 2-D, and
    # Mosaic requires the last two block dims to be (8k, 128k) or equal
    # to the array dims — so bb must stay a multiple of 8 (or be exactly
    # B).  Within that, shrink toward 8 while the per-layer history
    # scratch exceeds the flow-stack kernel's budget.
    hist_budget = 4 * 1024 * 1024
    bb = B
    while (bb % 2 == 0 and (bb // 2) % 8 == 0 and B % (bb // 2) == 0
           and L * bb * tile * C * jnp.dtype(dt).itemsize > hist_budget):
        bb //= 2

    grid = (B // bb, Tp // tile)
    tmap2 = lambda b, i: (b, i)  # noqa: E731
    tmap3 = lambda b, i: (b, i, 0)  # noqa: E731
    full3 = lambda b, i: (0, 0, 0)  # noqa: E731
    full2 = lambda b, i: (0, 0)  # noqa: E731

    zout = pl.pallas_call(
        functools.partial(
            _kernel, dilations=tuple(dilations), C=C, S=S, tile=tile,
            bb=bb, clamp=float(clamp), dt=dt,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bb, tile), tmap2, memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, tile), tmap2, memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, tile, M), tmap3, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), full2, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), full2, memory_space=pltpu.VMEM),
            pl.BlockSpec((L, K_in, G), full3, memory_space=pltpu.VMEM),
            pl.BlockSpec((L, G), full2, memory_space=pltpu.VMEM),
            pl.BlockSpec((L, G // 2, C + S), full3,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((L, C + S), full2, memory_space=pltpu.VMEM),
            pl.BlockSpec((S, S), full2, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S), full2, memory_space=pltpu.VMEM),
            pl.BlockSpec((S, 2), full2, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2), full2, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bb, tile), tmap2,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Tp), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((L, bb, tile, C), dt),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * B * Tp * (L * (K_in * G + (G // 2) * (C + S))
                                + S * S + 2 * S),
            bytes_accessed=B * Tp * (4 + M * jnp.dtype(dt).itemsize + 4),
            transcendentals=B * Tp * (L * G + 1),
        ),
        # raise the 16 MB scoped-vmem default like flow_stack's backward
        # (v5e VMEM is 128 MB; the whole-tail live set + double-buffered
        # streams exceed the default at student sizes — r2 session 9)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(z, z_shift, cond, w_front, b_front[None], w_in,
      b_g.astype(jnp.float32), w_out, b_rs.astype(jnp.float32), w_h1,
      b_h1[None].astype(dt), w_h2, b_h2[None].astype(jnp.float32))

    if pad:
        zout = zout[:, :T]
    return zout


def chain_flows_from_z(
    params,
    z: jax.Array,     # (B, T) float32 base noise
    cond: jax.Array,  # (B, T, M) sample-rate conditioning, compute dtype
    *,
    dilations: Sequence[int],
    clamp: float,
    interpret: bool | None = None,
) -> jax.Array:
    """Fully-fused equivalent of `StudentIAF.flows_from_z`
    (models/student.py): one `fused_flow_step` pallas_call per flow, z
    round-tripping HBM only between flows.  `params` is the student's
    param tree (the scope holding `flow_{i}` subtrees)."""
    flows = sorted(
        (k for k in params if k.startswith("flow_")),
        key=lambda k: int(k.split("_")[1]),
    )
    for k in flows:
        z = fused_flow_step(
            z, cond, **flow_params_from_tree(params[k]),
            dilations=dilations, clamp=clamp, interpret=interpret,
        )
    return jnp.clip(z, -1.0, 1.0)


def flow_params_from_tree(flow_params) -> dict:
    """Extract + stack one flow's kernel operands from its param subtree
    (the `flow_{i}` scope of StudentIAF — front / layer_i / head1 /
    head2, the invariant layout shared with the scan path and
    parallel/tp.py)."""
    layers = sorted(
        (k for k in flow_params if k.startswith("layer_")),
        key=lambda k: int(k.split("_")[1]),
    )
    lps = [flow_params[k] for k in layers]
    w_in = jnp.concatenate(
        [
            jnp.stack([lp["w_dilated"][1] for lp in lps]),
            jnp.stack([lp["w_dilated"][0] for lp in lps]),
            jnp.stack([lp["w_cond"] for lp in lps]),
        ],
        axis=1,
    )
    b_g = jnp.stack([lp["b_dilated"] + lp["b_cond"] for lp in lps])
    w_out = jnp.concatenate(
        [
            jnp.stack([lp["w_res"] for lp in lps]),
            jnp.stack([lp["w_skip"] for lp in lps]),
        ],
        axis=2,
    )
    b_rs = jnp.concatenate(
        [
            jnp.stack([lp["b_res"] for lp in lps]),
            jnp.stack([lp["b_skip"] for lp in lps]),
        ],
        axis=1,
    )
    return dict(
        w_front=flow_params["front"]["kernel"][0],
        b_front=flow_params["front"]["bias"],
        w_in=w_in,
        b_g=b_g,
        w_out=w_out,
        b_rs=b_rs,
        w_h1=flow_params["head1"]["kernel"][0],
        b_h1=flow_params["head1"]["bias"],
        w_h2=flow_params["head2"]["kernel"][0],
        b_h2=flow_params["head2"]["bias"],
    )
