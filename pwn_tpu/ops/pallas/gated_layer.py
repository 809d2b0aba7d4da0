"""Fused Pallas TPU kernel for the WaveNet gated residual layer.

The north-star requirement (BASELINE.json: "a fused Pallas dilated-conv
kernel"): one kernel computes, per (batch, time-tile) grid cell,

    g      = x @ W_now + shift(x, d) @ W_tap + cond @ W_cond + b
    z      = tanh(g[..., :G/2]) * sigmoid(g[..., G/2:])
    res    = x + z @ W_res + b_res
    skip   =     z @ W_skip + b_skip

entirely in VMEM.  The XLA path materializes the (B, T, G) gate tensor and
the (B, T, G/2) activation in HBM between matmuls; at bf16 with G=256 that
is ~5x the layer's unavoidable traffic — this kernel's win is HBM bandwidth,
the usual TPU bottleneck.

Dilation handling without gather: the shifted operand shift(x, d)[t] =
x[t-d] for a time-tile [t0, t0+TT) lives in blocks i-1 and i of x when
d <= TT.  The kernel therefore receives TWO views of x (block i and block
i-1, via a second BlockSpec whose index_map is max(i-1, 0)), concatenates
and statically slices them (d is a compile-time constant), and masks the
first d global rows to zero (causal left padding).

MXU notes: all five matmuls are (TT, C)x(C, G)-shaped with TT=512 rows —
well-tiled for the 128x128 systolic array; accumulation in fp32 via
preferred_element_type; inputs/outputs in the model compute dtype (bf16).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Time-tile length. Must be >= the largest dilation in any config
# (student large: 512) and a multiple of the fp32/bf16 sublane tile.
TIME_TILE = 512


def _kernel(x_ref, x_prev_ref, cond_ref, w_in_ref, b_g_ref, w_out_ref,
            b_out_ref, res_ref, skip_ref, *, dilation: int, tile: int,
            C: int):
    """One (batch, time-tile) grid cell.

    MXU shape engineering: instead of 3 skinny gate GEMMs (contraction
    C=64 wastes half the 128-wide systolic array), the kernel builds the
    lane-concatenated operand [x | shift(x,d) | cond] (TT, 2C+M) in VMEM
    and issues ONE wide-contraction GEMM against the row-stacked weights
    [W_now; W_tap; W_cond] (2C+M, G).  Same trick on the way out:
    z @ [W_res | W_skip] (G/2, C+S) in one GEMM.
    """
    i = pl.program_id(1)  # time-tile index

    x = x_ref[0]            # (TT, C)
    x_prev = x_prev_ref[0]  # (TT, C) — block i-1 (block 0 again when i==0)
    cond = cond_ref[0]      # (TT, M)

    # shift(x, d) rows for this tile: last d rows of block i-1, then the
    # first TT-d rows of block i.  Static d -> static slice.  d == TT
    # needs a special case: Mosaic rejects the 0-length slice x[:0].
    if dilation == tile:
        shifted = x_prev
    else:
        shifted = jnp.concatenate(
            [x_prev[tile - dilation :], x[: tile - dilation]], axis=0
        )
    # zero rows with global index t < d (causal left padding); only block
    # 0 can contain such rows (d <= TT); the mask is cheap VPU work.
    t_global = (
        i * tile + jax.lax.broadcasted_iota(jnp.int32, (tile, 1), 0)
    )
    shifted = jnp.where(t_global >= dilation, shifted,
                        jnp.zeros_like(shifted))

    cat = jnp.concatenate([x, shifted, cond], axis=-1)  # (TT, 2C+M)
    g = (
        jnp.dot(cat, w_in_ref[:], preferred_element_type=jnp.float32)
        + b_g_ref[0].astype(jnp.float32)
    )
    half = g.shape[-1] // 2
    z = (jnp.tanh(g[:, :half]) * jax.nn.sigmoid(g[:, half:])).astype(x.dtype)

    out = (
        jnp.dot(z, w_out_ref[:], preferred_element_type=jnp.float32)
        + b_out_ref[0].astype(jnp.float32)
    ).astype(x.dtype)
    res_ref[0] = x + out[:, :C]
    skip_ref[0] = out[:, C:]


def _fused_forward(
    x: jax.Array,        # (B, T, C) residual-path activations
    cond: jax.Array,     # (B, T, M) upsampled conditioning
    w_dilated: jax.Array,  # (2, C, G): [0]=tap (t-d), [1]=now (t)
    b_dilated: jax.Array,  # (G,)
    w_cond: jax.Array,   # (M, G)
    b_cond: jax.Array,   # (G,)
    w_res: jax.Array,    # (G/2, C)
    b_res: jax.Array,    # (C,)
    w_skip: jax.Array,   # (G/2, S)
    b_skip: jax.Array,   # (S,)
    *,
    dilation: int,
    interpret: bool = False,
):
    """Fused layer forward. Returns (residual_out (B,T,C), skip (B,T,S)).

    Falls back to the caller's XLA path for d > TIME_TILE (none of the
    baseline configs exceed 512).  T is padded to a TIME_TILE multiple
    internally; inputs may be any length.
    """
    if dilation > TIME_TILE:
        raise ValueError(
            f"dilation {dilation} > TIME_TILE {TIME_TILE}; use the XLA path"
        )
    B, T, C = x.shape
    M = cond.shape[-1]
    G = w_dilated.shape[-1]
    S = w_skip.shape[-1]
    tile = TIME_TILE

    pad = (-T) % tile
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
        cond = jnp.pad(cond, ((0, 0), (0, pad), (0, 0)))
    Tp = T + pad
    n_tiles = Tp // tile

    dtype = x.dtype
    cond = cond.astype(dtype)
    # stacked weights for the two wide GEMMs (see _kernel docstring):
    # gate input order must match the kernel's concat: [x, shifted, cond]
    w_in = jnp.concatenate(
        [w_dilated[1], w_dilated[0], w_cond], axis=0
    ).astype(dtype)  # (2C+M, G)
    b_g = (b_dilated + b_cond).astype(jnp.float32)
    w_out = jnp.concatenate([w_res, w_skip], axis=1).astype(dtype)
    b_out = jnp.concatenate([b_res, b_skip]).astype(jnp.float32)

    grid = (B, n_tiles)

    def xmap(b, i):
        return (b, i, 0)

    def xmap_prev(b, i):
        return (b, jnp.maximum(i - 1, 0), 0)

    full = lambda *_: (0, 0)  # noqa: E731  (whole-array weight specs)

    res, skip = pl.pallas_call(
        functools.partial(_kernel, dilation=dilation, tile=tile, C=C),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tile, C), xmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, C), xmap_prev, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, M), xmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * C + M, G), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, G), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((G // 2, C + S), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C + S), full, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, tile, C), xmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, S), xmap, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, Tp, C), dtype),
            jax.ShapeDtypeStruct((B, Tp, S), dtype),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * B * Tp * (C * G * 2 + M * G + (G // 2) * (C + S)),
            bytes_accessed=B * Tp * (2 * C + M + C + S) * x.dtype.itemsize,
            transcendentals=B * Tp * G,
        ),
        interpret=interpret,
    )(x, x, cond, w_in, b_g[None, :], w_out, b_out[None, :])

    if pad:
        res = res[:, :T]
        skip = skip[:, :T]
    return res, skip


# ---------------------------------------------------------------------------
# Differentiable public API: Pallas forward + XLA-recompute backward.
#
# Pallas kernels are not auto-differentiable; the backward pass recomputes
# the gate activations with plain XLA ops (same rematerialization XLA's own
# fusion would do) and accumulates parameter gradients as large einsums on
# the MXU.  This keeps the fused forward usable inside jax.grad (teacher
# training, distillation) — pattern per the pallas guide "Custom VJP".
# ---------------------------------------------------------------------------


def _shift_left(v: jax.Array, d: int) -> jax.Array:
    """adjoint of shift_right: out[t] = v[t+d], zero-filled at the end."""
    if d == 0:
        return v
    return jnp.pad(v[:, d:], ((0, 0), (0, d), (0, 0)))


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _fused(dilation, interpret, x, cond, w_dilated, b_dilated, w_cond,
           b_cond, w_res, b_res, w_skip, b_skip):
    return _fused_forward(
        x, cond, w_dilated, b_dilated, w_cond, b_cond, w_res, b_res,
        w_skip, b_skip, dilation=dilation, interpret=interpret,
    )


def _fused_fwd(dilation, interpret, *args):
    out = _fused(dilation, interpret, *args)
    return out, args


def _fused_bwd(dilation, interpret, residuals, cots):
    from pwn_tpu.ops.conv import shift_right

    (x, cond, w_dilated, b_dilated, w_cond, b_cond, w_res, b_res, w_skip,
     b_skip) = residuals
    dres, dskip = cots

    f32 = jnp.float32
    xf = x.astype(f32)
    condf = cond.astype(f32)
    dres = dres.astype(f32)
    dskip = dskip.astype(f32)
    w_tap = w_dilated[0].astype(f32)
    w_now = w_dilated[1].astype(f32)

    shifted = shift_right(xf, dilation)
    g = (
        jnp.einsum("btc,cg->btg", xf, w_now)
        + jnp.einsum("btc,cg->btg", shifted, w_tap)
        + jnp.einsum("btm,mg->btg", condf, w_cond.astype(f32))
        + (b_dilated + b_cond).astype(f32)
    )
    a, b_ = jnp.split(g, 2, axis=-1)
    ta = jnp.tanh(a)
    sb = jax.nn.sigmoid(b_)
    z = ta * sb

    dz = (
        jnp.einsum("btc,gc->btg", dres, w_res.astype(f32))
        + jnp.einsum("bts,gs->btg", dskip, w_skip.astype(f32))
    )
    dw_res = jnp.einsum("btg,btc->gc", z, dres)
    db_res = jnp.sum(dres, axis=(0, 1))
    dw_skip = jnp.einsum("btg,bts->gs", z, dskip)
    db_skip = jnp.sum(dskip, axis=(0, 1))

    da = dz * sb * (1.0 - ta * ta)
    db_gate = dz * ta * sb * (1.0 - sb)
    dg = jnp.concatenate([da, db_gate], axis=-1)

    dx = (
        dres
        + jnp.einsum("btg,cg->btc", dg, w_now)
        + _shift_left(jnp.einsum("btg,cg->btc", dg, w_tap), dilation)
    )
    dcond = jnp.einsum("btg,mg->btm", dg, w_cond.astype(f32))
    dw_now = jnp.einsum("btc,btg->cg", xf, dg)
    dw_tap = jnp.einsum("btc,btg->cg", shifted, dg)
    dw_dilated = jnp.stack([dw_tap, dw_now])
    db_dilated = jnp.sum(dg, axis=(0, 1))

    def cast(v, ref):
        return v.astype(ref.dtype)

    return (
        cast(dx, x),
        cast(dcond, cond),
        cast(dw_dilated, w_dilated),
        cast(db_dilated, b_dilated),
        cast(jnp.einsum("btm,btg->mg", condf, dg), w_cond),
        cast(db_dilated, b_cond),
        cast(dw_res, w_res),
        cast(db_res, b_res),
        cast(dw_skip, w_skip),
        cast(db_skip, b_skip),
    )


_fused.defvjp(_fused_fwd, _fused_bwd)


def fused_gated_residual(
    x, cond, w_dilated, b_dilated, w_cond, b_cond, w_res, b_res, w_skip,
    b_skip, *, dilation: int, interpret: bool | None = None,
):
    """Differentiable fused gated-residual layer (see module docstring).

    interpret=None auto-selects interpreter mode off-TPU so the same code
    path is unit-testable on the CPU CI mesh.
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    return _fused(
        dilation, interpret, x, cond, w_dilated, b_dilated, w_cond, b_cond,
        w_res, b_res, w_skip, b_skip,
    )
