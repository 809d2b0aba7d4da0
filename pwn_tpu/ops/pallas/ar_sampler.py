"""Whole-loop Pallas AR sampler: Fast WaveNet as ONE TPU kernel.

The lax.scan AR path (models/sampling.py::fast_sample) already gives O(1)
work per emitted sample, but each scan step is a long chain of small XLA
ops whose issue latency dominates (~35 us/step on v5e).  This kernel
collapses the ENTIRE sampling loop into one `pallas_call` with
`grid=(T,)`:

* TPU grid steps execute SEQUENTIALLY on a core, and scratch buffers
  persist across steps — so the per-layer conv queues (Fast WaveNet ring
  buffers [P:6]) live in VMEM for the whole waveform, packed as one
  (sum_l d_l, B, C) buffer with static per-layer offsets and modular
  slot indexing t % d_l;
* the stacked layer weights (~6 MB bf16 for the 24-layer teacher) are
  VMEM-resident for the whole loop — zero HBM weight traffic per step;
* per-step conditioning (1, B, M) and the per-step output (1, B) are
  streamed by the Pallas pipeline (double-buffered HBM<->VMEM);
* sampling consumes PRE-DRAWN uniforms (T, B, K+1) — K for the
  Gumbel-max mixture choice, one for the logistic inverse-CDF — so the
  kernel is deterministic given the uniforms and testable bit-for-bit
  against a pure-XLA reference consuming the same stream.

Per step: front 1x1 -> L x [queue pop/push; one (B, 2C+M)x(2C+M, G) gate
GEMM on concat(x, tap, cond); gated unit; one (B, G/2)x(G/2, C+S) output
GEMM] -> relu/1x1 head -> MoL Gumbel-max + logistic sample -> feeds step
t+1 through the x_prev scratch.

Two output heads share the loop (static `head` switch; the trunk math is
identical): "mol" consumes (T, B, K+1) uniforms (K Gumbel-max + 1
logistic inverse-CDF draw), "gaussian" (teacher.output="gaussian",
ClariNet family — ops/gaussian.py) consumes (T, B, 1) pre-drawn standard
normals and emits mu + exp(log_s)*temperature*eps.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(
    # streamed inputs
    cond_ref,      # (1, B, M) block for step t
    unif_ref,      # (1, B, K+1) block for step t
    # VMEM-resident weights
    front_k_ref,   # (1, C)
    front_b_ref,   # (1, C)
    w_in_ref,      # (L, 2C+M, G)
    b_g_ref,       # (L, G)
    w_out_ref,     # (L, G/2, C+S)
    b_rs_ref,      # (L, C+S)
    head1_k_ref,   # (S, S)
    head1_b_ref,   # (1, S)
    head2_k_ref,   # (S, head_dim): 3K mol / 2 gaussian
    head2_b_ref,   # (1, head_dim)
    # output
    wav_ref,       # (1, 1, B) — trailing two dims match the full array
    # scratch
    queue,         # (sum_d, B, C) VMEM
    x_prev,        # (B, 1) VMEM
    *,
    dilations: Sequence[int],
    offsets: Sequence[int],
    C: int,
    S: int,
    K: int,
    head: str,
    log_scale_min: float,
    temperature: float,
):
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _init():
        queue[...] = jnp.zeros_like(queue)
        x_prev[...] = jnp.zeros_like(x_prev)

    f32 = jnp.float32
    # NOTE on dtype: compute is f32 over bf16-STORED weights.  An all-bf16
    # variant was measured SLOWER (51.5 vs 28.8 us/step on v5e): at B=8
    # rows the bf16 (16, 128) min tile doubles sublane padding and the
    # extra casts outweigh any MXU-pass savings on these tiny dots.
    cond_t = cond_ref[0].astype(f32)          # (B, M)
    x = (
        jnp.dot(x_prev[:], front_k_ref[:].astype(f32),
                preferred_element_type=f32)
        + front_b_ref[0].astype(f32)
    )  # (B, C)

    B = x.shape[0]
    skip_sum = jnp.zeros((B, S), f32)
    for layer, d in enumerate(dilations):
        slot = offsets[layer] + jax.lax.rem(t, d)
        tap = queue[pl.ds(slot, 1)][0].astype(f32)     # (B, C)
        queue[pl.ds(slot, 1)] = x[None].astype(queue.dtype)
        cat = jnp.concatenate([x, tap, cond_t], axis=-1)  # (B, 2C+M)
        g = (
            jnp.dot(cat, w_in_ref[layer].astype(f32),
                    preferred_element_type=f32)
            + b_g_ref[layer].astype(f32)
        )
        half = g.shape[-1] // 2
        z = jnp.tanh(g[:, :half]) * jax.nn.sigmoid(g[:, half:])
        out = (
            jnp.dot(z, w_out_ref[layer].astype(f32),
                    preferred_element_type=f32)
            + b_rs_ref[layer].astype(f32)
        )
        x = x + out[:, :C]
        skip_sum = skip_sum + out[:, C:]

    h = jnp.maximum(skip_sum, 0.0)
    h = jnp.maximum(
        jnp.dot(h, head1_k_ref[:].astype(f32), preferred_element_type=f32)
        + head1_b_ref[0].astype(f32),
        0.0,
    )
    head_p = (
        jnp.dot(h, head2_k_ref[:].astype(f32), preferred_element_type=f32)
        + head2_b_ref[0].astype(f32)
    )  # (B, head_dim)

    u = unif_ref[0].astype(f32)  # (B, K+1) uniforms / (B, 1) normals
    if head == "gaussian":
        # single-Gaussian head (ops/gaussian.py::sample_from_normals):
        # the stream carries pre-drawn standard normals
        mean = head_p[:, 0]
        ls = jnp.maximum(head_p[:, 1], log_scale_min)
        x_t = mean + jnp.exp(ls) * temperature * u[:, 0]
    else:
        logits = head_p[:, :K]
        means = head_p[:, K : 2 * K]
        log_s = jnp.maximum(head_p[:, 2 * K :], log_scale_min)

        gumbel = -jnp.log(-jnp.log(u[:, :K]))
        scores = logits + gumbel
        best = jnp.max(scores, axis=-1, keepdims=True)
        onehot = (scores >= best).astype(f32)
        # guard against (measure-zero) ties: renormalize the indicator
        onehot = onehot / jnp.sum(onehot, axis=-1, keepdims=True)
        mean = jnp.sum(means * onehot, axis=-1)
        ls = jnp.sum(log_s * onehot, axis=-1)

        ul = u[:, K]
        x_t = mean + jnp.exp(ls) * temperature * (
            jnp.log(ul) - jnp.log1p(-ul)
        )
    x_t = jnp.clip(x_t, -1.0, 1.0)

    wav_ref[0, 0] = x_t
    x_prev[...] = x_t[:, None]


def stack_teacher_weights(stack_params: Dict[str, Any], n_layers: int,
                          dtype=jnp.bfloat16):
    """Pack the teacher stack's per-layer params into the kernel's
    stacked layout.  Gate operand order matches the kernel's concat:
    [x_now, tap, cond]."""
    p = stack_params
    layers = [p[f"layer_{i}"] for i in range(n_layers)]
    w_in = jnp.stack(
        [
            jnp.concatenate(
                [lp["w_dilated"][1], lp["w_dilated"][0], lp["w_cond"]],
                axis=0,
            )
            for lp in layers
        ]
    ).astype(dtype)
    b_g = jnp.stack(
        [lp["b_dilated"] + lp["b_cond"] for lp in layers]
    ).astype(jnp.float32)
    w_out = jnp.stack(
        [
            jnp.concatenate([lp["w_res"], lp["w_skip"]], axis=1)
            for lp in layers
        ]
    ).astype(dtype)
    b_rs = jnp.stack(
        [jnp.concatenate([lp["b_res"], lp["b_skip"]]) for lp in layers]
    ).astype(jnp.float32)
    return dict(
        front_k=p["front"]["kernel"][0].astype(dtype),
        front_b=p["front"]["bias"][None].astype(jnp.float32),
        w_in=w_in,
        b_g=b_g,
        w_out=w_out,
        b_rs=b_rs,
        head1_k=p["head1"]["kernel"][0].astype(dtype),
        head1_b=p["head1"]["bias"][None].astype(jnp.float32),
        head2_k=p["head2"]["kernel"][0].astype(dtype),
        head2_b=p["head2"]["bias"][None].astype(jnp.float32),
    )


@functools.partial(
    jax.jit,
    static_argnames=("dilations", "n_mixtures", "head", "log_scale_min",
                     "temperature", "interpret"),
)
def ar_sample_pallas(
    cond: jax.Array,       # (B, T, M) upsampled conditioning
    uniforms: jax.Array,   # (T, B, K+1) uniforms / (T, B, 1) normals
    weights: Dict[str, jax.Array],  # from stack_teacher_weights
    *,
    dilations: tuple,
    n_mixtures: int,
    head: str = "mol",
    log_scale_min: float = -9.0,
    temperature: float = 1.0,
    interpret: bool = False,
) -> jax.Array:
    """Run the fused AR loop; returns wav (B, T) float32."""
    B, T, M = cond.shape
    C = weights["front_k"].shape[-1]
    S = weights["head1_k"].shape[0]
    K = n_mixtures
    offsets = tuple(np.cumsum([0] + list(dilations))[:-1].tolist())
    sum_d = int(np.sum(dilations))

    cond_t = jnp.swapaxes(cond, 0, 1)  # (T, B, M)

    grid = (T,)
    step_map = lambda t: (t, 0, 0)  # noqa: E731
    full2 = lambda t: (0, 0)  # noqa: E731
    full3 = lambda t: (0, 0, 0)  # noqa: E731

    wav_t = pl.pallas_call(
        functools.partial(
            _kernel,
            dilations=tuple(dilations),
            offsets=offsets,
            C=C,
            S=S,
            K=K,
            head=head,
            log_scale_min=log_scale_min,
            temperature=temperature,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, B, M), step_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B, uniforms.shape[-1]), step_map,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(weights["front_k"].shape, full2,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(weights["front_b"].shape, full2,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(weights["w_in"].shape, full3,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(weights["b_g"].shape, full2,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(weights["w_out"].shape, full3,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(weights["b_rs"].shape, full2,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(weights["head1_k"].shape, full2,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(weights["head1_b"].shape, full2,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(weights["head2_k"].shape, full2,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(weights["head2_b"].shape, full2,
                         memory_space=pltpu.VMEM),
        ],
        # block (1, 1, B): Mosaic requires the last two block dims to be
        # tile-divisible OR equal to the array dims — (1, B) qualifies.
        out_specs=pl.BlockSpec((1, 1, B), lambda t: (t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, 1, B), jnp.float32),
        scratch_shapes=[
            # f32 queue: bf16 queue storage measured slower (extra casts
            # in the serial path at tiny B)
            pltpu.VMEM((sum_d, B, C), jnp.float32),
            pltpu.VMEM((B, 1), jnp.float32),
        ],
        interpret=interpret,
    )(
        cond_t,
        uniforms,
        weights["front_k"],
        weights["front_b"],
        weights["w_in"],
        weights["b_g"],
        weights["w_out"],
        weights["b_rs"],
        weights["head1_k"],
        weights["head1_b"],
        weights["head2_k"],
        weights["head2_b"],
    )
    return jnp.swapaxes(wav_t[:, 0, :], 0, 1)
