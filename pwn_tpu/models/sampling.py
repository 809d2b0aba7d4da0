"""Teacher autoregressive sampling: naive reference path and the
Fast-WaveNet conv-queue `lax.scan` path.

This rebuilds the component the reference did NOT have (its student trains
directly; classic WaveNet sampling was a Python sample-by-sample loop in
sibling repos) as required by the north star (BASELINE.json: "replace the
Python sample-by-sample inference loop with ... a lax.scan fast-generation
path using cached conv queues").  Algorithm: Fast WaveNet [P:6]
(arXiv:1611.09482) — O(1) work per emitted sample.

TPU design (SURVEY.md §3.5, §7 "hard parts"):
* the scan body is fully static-shaped: each layer keeps a dense ring
  buffer `(B, dilation_l, C_res)` with modular slot indexing `t % d_l`;
* per-step compute is a fixed chain of small GEMMs `(B, C) x (C, C')` —
  batched utterances keep the MXU fed;
* conditioning is upsampled OUTSIDE the scan; per-layer 1x1 cond
  projections happen inside the step on `(B, n_mels)` slices to avoid
  materializing `(L, T, gate)` in HBM;
* per-step rng = `fold_in(key, t)` so the naive and fast paths draw
  identical randomness and can be tested for exact agreement.
"""

from __future__ import annotations

from typing import Any, Dict, List

import jax
import jax.numpy as jnp

from pwn_tpu.config import Config
from pwn_tpu.models.teacher import TeacherWaveNet, _match_length
from pwn_tpu.ops import gaussian, mol


def _stack_params(variables: Dict[str, Any]) -> Dict[str, Any]:
    return variables["params"]["stack"]


def _layer(p: Dict[str, Any], i: int) -> Dict[str, Any]:
    return p[f"layer_{i}"]


def teacher_cond(
    model: TeacherWaveNet, variables, mel: jax.Array, n_samples: int
) -> jax.Array:
    cond = model.apply(variables, mel, method="condition")
    return _match_length(cond, n_samples)


def mol_sample_from_uniforms(
    params_t: jax.Array,   # (B, 3K)
    u: jax.Array,          # (B, K+1): K gumbel uniforms + 1 logistic
    log_scale_min: float,
    temperature: float,
) -> jax.Array:
    """Deterministic MoL sampling from pre-drawn uniforms.

    Exactly the math of the Pallas AR kernel (ops/pallas/ar_sampler.py) —
    shared so the two paths can be tested for equality on one stream.
    """
    K = params_t.shape[-1] // 3
    logits = params_t[:, :K].astype(jnp.float32)
    means = params_t[:, K : 2 * K].astype(jnp.float32)
    log_s = jnp.maximum(params_t[:, 2 * K :].astype(jnp.float32),
                        log_scale_min)
    gumbel = -jnp.log(-jnp.log(u[:, :K]))
    scores = logits + gumbel
    best = jnp.max(scores, axis=-1, keepdims=True)
    onehot = (scores >= best).astype(jnp.float32)
    onehot = onehot / jnp.sum(onehot, axis=-1, keepdims=True)
    mean = jnp.sum(means * onehot, axis=-1)
    ls = jnp.sum(log_s * onehot, axis=-1)
    ul = u[:, K]
    x = mean + jnp.exp(ls) * temperature * (jnp.log(ul) - jnp.log1p(-ul))
    return jnp.clip(x, -1.0, 1.0)


def draw_uniforms(key: jax.Array, T: int, B: int, K: int) -> jax.Array:
    """The (T, B, K+1) uniform stream shared by both AR backends."""
    return jax.random.uniform(
        key, (T, B, K + 1), minval=1e-5, maxval=1.0 - 1e-5
    )


def draw_normals(key: jax.Array, T: int, B: int) -> jax.Array:
    """The (T, B, 1) N(0,1) stream both AR backends consume for the
    gaussian teacher head (teacher.output="gaussian")."""
    return jax.random.normal(key, (T, B, 1))


def draw_noise(cfg: Config, key: jax.Array, T: int, B: int) -> jax.Array:
    """Pre-drawn per-step noise stream for the configured head."""
    if cfg.teacher.output == "gaussian":
        return draw_normals(key, T, B)
    return draw_uniforms(key, T, B, cfg.teacher.n_mixtures)


def fast_sample(
    model: TeacherWaveNet,
    variables,
    key: jax.Array,
    mel: jax.Array,
    temperature: float = 1.0,
    uniforms: jax.Array | None = None,
) -> jax.Array:
    """AR-sample a waveform (B, F*hop) with cached conv queues.

    Jit-compiled end to end; the sequential dependency is expressed as one
    `lax.scan` whose body XLA compiles once.

    If `uniforms` is given, sampling consumes that pre-drawn stream —
    (T, B, K+1) uniforms via `mol_sample_from_uniforms` for the MoL head,
    (T, B, 1) standard normals via `gaussian.sample_from_normals` for the
    gaussian head (`draw_noise` builds the right one) — bit-comparable
    with the Pallas backend; otherwise per-step randomness is
    fold_in(key, t).
    """
    cfg: Config = model.config
    tc = cfg.teacher
    hop = cfg.dsp.hop_length
    B, F = mel.shape[0], mel.shape[1]
    T = F * hop

    cond = teacher_cond(model, variables, mel, T)  # (B, T, M)
    p = _stack_params(variables)
    dilations = tc.dilations
    L = len(dilations)
    C = tc.residual_channels

    front_k = p["front"]["kernel"][0]  # (1, C)
    front_b = p["front"]["bias"]
    head1_k, head1_b = p["head1"]["kernel"][0], p["head1"]["bias"]
    head2_k, head2_b = p["head2"]["kernel"][0], p["head2"]["bias"]
    layers = []
    for i in range(L):
        lp = _layer(p, i)
        layers.append(
            dict(
                dil_k=lp["w_dilated"],  # (2, C, G)
                dil_b=lp["b_dilated"],
                cond_k=lp["w_cond"],  # (M, G)
                cond_b=lp["b_cond"],
                res_k=lp["w_res"],  # (G/2, C)
                res_b=lp["b_res"],
                skip_k=lp["w_skip"],
                skip_b=lp["b_skip"],
            )
        )

    queues: List[jax.Array] = [
        jnp.zeros((B, d, C), jnp.float32) for d in dilations
    ]
    x0 = jnp.zeros((B,), jnp.float32)

    cond_t_major = jnp.swapaxes(cond, 0, 1)  # (T, B, M)
    ts = jnp.arange(T)
    xs = (ts, cond_t_major)
    if uniforms is not None:
        xs = xs + (uniforms,)

    def step(carry, inp):
        x_prev, qs = carry
        t, cond_t = inp[0], inp[1]
        h = x_prev[:, None] @ front_k + front_b  # (B, C)
        skip = jnp.zeros((B, head1_k.shape[0]), jnp.float32)
        new_qs = []
        for i, lp in enumerate(layers):
            d = dilations[i]
            slot = jax.lax.rem(t, d)
            tap = jax.lax.dynamic_index_in_dim(
                qs[i], slot, axis=1, keepdims=False
            )  # (B, C)
            new_qs.append(
                jax.lax.dynamic_update_index_in_dim(qs[i], h, slot, axis=1)
            )
            g = (
                h @ lp["dil_k"][1]
                + tap @ lp["dil_k"][0]
                + lp["dil_b"]
                + cond_t @ lp["cond_k"]
                + lp["cond_b"]
            )
            a, b = jnp.split(g, 2, axis=-1)
            z = jnp.tanh(a) * jax.nn.sigmoid(b)
            h = h + z @ lp["res_k"] + lp["res_b"]
            skip = skip + z @ lp["skip_k"] + lp["skip_b"]
        hh = jax.nn.relu(skip)
        hh = jax.nn.relu(hh @ head1_k + head1_b)
        params_t = hh @ head2_k + head2_b  # (B, head_dim)
        if uniforms is not None and tc.output == "gaussian":
            x_t = gaussian.sample_from_normals(
                params_t, inp[2][:, 0], tc.log_scale_min, temperature
            )
        elif uniforms is not None:
            x_t = mol_sample_from_uniforms(
                params_t, inp[2], tc.log_scale_min, temperature
            )
        elif tc.output == "gaussian":
            x_t = gaussian.sample_from_gaussian(
                jax.random.fold_in(key, t),
                params_t,
                log_scale_min=tc.log_scale_min,
                temperature=temperature,
            )
        else:
            x_t = mol.sample_from_mol(
                jax.random.fold_in(key, t),
                params_t,
                log_scale_min=tc.log_scale_min,
                temperature=temperature,
            )
        return (x_t, new_qs), x_t

    (_, _), wav_t = jax.lax.scan(step, (x0, queues), xs)
    return jnp.swapaxes(wav_t, 0, 1)  # (B, T)


def fast_sample_pallas(
    model: TeacherWaveNet,
    variables,
    key: jax.Array,
    mel: jax.Array,
    temperature: float = 1.0,
    interpret: bool | None = None,
    weights_dtype: str | None = None,
) -> jax.Array:
    """AR-sample with the whole-loop fused Pallas kernel
    (ops/pallas/ar_sampler.py): conv queues + all stack weights resident
    in VMEM across the full waveform; one kernel launch total.

    `weights_dtype` overrides the VMEM-stored weight dtype (the kernel's
    inner compute is fp32 either way): "float32" removes the bf16
    weight-quantization component of long-horizon feedback drift at the
    cost of doubling the weights' VMEM footprint — measured cost and
    drift effect in BASELINE.md (r4 AR-drift study).
    """
    from pwn_tpu.ops.pallas.ar_sampler import (
        ar_sample_pallas,
        stack_teacher_weights,
    )

    cfg: Config = model.config
    tc = cfg.teacher
    hop = cfg.dsp.hop_length
    B, F = mel.shape[0], mel.shape[1]
    T = F * hop
    if interpret is None:
        interpret = jax.default_backend() == "cpu"

    cond = teacher_cond(model, variables, mel, T)  # (B, T, M)
    noise = draw_noise(cfg, key, T, B)
    weights = stack_teacher_weights(
        _stack_params(variables), tc.n_layers,
        dtype=jnp.dtype(weights_dtype or tc.compute_dtype),
    )
    return ar_sample_pallas(
        cond,
        noise,
        weights,
        dilations=tc.dilations,
        n_mixtures=tc.n_mixtures,
        head=tc.output,
        log_scale_min=tc.log_scale_min,
        temperature=temperature,
        interpret=interpret,
    )


def naive_sample(
    model: TeacherWaveNet,
    variables,
    key: jax.Array,
    mel: jax.Array,
    temperature: float = 1.0,
) -> jax.Array:
    """O(T^2) reference sampler: re-runs the full teacher-forcing pass per
    emitted sample.  Ground truth for `fast_sample` equivalence tests
    (SURVEY.md §4: "conv-queue lax.scan fast path ≡ naive full-recompute").
    Only viable for short T / tiny configs.
    """
    cfg = model.config
    hop = cfg.dsp.hop_length
    B, F = mel.shape[0], mel.shape[1]
    T = F * hop
    cond = teacher_cond(model, variables, mel, T)
    wav = jnp.zeros((B, T), jnp.float32)

    sample_one = (
        gaussian.sample_from_gaussian
        if cfg.teacher.output == "gaussian"
        else mol.sample_from_mol
    )

    @jax.jit
    def one_step(wav, t):
        params = model.apply(variables, wav, cond,
                             method="params_from_cond")
        x_t = sample_one(
            jax.random.fold_in(key, t),
            params[:, t],
            log_scale_min=cfg.teacher.log_scale_min,
            temperature=temperature,
        )
        return wav.at[:, t].set(x_t)

    for t in range(T):
        wav = one_step(wav, t)
    return wav
