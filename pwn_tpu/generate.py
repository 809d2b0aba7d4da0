"""Waveform generation entry logic (reference: `generate.py` [R],
SURVEY.md §3.2).

The student path is the headline feature: mel -> waveform in ONE jitted
parallel pass (no sample loop).  The teacher path uses the conv-queue
`lax.scan` fast sampler.  Both consume mel computed on device from a
source waveform (copy-synthesis, as the reference's generate.py did with
held-out utterances).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from pwn_tpu.config import Config
from pwn_tpu.models import sampling
from pwn_tpu.models.student import make_student
from pwn_tpu.models.teacher import make_teacher
from pwn_tpu.utils import dsp


def mel_from_wav(cfg: Config, wav: np.ndarray) -> jax.Array:
    """Host wav (T,) float32 -> conditioning mel (1, F, n_mels)."""
    x = jnp.clip(
        dsp.preemphasis(jnp.asarray(wav)[None], cfg.dsp.preemphasis),
        -1.0, 1.0,
    )
    mel = dsp.mel_spectrogram(x, cfg.dsp)
    return mel[:, : wav.shape[-1] // cfg.dsp.hop_length]


def generate_student(
    cfg: Config,
    student_params: Any,
    mel: jax.Array,
    key: jax.Array,
    temperature: float = 1.0,
    flow_backend: str = "module",
) -> np.ndarray:
    """Single-pass student synthesis.

    flow_backend: "module" (StudentIAF.generate — flow stacks via the
    config's fused_layers mode, heads/z-updates in XLA) or "chain"
    (ops/pallas/flow_chain.py — front+stack+head+z-update fused into ONE
    pallas_call per flow; z is the only inter-flow HBM traffic).
    """
    model = make_student(cfg)
    if flow_backend == "chain":
        wav = student_chain_generate(
            cfg, student_params, mel, key, temperature=temperature
        )
    else:
        wav = model.apply(
            {"params": student_params}, key, mel, method="generate",
            temperature=temperature,
        )
    wav = dsp.deemphasis(wav, cfg.dsp.preemphasis)
    return np.asarray(wav[0])


def student_chain_generate(
    cfg: Config,
    student_params: Any,
    mel: jax.Array,
    key: jax.Array,
    temperature: float = 1.0,
) -> jax.Array:
    """The fused-chain student path: upsample cond via the module, then
    apply every flow with the whole-tail Pallas kernel.  Matches
    `StudentIAF.generate` numerically (same z stream, same math)."""
    from pwn_tpu.models.student import _match_length
    from pwn_tpu.ops import mol
    from pwn_tpu.ops.pallas.flow_chain import chain_flows_from_z

    model = make_student(cfg)
    hop = cfg.dsp.hop_length
    B, F = mel.shape[0], mel.shape[1]
    z = mol.sample_logistic(key, (B, F * hop)) * temperature
    cond = model.apply(
        {"params": student_params}, mel, method="upsample_cond"
    )
    cond = _match_length(cond, z.shape[-1])
    return chain_flows_from_z(
        student_params, z, cond,
        dilations=tuple(cfg.student.flow_dilations),
        clamp=cfg.student.log_scale_clamp,
    )


def generate_teacher(
    cfg: Config,
    teacher_params: Any,
    mel: jax.Array,
    key: jax.Array,
    temperature: float = 1.0,
    ar_backend: str = "auto",
) -> np.ndarray:
    """AR teacher synthesis.

    ar_backend: "auto" (pallas on TPU, scan on CPU), "scan" (conv-queue
    lax.scan) or "pallas" (the whole-loop fused kernel,
    ops/pallas/ar_sampler.py — all weights + conv queues VMEM-resident,
    one kernel launch for the full waveform).  Measured back-to-back on
    v5e (r2 TPU session 3, batch 8): pallas wins at EVERY size —
    5.7 vs 34.8 us/step at teacher_lj (24x128), 10.5 vs 66.7 at 48
    layers, 7.5 vs 30.7 at 256 channels — hence the default.
    """
    model = make_teacher(cfg)
    if ar_backend == "auto":
        ar_backend = (
            "scan" if jax.default_backend() == "cpu" else "pallas"
        )
    if ar_backend == "pallas":
        wav = sampling.fast_sample_pallas(
            model, {"params": teacher_params}, key, mel,
            temperature=temperature,
        )
    else:
        wav = sampling.fast_sample(
            model, {"params": teacher_params}, key, mel,
            temperature=temperature,
        )
    wav = dsp.deemphasis(wav, cfg.dsp.preemphasis)
    return np.asarray(wav[0])
