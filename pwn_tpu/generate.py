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
) -> np.ndarray:
    model = make_student(cfg)
    wav = model.apply(
        {"params": student_params}, key, mel, method="generate",
        temperature=temperature,
    )
    wav = dsp.deemphasis(wav, cfg.dsp.preemphasis)
    return np.asarray(wav[0])


def generate_teacher(
    cfg: Config,
    teacher_params: Any,
    mel: jax.Array,
    key: jax.Array,
    temperature: float = 1.0,
    ar_backend: str = "scan",
) -> np.ndarray:
    """AR teacher synthesis.

    ar_backend: "scan" (conv-queue lax.scan, default) or "pallas" (the
    whole-loop fused kernel, ops/pallas/ar_sampler.py).  Both ~30-50
    us/step on v5e (within this tunnel's measurement noise of each
    other); the pallas path keeps all weights + queues VMEM-resident so
    it is the one expected to win on larger stacks.
    """
    model = make_teacher(cfg)
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
