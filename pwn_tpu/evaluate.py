"""Objective evaluation metrics (SURVEY.md §4 integration rows:
"AR-sample and check spectral distance").

The reference had no quantitative eval (listening + TensorBoard curves
only [R]); these metrics make the quality gates testable:

* mel_l2: mean squared distance between normalized mel spectrograms —
  the "mel allclose" gate's graded version (BASELINE.json).
* spectral_convergence / log_spectral_distance: standard copy-synthesis
  fidelity measures on |STFT|.
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp

from pwn_tpu.config import Config
from pwn_tpu.utils import dsp


def mel_l2(cfg: Config, wav_a, wav_b) -> float:
    ma = dsp.mel_spectrogram(jnp.asarray(wav_a), cfg.dsp)
    mb = dsp.mel_spectrogram(jnp.asarray(wav_b), cfg.dsp)
    n = min(ma.shape[-2], mb.shape[-2])
    return float(jnp.mean(jnp.square(ma[..., :n, :] - mb[..., :n, :])))


def spectral_convergence(cfg: Config, wav_ref, wav_gen) -> float:
    a = dsp.stft_magnitude(jnp.asarray(wav_ref), cfg.dsp.n_fft,
                           cfg.dsp.hop_length, cfg.dsp.win_length)
    b = dsp.stft_magnitude(jnp.asarray(wav_gen), cfg.dsp.n_fft,
                           cfg.dsp.hop_length, cfg.dsp.win_length)
    n = min(a.shape[-2], b.shape[-2])
    a, b = a[..., :n, :], b[..., :n, :]
    return float(jnp.linalg.norm(a - b) / jnp.maximum(
        jnp.linalg.norm(a), 1e-8))


def log_spectral_distance(cfg: Config, wav_ref, wav_gen) -> float:
    a = dsp.amp_to_db(dsp.stft_magnitude(
        jnp.asarray(wav_ref), cfg.dsp.n_fft, cfg.dsp.hop_length,
        cfg.dsp.win_length))
    b = dsp.amp_to_db(dsp.stft_magnitude(
        jnp.asarray(wav_gen), cfg.dsp.n_fft, cfg.dsp.hop_length,
        cfg.dsp.win_length))
    n = min(a.shape[-2], b.shape[-2])
    return float(jnp.sqrt(jnp.mean(jnp.square(a[..., :n, :] -
                                              b[..., :n, :]))))


def copy_synthesis_report(cfg: Config, wav_ref, wav_gen) -> Dict[str, float]:
    return {
        "mel_l2": mel_l2(cfg, wav_ref, wav_gen),
        "spectral_convergence": spectral_convergence(cfg, wav_ref, wav_gen),
        "log_spectral_distance_db": log_spectral_distance(
            cfg, wav_ref, wav_gen
        ),
    }
