"""Teacher WaveNet: autoregressive mel-conditioned model with MoL head.

Reference parity: the AR density model the reference's student is meant to
be distilled from (`models.py` [R]; SURVEY.md §8 "Teacher").  Training is a
single full-parallel teacher-forcing pass (all timesteps at once — one big
batched conv stack on the MXU); only sampling is sequential, and that lives
in models/sampling.py (naive + Fast-WaveNet conv-queue scan paths).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from pwn_tpu.config import Config
from pwn_tpu.models.modules import (
    UpsampleNet,
    WaveNetStack,
    resolve_stack_mode,
    shift_right_scalar,
)
from pwn_tpu.ops import mol


class TeacherWaveNet(nn.Module):
    """p(x_t | x_<t, mel) with a discretized-MoL head (default) or a
    single-Gaussian head (`teacher.output="gaussian"`, ClariNet-style —
    enables the closed-form distillation KL, ops/gaussian.py).

    __call__(wav, mel) runs the teacher-forcing pass and returns per-step
    head params (B, T, head_dim: 3*n_mixtures MoL or 2 Gaussian);
    `condition(mel)` exposes the upsampled conditioning for the AR
    sampling loop.
    """

    config: Config
    # scan-stack forward for inference; training steps build the model
    # with use_scan=False (faster unrolled backward) — same param tree.
    use_scan: bool = True

    def setup(self):
        tc = self.config.teacher
        dtype = jnp.dtype(tc.compute_dtype)
        self.upsample = UpsampleNet(
            strides=tc.upsample_strides,
            channels=self.config.dsp.n_mels,
            kernel_mult=tc.upsample_kernel_mult,
            dtype=dtype,
            weight_norm=tc.upsample_weight_norm,
            name="upsample",
        )
        self.stack = WaveNetStack(
            dilations=tc.dilations,
            residual_channels=tc.residual_channels,
            gate_channels=tc.gate_channels,
            skip_channels=tc.skip_channels,
            out_dim=tc.head_dim,
            kernel_size=tc.kernel_size,
            dtype=dtype,
            fused=resolve_stack_mode(tc.fused_layers) == "layer",
            mega=resolve_stack_mode(tc.fused_layers) == "mega",
            mega_train=resolve_stack_mode(tc.fused_layers) == "mega_train",
            mega_dx=resolve_stack_mode(tc.fused_layers) == "mega_dx",
            use_scan=self.use_scan,
            name="stack",
        )

    def condition(self, mel: jax.Array) -> jax.Array:
        """(B, F, n_mels) mel frames -> (B, F*hop, n_mels) per-sample cond."""
        return self.upsample(mel)

    def params_from_cond(self, wav: jax.Array, cond: jax.Array) -> jax.Array:
        """Teacher-forcing pass given precomputed conditioning.

        wav (B, T) in [-1,1]; cond (B, T, n_mels). Returns MoL params
        (B, T, 3K) — params[t] models x[t] given x[<t].
        """
        x_prev = shift_right_scalar(wav)
        return self.stack(x_prev, cond)

    def __call__(self, wav: jax.Array, mel: jax.Array) -> jax.Array:
        cond = self.condition(mel)
        cond = _match_length(cond, wav.shape[-1])
        return self.params_from_cond(wav, cond)

    def loss(self, wav: jax.Array, mel: jax.Array) -> jax.Array:
        """Mean teacher-forcing NLL (nats/sample), fp32: discretized MoL
        or continuous single-Gaussian per `teacher.output`."""
        params = self(wav, mel)
        tc = self.config.teacher
        if tc.output == "gaussian":
            from pwn_tpu.ops import gaussian

            return gaussian.gaussian_nll(
                wav, params, log_scale_min=tc.log_scale_min
            )
        return mol.discretized_mol_loss(
            wav, params, log_scale_min=tc.log_scale_min
        )


def _match_length(cond: jax.Array, T: int) -> jax.Array:
    """Crop/pad upsampled conditioning to exactly T samples.

    With centered STFT there are T//hop + 1 frames; the model consumes
    T//hop frames upsampled by hop (== T).  Any residual mismatch is
    clipped here so all shapes stay static under jit.
    """
    Tc = cond.shape[1]
    if Tc == T:
        return cond
    if Tc > T:
        return cond[:, :T]
    return jnp.pad(cond, ((0, 0), (0, T - Tc), (0, 0)), mode="edge")


def make_teacher(config: Config, use_scan: bool = True) -> TeacherWaveNet:
    return TeacherWaveNet(config=config, use_scan=use_scan)


def init_teacher(config: Config, rng: jax.Array, use_scan: bool = True):
    """Initialize teacher params on tiny shapes (shape-polymorphic convs)."""
    model = make_teacher(config, use_scan=use_scan)
    hop = config.dsp.hop_length
    T = 4 * hop
    wav = jnp.zeros((1, T), jnp.float32)
    mel = jnp.zeros((1, T // hop, config.dsp.n_mels), jnp.float32)
    return model, model.init(rng, wav, mel)
