"""Student IAF: parallel mel-conditioned waveform synthesis.

Reference parity: `models.py::IAFVocoder` [R] (SURVEY.md §2a, §8 "Student
IAF").  The whole point of the architecture [PW]: z ~ Logistic(0,1)^T is
pushed through a stack of affine inverse-autoregressive flows, each
parameterized by a *causal* WaveNet over the previous z (strictly previous
timesteps — input shifted by one — so the Jacobian is triangular with
diagonal s_i), giving single-pass fully-parallel generation:

    z_i[t] = z_{i-1}[t] * s_i(z_{i-1}[<t], c) + mu_i(z_{i-1}[<t], c)

On TPU this is ONE jit-compiled XLA graph — a few dozen batched GEMMs —
with no sequential loop at all; >100x realtime synthesis comes from here.

The closed-form density
    log p_S(x) = log p_base(z_0) - sum_i log s_i
is returned alongside the sample for the distillation KL (SURVEY.md §8
"Distillation loss").
"""

from __future__ import annotations

from typing import NamedTuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from pwn_tpu.config import Config
from pwn_tpu.models.modules import UpsampleNet, WaveNetStack, resolve_stack_mode
from pwn_tpu.models.teacher import _match_length
from pwn_tpu.ops import mol
from pwn_tpu.ops.conv import shift_right


def sample_base_noise(cfg: Config, key: jax.Array, shape) -> jax.Array:
    """Draw student base noise per `student.base`: Logistic(0,1) (Parallel
    WaveNet default [PW]) or N(0,1) (ClariNet closed-form family).  Shared
    by every generation entry (StudentIAF.generate, the shard_map batch/SP
    paths in parallel/tp.py + parallel/sp.py, streaming in generate.py) so
    sharded and streaming outputs stay bit-comparable with the whole-call
    generate on one key."""
    if cfg.student.base == "gaussian":
        return jax.random.normal(key, shape, jnp.float32)
    return mol.sample_logistic(key, shape)


class StudentOutput(NamedTuple):
    wav: jax.Array        # (B, T) synthesized waveform
    log_det: jax.Array    # (B, T) sum_i log s_i[t]
    log_p_base: jax.Array  # (B, T) base log-density of z_0 (see base)
    mu_last: jax.Array    # (B, T) final flow's mu (diagnostics)
    # (B, T) total affine offset M[t]: the flow chain is elementwise affine
    # in the base noise given the causal context, x[t] = S[t]*z0[t] + M[t]
    # with S = exp(log_det).  The per-timestep output conditional is thus
    # exactly base(mu_total, exp(log_det)) — Logistic for the default
    # base, N for student.base="gaussian" — the closed form direct
    # student training maximizes at the ground truth
    # (training/student_direct.py) and the ClariNet closed-form KL
    # compares against the Gaussian teacher (training/distill.py).
    mu_total: jax.Array

    @property
    def log_p_student(self) -> jax.Array:
        """(B, T) per-sample closed-form student log-density at its own
        sample: log p_S(x) = log p_base(z0) - sum log s."""
        return self.log_p_base - self.log_det


class StudentIAF(nn.Module):
    config: Config
    # see TeacherWaveNet.use_scan
    use_scan: bool = True

    def setup(self):
        sc = self.config.student
        dtype = jnp.dtype(sc.compute_dtype)
        tc = self.config.teacher
        self.upsample = UpsampleNet(
            strides=tc.upsample_strides,
            channels=self.config.dsp.n_mels,
            kernel_mult=tc.upsample_kernel_mult,
            dtype=dtype,
            weight_norm=tc.upsample_weight_norm,
            name="upsample",
        )
        self.flows = [
            WaveNetStack(
                dilations=sc.flow_dilations,
                residual_channels=sc.residual_channels,
                gate_channels=sc.gate_channels,
                skip_channels=sc.skip_channels,
                out_dim=2,
                kernel_size=sc.kernel_size,
                dtype=dtype,
                fused=resolve_stack_mode(sc.fused_layers) == "layer",
                mega=resolve_stack_mode(sc.fused_layers) == "mega",
                mega_train=resolve_stack_mode(sc.fused_layers)
                == "mega_train",
                mega_dx=resolve_stack_mode(sc.fused_layers) == "mega_dx",
                use_scan=self.use_scan,
                name=f"flow_{i}",
            )
            for i in range(sc.n_flows)
        ]

    def __call__(self, z: jax.Array, mel: jax.Array) -> StudentOutput:
        """Transform base noise z (B, T) under mel conditioning (B, F, M)."""
        cond = self.upsample(mel)
        cond = _match_length(cond, z.shape[-1])
        return self.transform(z, cond)

    def transform(self, z: jax.Array, cond: jax.Array) -> StudentOutput:
        clamp = self.config.student.log_scale_clamp
        z = z.astype(jnp.float32)
        if self.config.student.base == "gaussian":
            from pwn_tpu.ops import gaussian

            log_p_base = gaussian.gaussian_log_density(
                z, jnp.zeros_like(z), jnp.zeros_like(z)
            )
        else:
            log_p_base = mol.logistic_log_density(
                z, jnp.zeros_like(z), jnp.zeros_like(z)
            )
        log_det = jnp.zeros_like(z)
        mu = jnp.zeros_like(z)
        mu_total = jnp.zeros_like(z)
        for flow in self.flows:
            # strictly-causal input: flow at t sees z[<t] only
            h = shift_right(z[..., None], 1)
            out = flow(h, cond)  # (B, T, 2) fp32
            mu = out[..., 0]
            log_s = jnp.clip(out[..., 1], -clamp, clamp)
            z = z * jnp.exp(log_s) + mu
            mu_total = mu_total * jnp.exp(log_s) + mu
            log_det = log_det + log_s
        wav = jnp.clip(z, -1.0, 1.0)
        return StudentOutput(wav=wav, log_det=log_det,
                             log_p_base=log_p_base, mu_last=mu,
                             mu_total=mu_total)

    def generate(self, key: jax.Array, mel: jax.Array,
                 temperature: float = 1.0) -> jax.Array:
        """Sample a waveform: one parallel pass (the headline fast path).

        Skips the log-density bookkeeping `transform` carries for the
        distillation loss — synthesis only needs the flow outputs.
        """
        hop = self.config.dsp.hop_length
        B, F = mel.shape[0], mel.shape[1]
        z = sample_base_noise(self.config, key, (B, F * hop)) * temperature
        cond = self.upsample(mel)
        cond = _match_length(cond, z.shape[-1])
        return self.flows_from_z(z, cond)

    def generate_from_z(self, z: jax.Array, mel: jax.Array) -> jax.Array:
        """Synthesis from caller-provided base noise z (B, T).

        The sharded generation paths (parallel/tp.py batch sharding,
        parallel/sp.py overlap-recompute SP) draw the global z outside
        the shard so every shard sees the identical stream."""
        cond = self.upsample(mel)
        cond = _match_length(cond, z.shape[-1])
        return self.flows_from_z(z, cond)

    def upsample_cond(self, mel: jax.Array) -> jax.Array:
        """Just the conditioning upsampler (B, F, M) -> (B, F*hop, M);
        the SP path upsamples per-shard mel windows with frame halos."""
        return self.upsample(mel)

    def flows_from_z(self, z: jax.Array, cond: jax.Array) -> jax.Array:
        """Apply the flow chain to (z, sample-rate cond); shared tail of
        the generate paths."""
        clamp = self.config.student.log_scale_clamp
        for flow in self.flows:
            h = shift_right(z[..., None], 1)
            out = flow(h, cond)
            log_s = jnp.clip(out[..., 1], -clamp, clamp)
            z = z * jnp.exp(log_s) + out[..., 0]
        return jnp.clip(z, -1.0, 1.0)


def make_student(config: Config, use_scan: bool = True) -> StudentIAF:
    return StudentIAF(config=config, use_scan=use_scan)


def init_student(config: Config, rng: jax.Array, use_scan: bool = True):
    model = make_student(config, use_scan=use_scan)
    hop = config.dsp.hop_length
    T = 4 * hop
    z = jnp.zeros((1, T), jnp.float32)
    mel = jnp.zeros((1, T // hop, config.dsp.n_mels), jnp.float32)
    return model, model.init(rng, z, mel)
