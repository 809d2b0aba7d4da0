"""Sequence-parallel (SP/CP) waveform synthesis (SURVEY.md §5
"long-context": the conv analogue of context parallelism; §2c SP row).

There is no attention anywhere in the model — every op is either
pointwise or a dilated conv with receptive field Σ(k−1)·d of a few
thousand samples — so "context parallelism" reduces to sharding the TIME
axis across devices and exchanging (k−1)·d = d boundary samples per
layer.  We express this purely through shardings: the time dimension of
z / conditioning is sharded over the `data` mesh axis and every
`shift_right` (pad+slice) on a time-sharded array lowers to the halo
`ppermute` XLA's SPMD partitioner derives automatically — no manual
collectives, per the mesh-and-annotate recipe.

This makes single-utterance synthesis scale across chips: minutes of
audio in one jit call with per-chip HBM holding only T/n_chips samples.
Weights stay replicated (they are small); batch stays unsharded so the
full `data` axis is available for time.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pwn_tpu.config import Config
from pwn_tpu.models.student import StudentIAF


def validate_sp(cfg: Config, mesh: Mesh, n_frames: int) -> None:
    """SP correctness precondition: per-shard sample count must cover the
    largest dilation.  GSPMD's halo exchange for a shifted slice reaches
    ONE neighbor shard; a shift larger than the shard silently drops the
    far taps (verified empirically on the CPU mesh — wrong values, no
    error), so we refuse instead.
    """
    n = mesh.shape["data"]
    if n_frames % n:
        raise ValueError(
            f"frames {n_frames} not divisible by data axis {n}"
        )
    shard_samples = n_frames * cfg.dsp.hop_length // n
    max_dil = max(cfg.student.flow_dilations)
    if shard_samples < max_dil:
        raise ValueError(
            f"sequence-parallel shard of {shard_samples} samples is "
            f"smaller than the max dilation {max_dil}; use >= "
            f"{max_dil * n // cfg.dsp.hop_length} frames or fewer shards"
        )


def make_sp_generate(student: StudentIAF, cfg: Config, mesh: Mesh):
    """`(variables, key, mel) -> wav` with time sharded over `data`.

    mel: (B, F, n_mels) with F sharded; returns (B, F*hop) with T
    sharded the same way.  F must be divisible by the data-axis size and
    long enough that each shard covers the receptive field's largest
    dilation (validate_sp).
    """
    from pwn_tpu.config import override
    from pwn_tpu.models.student import make_student

    # GSPMD cannot partition pallas_call over a time-sharded input, so SP
    # always runs the XLA stack (same params, same semantics).
    student = make_student(
        override(cfg, "student.fused_layers", "off"),
        use_scan=student.use_scan,
    )

    rep = NamedSharding(mesh, P())
    time_sharded_3d = NamedSharding(mesh, P(None, "data", None))
    time_sharded_2d = NamedSharding(mesh, P(None, "data"))

    def gen(variables, key, mel):
        wav = student.apply(variables, key, mel, method="generate")
        return jax.lax.with_sharding_constraint(wav, time_sharded_2d)

    jitted = jax.jit(
        gen,
        in_shardings=(rep, rep, time_sharded_3d),
        out_shardings=time_sharded_2d,
    )

    def checked(variables, key, mel):
        validate_sp(cfg, mesh, mel.shape[1])
        return jitted(variables, key, mel)

    return checked


def shard_mel_time(mesh: Mesh, mel):
    """Place host mel (B, F, M) with the frame axis sharded over data."""
    return jax.device_put(mel, NamedSharding(mesh, P(None, "data", None)))
