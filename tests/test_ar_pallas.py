"""Whole-loop Pallas AR sampler ≡ XLA conv-queue scan on a shared
uniform stream (SURVEY.md §4 Pallas row; interpret mode on CPU, the same
code path compiles on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from pwn_tpu.config import get_config
from pwn_tpu.models import sampling
from pwn_tpu.models.teacher import init_teacher

CFG = get_config("tiny_teacher")
HOP = CFG.dsp.hop_length


def _mel(rng, B, frames):
    return jnp.asarray(
        rng.uniform(0, 1, (B, frames, CFG.dsp.n_mels)).astype(np.float32)
    )


def test_pallas_ar_matches_scan_on_shared_uniforms(rng):
    model, variables = init_teacher(CFG, jax.random.PRNGKey(0))
    mel = _mel(rng, 2, 2)
    T = 2 * HOP
    key = jax.random.PRNGKey(11)
    uniforms = sampling.draw_uniforms(key, T, 2, CFG.teacher.n_mixtures)

    scan_wav = sampling.fast_sample(
        model, variables, key, mel, uniforms=uniforms
    )
    pallas_wav = sampling.fast_sample_pallas(
        model, variables, key, mel, interpret=True
    )
    assert pallas_wav.shape == (2, T)
    np.testing.assert_allclose(
        np.asarray(pallas_wav), np.asarray(scan_wav), rtol=1e-4, atol=1e-4
    )


def test_uniform_scan_path_is_deterministic(rng):
    model, variables = init_teacher(CFG, jax.random.PRNGKey(0))
    mel = _mel(rng, 1, 2)
    key = jax.random.PRNGKey(3)
    u = sampling.draw_uniforms(key, 2 * HOP, 1, CFG.teacher.n_mixtures)
    w1 = sampling.fast_sample(model, variables, key, mel, uniforms=u)
    w2 = sampling.fast_sample(model, variables, key, mel, uniforms=u)
    np.testing.assert_array_equal(np.asarray(w1), np.asarray(w2))
    # a different stream gives different audio
    u2 = sampling.draw_uniforms(jax.random.PRNGKey(4), 2 * HOP, 1,
                                CFG.teacher.n_mixtures)
    w3 = sampling.fast_sample(model, variables, key, mel, uniforms=u2)
    assert not np.array_equal(np.asarray(w1), np.asarray(w3))


def test_pallas_ar_temperature_zeroish(rng):
    """Near-zero temperature collapses the logistic noise: output is the
    selected component's mean (bounded, finite)."""
    model, variables = init_teacher(CFG, jax.random.PRNGKey(0))
    mel = _mel(rng, 1, 2)
    wav = sampling.fast_sample_pallas(
        model, variables, jax.random.PRNGKey(5), mel,
        temperature=1e-4, interpret=True,
    )
    a = np.asarray(wav)
    assert np.isfinite(a).all() and np.abs(a).max() <= 1.0


def test_weights_dtype_override():
    """`weights_dtype` overrides the kernel's VMEM weight storage
    (fp32 variant for long-horizon drift, BASELINE.md r4): on an fp32
    config it is a no-op; forcing bf16 perturbs output only at the
    quantization level."""
    import numpy as np

    from pwn_tpu.config import get_config
    from pwn_tpu.models import sampling
    from pwn_tpu.models.teacher import init_teacher

    cfg = get_config("tiny_teacher")
    model, v = init_teacher(cfg, jax.random.PRNGKey(0))
    mel = jnp.asarray(
        np.random.default_rng(0)
        .uniform(0, 1, (2, 2, cfg.dsp.n_mels)).astype(np.float32)
    )
    key = jax.random.PRNGKey(3)
    a = np.asarray(sampling.fast_sample_pallas(model, v, key, mel))
    b = np.asarray(sampling.fast_sample_pallas(
        model, v, key, mel, weights_dtype="float32"))
    np.testing.assert_array_equal(a, b)
    c = np.asarray(sampling.fast_sample_pallas(
        model, v, key, mel, weights_dtype="bfloat16"))
    assert not np.array_equal(a, c)
    assert np.abs(a - c).max() < 0.1
