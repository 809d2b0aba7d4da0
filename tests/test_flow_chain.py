"""Fused whole-flow chain kernel (ops/pallas/flow_chain.py) tests:
interpret mode on CPU ≡ the module's flows_from_z / generate paths (the
same code compiles on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from pwn_tpu.config import get_config, override
from pwn_tpu.models.student import init_student
from pwn_tpu.ops.pallas.flow_chain import chain_flows_from_z


def _cfg():
    cfg = get_config("tiny_teacher")
    cfg = override(cfg, "student.n_flows", 2)
    cfg = override(cfg, "student.layers_per_flow", 4)
    cfg = override(cfg, "student.residual_channels", 16)
    cfg = override(cfg, "student.gate_channels", 32)
    cfg = override(cfg, "student.skip_channels", 16)
    return cfg


def test_chain_matches_module_flows(rng):
    """chain_flows_from_z ≡ StudentIAF.flows_from_z on a multi-tile
    sequence (exercises the cross-tile z/activation histories)."""
    cfg = _cfg()
    model, variables = init_student(cfg, jax.random.PRNGKey(0),
                                    use_scan=True)
    B, T, M = 2, 1100, cfg.dsp.n_mels
    z = jnp.asarray(rng.standard_normal((B, T)).astype(np.float32))
    cond = jnp.asarray(rng.standard_normal((B, T, M)).astype(np.float32))
    ref = model.apply(variables, z, cond, method="flows_from_z")
    got = chain_flows_from_z(
        variables["params"], z, cond,
        dilations=tuple(cfg.student.flow_dilations),
        clamp=cfg.student.log_scale_clamp,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_chain_batch_isolation(rng):
    """Changing one batch row cannot leak into the other (per-row
    history reset in the kernel grid)."""
    cfg = _cfg()
    _, variables = init_student(cfg, jax.random.PRNGKey(0))
    B, T, M = 2, 1024, cfg.dsp.n_mels
    z = jnp.asarray(rng.standard_normal((B, T)).astype(np.float32))
    cond = jnp.asarray(rng.standard_normal((B, T, M)).astype(np.float32))
    kw = dict(dilations=tuple(cfg.student.flow_dilations),
              clamp=cfg.student.log_scale_clamp)
    out1 = chain_flows_from_z(variables["params"], z, cond, **kw)
    out2 = chain_flows_from_z(
        variables["params"], z.at[1].add(0.5), cond, **kw
    )
    np.testing.assert_array_equal(np.asarray(out1[0]),
                                  np.asarray(out2[0]))
    assert not np.allclose(np.asarray(out1[1]), np.asarray(out2[1]))


def test_chain_generate_matches_module_generate(rng):
    """End-to-end: generate_student(flow_backend="chain") draws the same
    z stream and produces the same waveform as the module path."""
    from pwn_tpu.generate import generate_student

    cfg = _cfg()
    _, variables = init_student(cfg, jax.random.PRNGKey(0))
    F = 5
    mel = jnp.asarray(
        rng.uniform(0, 1, (1, F, cfg.dsp.n_mels)).astype(np.float32)
    )
    key = jax.random.PRNGKey(7)
    ref = generate_student(cfg, variables["params"], mel, key)
    got = generate_student(cfg, variables["params"], mel, key,
                           flow_backend="chain")
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)
