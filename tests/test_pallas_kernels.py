"""Pallas fused gated-layer kernel vs XLA reference, forward AND custom
VJP (SURVEY.md §4: "Pallas dilated-conv kernel ≡ lax.conv_general_dilated
(allclose, fp32) over random shapes; interpret=True on CPU; same test runs
on real TPU")."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pwn_tpu.ops.conv import causal_conv1d
from pwn_tpu.ops.pallas.gated_layer import TIME_TILE, fused_gated_residual


def _mk(rng, *shape):
    return jnp.asarray(rng.standard_normal(shape).astype(np.float32) * 0.1)


def _params(rng, C, M, G, S):
    return dict(
        w_dilated=_mk(rng, 2, C, G),
        b_dilated=_mk(rng, G),
        w_cond=_mk(rng, M, G),
        b_cond=_mk(rng, G),
        w_res=_mk(rng, G // 2, C),
        b_res=_mk(rng, C),
        w_skip=_mk(rng, G // 2, S),
        b_skip=_mk(rng, S),
    )


def _xla_ref(x, cond, p, d):
    g = (
        causal_conv1d(x, p["w_dilated"], d, p["b_dilated"])
        + jnp.einsum("btm,mg->btg", cond, p["w_cond"])
        + p["b_cond"]
    )
    a, b = jnp.split(g, 2, -1)
    z = jnp.tanh(a) * jax.nn.sigmoid(b)
    res = x + jnp.einsum("btg,gc->btc", z, p["w_res"]) + p["b_res"]
    skip = jnp.einsum("btg,gs->bts", z, p["w_skip"]) + p["b_skip"]
    return res, skip


@pytest.mark.parametrize(
    "B,T,C,M,G,S,d",
    [
        (2, 700, 32, 16, 64, 48, 1),
        (1, 512, 16, 8, 32, 16, 64),
        (2, 1500, 16, 8, 32, 16, 512),
    ],
)
def test_fused_forward_matches_xla(rng, B, T, C, M, G, S, d):
    x = _mk(rng, B, T, C) * 10
    cond = _mk(rng, B, T, M) * 10
    p = _params(rng, C, M, G, S)
    res, skip = fused_gated_residual(x, cond, **p, dilation=d)
    rr, ss = _xla_ref(x, cond, p, d)
    np.testing.assert_allclose(np.asarray(res), np.asarray(rr),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(skip), np.asarray(ss),
                               rtol=1e-4, atol=1e-5)


def test_fused_rejects_oversized_dilation(rng):
    x = _mk(rng, 1, 64, 8)
    cond = _mk(rng, 1, 64, 8)
    p = _params(rng, 8, 8, 16, 8)
    with pytest.raises(ValueError, match="TIME_TILE"):
        fused_gated_residual(x, cond, **p, dilation=TIME_TILE * 2)


def test_fused_custom_vjp_matches_xla_grads(rng):
    """Pallas-forward custom VJP gradients ≡ autodiff through the XLA
    path, for inputs, conditioning, and every parameter."""
    B, T, C, M, G, S, d = 1, 600, 8, 4, 16, 8, 16
    x = _mk(rng, B, T, C)
    cond = _mk(rng, B, T, M)
    p = _params(rng, C, M, G, S)
    dres_w = _mk(rng, B, T, C)
    dskip_w = _mk(rng, B, T, S)

    def loss_fused(x, cond, p):
        res, skip = fused_gated_residual(x, cond, **p, dilation=d)
        return jnp.sum(res * dres_w) + jnp.sum(skip * dskip_w)

    def loss_xla(x, cond, p):
        res, skip = _xla_ref(x, cond, p, d)
        return jnp.sum(res * dres_w) + jnp.sum(skip * dskip_w)

    g1 = jax.grad(loss_fused, argnums=(0, 1, 2))(x, cond, p)
    g2 = jax.grad(loss_xla, argnums=(0, 1, 2))(x, cond, p)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-5)


def test_fused_layer_inside_model(rng):
    """A WaveNetStack with fused=on (interpret on CPU) ≡ fused=off."""
    from pwn_tpu.config import get_config, override
    from pwn_tpu.models.teacher import init_teacher

    cfg = get_config("tiny_teacher")
    wav = _mk(rng, 1, 512) * 5
    mel = jnp.asarray(
        np.random.default_rng(0).uniform(
            0, 1, (1, 4, cfg.dsp.n_mels)
        ).astype(np.float32)
    )
    model_off, v = init_teacher(cfg, jax.random.PRNGKey(0))
    cfg_on = override(cfg, "teacher.fused_layers", "on")
    from pwn_tpu.models.teacher import make_teacher

    model_on = make_teacher(cfg_on)
    out_off = model_off.apply(v, wav, mel)
    out_on = model_on.apply(v, wav, mel)
    np.testing.assert_allclose(
        np.asarray(out_on), np.asarray(out_off), rtol=1e-4, atol=1e-5
    )
