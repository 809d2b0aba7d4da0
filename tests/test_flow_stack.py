"""Whole-stack Pallas megakernel tests: forward ≡ XLA reference, custom
VJP grads, model integration (interpret mode on CPU; same code compiles
on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pwn_tpu.ops.pallas.flow_stack import (
    _reference_xla,
    fused_flow_stack,
)


def _mk(rng, *shape, scale=0.1):
    return jnp.asarray(rng.standard_normal(shape).astype(np.float32)
                       * scale)


def _setup(rng, B=2, T=1100, C=16, M=8, G=32, S=16,
           dilations=(1, 2, 4, 512)):
    L = len(dilations)
    return dict(
        x0=_mk(rng, B, T, C, scale=1.0),
        cond=_mk(rng, B, T, M, scale=1.0),
        w_in=_mk(rng, L, 2 * C + M, G),
        b_g=_mk(rng, L, G),
        w_out=_mk(rng, L, G // 2, C + S),
        b_rs=_mk(rng, L, C + S),
    ), dilations


def test_flow_stack_matches_reference(rng):
    args, dils = _setup(rng)
    s_p = fused_flow_stack(**args, dilations=dils)
    s_r = _reference_xla(**args, dilations=dils)
    np.testing.assert_allclose(np.asarray(s_p), np.asarray(s_r),
                               rtol=1e-4, atol=1e-5)


def test_flow_stack_batch_history_isolation(rng):
    """hist must reset per batch row: changing row 1 cannot leak into
    row 0 (grid is batch-major with per-row history)."""
    args, dils = _setup(rng, B=2, T=1024)
    s1 = fused_flow_stack(**args, dilations=dils)
    args2 = dict(args)
    args2["x0"] = args["x0"].at[1].add(3.0)
    s2 = fused_flow_stack(**args2, dilations=dils)
    np.testing.assert_array_equal(np.asarray(s1[0]), np.asarray(s2[0]))
    assert not np.allclose(np.asarray(s1[1]), np.asarray(s2[1]))


def test_flow_stack_grads_match_reference(rng):
    args, dils = _setup(rng, B=1, T=600, C=8, M=4, G=16, S=8,
                        dilations=(1, 4, 16))
    w1 = _mk(rng, 1, 600, 8, scale=1.0)
    w2 = _mk(rng, 1, 600, 8, scale=1.0)

    def loss_fused(a):
        s = fused_flow_stack(**a, dilations=dils)
        return jnp.sum(s * w2) + jnp.sum(s[..., :8] * w1)

    def loss_ref(a):
        s = _reference_xla(**a, dilations=dils)
        return jnp.sum(s * w2) + jnp.sum(s[..., :8] * w1)

    g1 = jax.grad(loss_fused)(args)
    g2 = jax.grad(loss_ref)(args)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-5)


def test_flow_stack_rejects_oversized_dilation(rng):
    args, _ = _setup(rng, T=1024)
    with pytest.raises(ValueError, match="TIME_TILE"):
        fused_flow_stack(**args, dilations=(1, 2048))


def test_mega_mode_inside_model(rng):
    """Teacher with fused_layers=mega ≡ scan path (fp32, interpret)."""
    from pwn_tpu.config import get_config, override
    from pwn_tpu.models.teacher import init_teacher, make_teacher

    cfg = get_config("tiny_teacher")
    model_off, v = init_teacher(cfg, jax.random.PRNGKey(0))
    model_mega = make_teacher(override(cfg, "teacher.fused_layers",
                                       "mega"))
    wav = _mk(rng, 1, 512, scale=0.5)[..., 0] if False else jnp.asarray(
        np.random.default_rng(0).uniform(-0.5, 0.5, (1, 512)).astype(
            np.float32
        )
    )
    mel = jnp.asarray(
        np.random.default_rng(1).uniform(
            0, 1, (1, 4, cfg.dsp.n_mels)
        ).astype(np.float32)
    )
    out_off = model_off.apply(v, wav, mel)
    out_mega = model_mega.apply(v, wav, mel)
    np.testing.assert_allclose(
        np.asarray(out_mega), np.asarray(out_off), rtol=1e-4, atol=1e-4
    )


def test_train_kernel_forward_matches(rng):
    """fused_flow_stack_train forward == inference megakernel == XLA."""
    from pwn_tpu.ops.pallas.flow_stack import fused_flow_stack_train

    args, dils = _setup(rng)
    s_t = fused_flow_stack_train(**args, dilations=dils)
    s_r = _reference_xla(**args, dilations=dils)
    np.testing.assert_allclose(np.asarray(s_t), np.asarray(s_r),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("dils,T,B", [
    ((1, 2, 4, 8), 1536, 2),      # multi-tile, growing dilations
    ((1, 2, 4, 512), 1100, 2),    # full-tile dilation + ragged T (pad)
    (tuple(2 ** i for i in range(10)), 2048, 2),  # student-shaped
])
def test_train_kernel_vjp_matches_xla(rng, dils, T, B):
    """The fused Pallas backward (VERDICT r1 item 2) must reproduce the
    XLA VJP for every input: dx0, dcond, dw_in, db_g, dw_out, db_rs."""
    import functools

    from pwn_tpu.ops.pallas.flow_stack import (
        _reference_xla_unrolled,
        fused_flow_stack_train,
    )

    args, _ = _setup(rng, B=B, T=T, dilations=dils)
    order = ["x0", "cond", "w_in", "b_g", "w_out", "b_rs"]
    vals = [args[k] for k in order]
    ref_fn = functools.partial(_reference_xla_unrolled, dilations=dils)
    new_fn = lambda *a: fused_flow_stack_train(  # noqa: E731
        *a, dilations=dils, interpret=True
    )
    ct = _mk(rng, B, T, args["w_out"].shape[-1] - args["x0"].shape[-1],
             scale=1.0)
    out_r, vjp_r = jax.vjp(ref_fn, *vals)
    out_n, vjp_n = jax.vjp(new_fn, *vals)
    np.testing.assert_allclose(np.asarray(out_n), np.asarray(out_r),
                               rtol=1e-4, atol=1e-5)
    for name, g_r, g_n in zip(order, vjp_r(ct), vjp_n(ct)):
        np.testing.assert_allclose(
            np.asarray(g_n), np.asarray(g_r), rtol=2e-3, atol=2e-4,
            err_msg=f"grad mismatch for {name}",
        )


def test_train_kernel_vjp_chunked(rng, monkeypatch):
    """Multi-chunk backward (layer chunks sized to VMEM) must agree with
    the XLA VJP — forces 2 chunks regardless of the real budget."""
    import functools

    from pwn_tpu.ops.pallas import flow_stack as fs

    dils = (1, 2, 4, 8)
    args, _ = _setup(rng, B=2, T=1536, dilations=dils)
    monkeypatch.setattr(fs, "_bwd_chunk_layout",
                        lambda *a, **k: (2, 1))  # 2 layers/chunk, bb=1
    order = ["x0", "cond", "w_in", "b_g", "w_out", "b_rs"]
    vals = [args[k] for k in order]
    ref_fn = functools.partial(fs._reference_xla_unrolled, dilations=dils)
    new_fn = lambda *a: fs.fused_flow_stack_train(  # noqa: E731
        *a, dilations=dils, interpret=True
    )
    ct = _mk(rng, 2, 1536, 16, scale=1.0)
    _, vjp_r = jax.vjp(ref_fn, *vals)
    _, vjp_n = jax.vjp(new_fn, *vals)
    for name, g_r, g_n in zip(order, vjp_r(ct), vjp_n(ct)):
        np.testing.assert_allclose(
            np.asarray(g_n), np.asarray(g_r), rtol=2e-3, atol=2e-4,
            err_msg=f"grad mismatch for {name} (chunked)",
        )


@pytest.mark.parametrize("dils,T,B", [
    ((1, 2, 4, 8), 1536, 2),
    (tuple(2 ** i for i in range(10)), 2048, 2),  # teacher/student-shaped
])
def test_score_kernel_dx_matches_xla(rng, dils, T, B):
    """fused_flow_stack_score (frozen-stack dx/dcond-only backward, the
    distillation-teacher scoring mode) must reproduce the XLA VJP for
    x0 and cond, and return zeros for the frozen weights."""
    import functools

    from pwn_tpu.ops.pallas.flow_stack import (
        _reference_xla_unrolled,
        fused_flow_stack_score,
    )

    args, _ = _setup(rng, B=B, T=T, dilations=dils)
    order = ["x0", "cond", "w_in", "b_g", "w_out", "b_rs"]
    vals = [args[k] for k in order]
    ref_fn = functools.partial(_reference_xla_unrolled, dilations=dils)
    new_fn = lambda *a: fused_flow_stack_score(  # noqa: E731
        *a, dilations=dils, interpret=True
    )
    ct = _mk(rng, B, T, args["w_out"].shape[-1] - args["x0"].shape[-1],
             scale=1.0)
    out_r, vjp_r = jax.vjp(ref_fn, *vals)
    out_n, vjp_n = jax.vjp(new_fn, *vals)
    np.testing.assert_allclose(np.asarray(out_n), np.asarray(out_r),
                               rtol=1e-4, atol=1e-5)
    grads_r, grads_n = vjp_r(ct), vjp_n(ct)
    for name, g_r, g_n in zip(order[:2], grads_r[:2], grads_n[:2]):
        np.testing.assert_allclose(
            np.asarray(g_n), np.asarray(g_r), rtol=2e-3, atol=2e-4,
            err_msg=f"grad mismatch for {name} (score mode)",
        )
    for name, g_n in zip(order[2:], grads_n[2:]):
        assert not np.asarray(g_n).any(), f"nonzero frozen grad {name}"


def test_mega_train_mode_resolution():
    """mega_train resolves to the train kernel off-CPU and to XLA on CPU
    (interpret-mode training would crawl)."""
    from pwn_tpu.models.modules import resolve_stack_mode

    assert resolve_stack_mode("mega_train") == "xla"  # cpu test env
    assert resolve_stack_mode("off") == "xla"
    assert resolve_stack_mode("mega") == "mega"


def test_mega_vmem_eligibility():
    """teacher_lj fits the megakernel's VMEM budget; a 24x256-ch stack
    (w_in alone ~14.5 MB bf16) does not."""
    from pwn_tpu.ops.pallas.flow_stack import mega_fits_vmem

    # teacher_lj: L=24, C=128, G=256, S=128, M=80, bf16
    assert mega_fits_vmem(24, 128, 256, 128, 80, 2)
    # wide variant: C=256, G=512, S=256 — cannot be VMEM-resident
    assert not mega_fits_vmem(24, 256, 512, 256, 80, 2)


def test_mega_fallback_to_layer_kernel(rng, monkeypatch):
    """A requested mega that fails the VMEM check must fall back to the
    per-layer Pallas kernel (not silently to scan) and stay numerically
    identical to the XLA path."""
    from pwn_tpu.models import modules as mm
    from pwn_tpu.ops.pallas import flow_stack as fs

    monkeypatch.setattr(fs, "mega_fits_vmem", lambda *a, **k: False)

    dils = (1, 2, 4)
    stack_kw = dict(
        dilations=dils, residual_channels=8, gate_channels=16,
        skip_channels=8, out_dim=6, dtype=jnp.float32,
    )
    x = _mk(rng, 1, 600, 1, scale=1.0)
    cond = _mk(rng, 1, 600, 4, scale=1.0)
    m_mega = mm.WaveNetStack(**stack_kw, mega=True)
    m_off = mm.WaveNetStack(**stack_kw, use_scan=False)
    v = m_off.init(jax.random.PRNGKey(0), x, cond)
    out_fallback = m_mega.apply(v, x, cond)
    out_off = m_off.apply(v, x, cond)
    np.testing.assert_allclose(
        np.asarray(out_fallback), np.asarray(out_off),
        rtol=1e-4, atol=1e-5,
    )


def test_batch_block_clamped_to_four(monkeypatch):
    """bb > 4 miscompiles on the Mosaic backend (r3 session 2: per-row
    O(1) divergence from the fp32 reference at bb=8 for every probed
    (C, grid0, tile); interpret mode is bit-exact across bb).  Every
    layout chooser must clamp, even when the budget would allow more."""
    from pwn_tpu.ops.pallas import flow_stack as fs

    monkeypatch.setenv("PWN_TPU_MEGA_HIST_MB", "1024")
    assert fs._pick_bb(8, per_row_bytes=1, budget=2**30) == 4
    assert fs._pick_bb(16, per_row_bytes=1, budget=2**30) == 4
    assert fs._pick_bb(2, per_row_bytes=1, budget=2**30) == 2
    # non-divisor fallback still lands on a divisor of B
    assert fs._pick_bb(6, per_row_bytes=1, budget=2**30) == 3
    # backward chunk layout obeys the same clamp
    lc, bb = fs._bwd_chunk_layout(
        L=4, B=16, tile=512, C=8, M=8, S=8, K_in=24, G=16, itemsize=2
    )
    assert bb <= fs.MAX_BATCH_BLOCK


def test_flow_stack_bb_independent(rng, monkeypatch):
    """Kernel math must not depend on the batch-block layout: a huge
    history budget (different bb, clamped at 4) gives bit-identical
    output in interpret mode."""
    args, dils = _setup(rng, B=8, T=1024)
    base = fused_flow_stack(**args, dilations=dils)
    monkeypatch.setenv("PWN_TPU_MEGA_HIST_MB", "1024")
    big = fused_flow_stack(**args, dilations=dils)
    np.testing.assert_array_equal(np.asarray(base), np.asarray(big))
