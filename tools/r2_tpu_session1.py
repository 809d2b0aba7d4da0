"""Round-2 TPU measurement session 1 (single process, back-to-back A/B
per CLAUDE.md chip rules): training-backward kernel, config[4] numbers,
shard_map-on-TPU validation, per-layer kernel verdict.

Prints one JSON line per measurement (flush) so partial progress
survives a timeout.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from pwn_tpu.benchmarks import _time_chain, measure_round_trip_ms
from pwn_tpu.config import get_config, override
from pwn_tpu.data import SyntheticTones, make_train_iterator
from pwn_tpu.models.student import init_student
from pwn_tpu.models.teacher import init_teacher
from pwn_tpu.training.common import make_optimizer
from pwn_tpu.training.teacher import prepare_batch


def emit(tag, **kw):
    print(json.dumps({"tag": tag, **kw}), flush=True)


def train_step_ms(cfg, mode, n_iters=6):
    """Teacher train step wall time with the given stack mode."""
    c = override(cfg, "teacher.fused_layers", mode)
    model, variables = init_teacher(c, jax.random.PRNGKey(0),
                                    use_scan=False)
    tx = make_optimizer(c.train)
    params = variables["params"]
    opt_state = tx.init(params)
    B = c.train.global_batch_size
    ds = SyntheticTones(8, c.train.crop_samples, c.dsp.sample_rate)
    wav = jnp.asarray(next(make_train_iterator(ds, c, B, seed=0)))
    rtt = measure_round_trip_ms()

    @jax.jit
    def chain(params, opt_state, wav):
        x, mel = prepare_batch(wav, c)

        def body(i, carry):
            params, opt_state, acc = carry

            def loss_fn(p):
                return model.apply({"params": p}, x, mel, method="loss")

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = tx.update(grads, opt_state)
            params = jax.tree.map(lambda a, u: a + u, params, updates)
            return params, opt_state, acc + loss

        _, _, acc = jax.lax.fori_loop(
            0, n_iters, body, (params, opt_state, jnp.float32(0))
        )
        return acc

    dt = _time_chain(lambda: chain(params, opt_state, wav), n_iters,
                     rtt_ms=rtt)
    return dt * 1e3


def student_direct_step_ms(cfg, mode, n_iters=4):
    """Direct-student train step with the given student stack mode."""
    from pwn_tpu.training.student_direct import direct_student_losses

    c = override(cfg, "student.fused_layers", mode)
    student, s_vars = init_student(c, jax.random.PRNGKey(1),
                                   use_scan=False)
    tx = make_optimizer(c.train)
    params = s_vars["params"]
    opt_state = tx.init(params)
    B = c.train.global_batch_size
    ds = SyntheticTones(8, c.train.crop_samples, c.dsp.sample_rate)
    wav = jnp.asarray(next(make_train_iterator(ds, c, B, seed=0)))
    rtt = measure_round_trip_ms()

    @jax.jit
    def chain(params, opt_state, wav, key):
        x_ref, mel = prepare_batch(wav, c)

        def body(i, carry):
            params, opt_state, acc = carry

            def loss_fn(p):
                loss, _ = direct_student_losses(
                    student, p, x_ref, mel, jax.random.fold_in(key, i), c
                )
                return loss

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = tx.update(grads, opt_state)
            params = jax.tree.map(lambda a, u: a + u, params, updates)
            return params, opt_state, acc + loss

        _, _, acc = jax.lax.fori_loop(
            0, n_iters, body, (params, opt_state, jnp.float32(0))
        )
        return acc

    dt = _time_chain(
        lambda: chain(params, opt_state, wav, jax.random.PRNGKey(2)),
        n_iters, rtt_ms=rtt,
    )
    return dt * 1e3


def gen_ms(cfg, mode, batch, seconds, n_iters=6):
    """Student parallel synthesis per-call ms with the given stack mode."""
    c = override(cfg, "student.fused_layers", mode)
    sr, hop = c.dsp.sample_rate, c.dsp.hop_length
    frames = int(seconds * sr) // hop
    model, variables = init_student(c, jax.random.PRNGKey(0))
    mel = jnp.asarray(
        np.random.default_rng(0)
        .uniform(0, 1, (batch, frames, c.dsp.n_mels)).astype(np.float32)
    )
    rtt = measure_round_trip_ms()

    @jax.jit
    def chain(v, key, mel):
        def body(i, acc):
            w = model.apply(v, jax.random.fold_in(key, i), mel,
                            method="generate")
            return acc + w.sum()

        return jax.lax.fori_loop(0, n_iters, body, jnp.float32(0))

    dt = _time_chain(lambda: chain(variables, jax.random.PRNGKey(1), mel),
                     n_iters, rtt_ms=rtt)
    audio = batch * frames * hop / sr
    return dt * 1e3, audio / dt


def main():
    emit("device", kind=str(jax.devices()[0]))

    # ---- A. training backward kernel A/B (teacher_lj) ----
    tcfg = get_config("teacher_lj")
    for mode in ("off", "mega", "mega_train"):
        try:
            t0 = time.time()
            ms = train_step_ms(tcfg, mode)
            emit("teacher_train", mode=mode, step_ms=round(ms, 2),
                 utt_per_s=round(tcfg.train.global_batch_size / ms * 1e3,
                                 1),
                 compile_s=round(time.time() - t0, 1))
        except Exception as e:
            emit("teacher_train", mode=mode, error=repr(e)[:300])

    # ---- A2. direct-student step A/B ----
    scfg = get_config("student_iaf")
    for mode in ("off", "mega_train"):
        try:
            ms = student_direct_step_ms(scfg, mode)
            emit("student_direct", mode=mode, step_ms=round(ms, 2))
        except Exception as e:
            emit("student_direct", mode=mode, error=repr(e)[:300])

    # ---- B. config[4] large_student_sharded single-chip ----
    lcfg = get_config("large_student_sharded")
    for mode in ("off", "auto"):
        try:
            ms, xrt = gen_ms(lcfg, mode, batch=8, seconds=2.0)
            emit("config4_gen", mode=mode, call_ms=round(ms, 2),
                 x_realtime=round(xrt, 1))
        except Exception as e:
            emit("config4_gen", mode=mode, error=repr(e)[:300])

    # student_iaf current default for reference (regression watch)
    try:
        ms, xrt = gen_ms(get_config("student_iaf"), "auto", 8, 2.0)
        emit("student_iaf_gen", call_ms=round(ms, 2),
             x_realtime=round(xrt, 1))
    except Exception as e:
        emit("student_iaf_gen", error=repr(e)[:300])

    # ---- B2. shard_map paths on the real chip (1-device mesh) ----
    try:
        from jax.sharding import Mesh

        from pwn_tpu.parallel.tp import make_batch_sharded_generate

        mesh = Mesh(np.asarray(jax.devices()[:1]).reshape(1, 1),
                    ("data", "model"))
        cfg = get_config("student_iaf")
        model, variables = init_student(cfg, jax.random.PRNGKey(0))
        gen = make_batch_sharded_generate(cfg, mesh=mesh)
        frames = int(2.0 * cfg.dsp.sample_rate) // cfg.dsp.hop_length
        mel = jnp.asarray(
            np.random.default_rng(0)
            .uniform(0, 1, (8, frames, cfg.dsp.n_mels))
            .astype(np.float32)
        )
        rtt = measure_round_trip_ms()
        out = gen(variables, jax.random.PRNGKey(1), mel)
        _ = float(np.asarray(out).sum())  # force
        t0 = time.perf_counter()
        for _ in range(3):
            out = gen(variables, jax.random.PRNGKey(1), mel)
            _ = float(np.asarray(out).sum())
        ms = (time.perf_counter() - t0) / 3 * 1e3 - rtt
        audio = 8 * frames * cfg.dsp.hop_length / cfg.dsp.sample_rate
        emit("shardmap_gen_1dev", call_ms=round(ms, 2),
             x_realtime=round(audio / ms * 1e3, 1))
    except Exception as e:
        emit("shardmap_gen_1dev", error=repr(e)[:300])

    try:
        from pwn_tpu.parallel.sp import make_sp_generate_mega

        cfg = get_config("student_iaf")
        model, variables = init_student(cfg, jax.random.PRNGKey(0))
        sp = make_sp_generate_mega(model, cfg, mesh)
        mel = jnp.asarray(
            np.random.default_rng(0)
            .uniform(0, 1, (1, 256, cfg.dsp.n_mels)).astype(np.float32)
        )
        out = sp(variables, jax.random.PRNGKey(1), mel)
        emit("sp_mega_1dev", ok=bool(np.isfinite(np.asarray(out)).all()))
    except Exception as e:
        emit("sp_mega_1dev", error=repr(e)[:300])

    # ---- D. per-layer gated kernel at config[4] sizes ----
    try:
        ms_layer, _ = gen_ms(lcfg, "layer", batch=8, seconds=2.0)
        emit("config4_gen", mode="layer", call_ms=round(ms_layer, 2))
    except Exception as e:
        emit("config4_gen", mode="layer", error=repr(e)[:300])

    emit("done")
    return 0


if __name__ == "__main__":
    sys.exit(main())
