"""Round-2 TPU session 3 (single process, back-to-back per CLAUDE.md):

A. AR-backend settlement (VERDICT r1 item 5): conv-queue lax.scan vs
   whole-loop Pallas kernel at teacher_lj, a 48-layer stack, and a
   256-channel stack.  The Pallas kernel keeps all weights + queues
   VMEM-resident; stacks that exceed VMEM error out — that bound is part
   of the answer.
B. Fused whole-flow chain kernel (ops/pallas/flow_chain.py) vs the
   flow_stack megakernel + XLA glue on student_iaf generation.
C. Retry of the student-direct mega_train Mosaic failure (session 1) +
   distill-step A/B with the student train kernel.
D. sp_mega 1-device recheck (session-1 ValueError since fixed).

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
from pwn_tpu.models import sampling
from pwn_tpu.models.student import init_student
from pwn_tpu.models.teacher import init_teacher
from tools.r2_tpu_session1 import gen_ms, student_direct_step_ms


def emit(tag, **kw):
    print(json.dumps({"tag": tag, **kw}), flush=True)


def measure_ar(cfg, backend, batch=8, seconds=0.25):
    sr, hop = cfg.dsp.sample_rate, cfg.dsp.hop_length
    frames = max(int(seconds * sr) // hop, 2)
    T = frames * hop
    model, variables = init_teacher(cfg, jax.random.PRNGKey(0))
    mel = jnp.asarray(
        np.random.default_rng(0)
        .uniform(0, 1, (batch, frames, cfg.dsp.n_mels)).astype(np.float32)
    )
    rtt = measure_round_trip_ms()
    fn = (sampling.fast_sample_pallas if backend == "pallas"
          else sampling.fast_sample)

    @jax.jit
    def run(v, key, mel):
        return fn(model, v, key, mel).sum()

    t0 = time.time()
    dt = _time_chain(lambda: run(variables, jax.random.PRNGKey(1), mel),
                     1, rtt_ms=rtt)
    return {
        "us_per_step": round(dt / T * 1e6, 2),
        "samples_per_s": round(batch * T / dt),
        "compile_s": round(time.time() - t0, 1),
        "T": T,
    }


def chain_gen_ms(cfg, batch, seconds, n_iters=6):
    """Student synthesis with the fused whole-flow chain kernel."""
    from pwn_tpu.generate import student_chain_generate

    sr, hop = cfg.dsp.sample_rate, cfg.dsp.hop_length
    frames = int(seconds * sr) // hop
    _, variables = init_student(cfg, jax.random.PRNGKey(0))
    mel = jnp.asarray(
        np.random.default_rng(0)
        .uniform(0, 1, (batch, frames, cfg.dsp.n_mels)).astype(np.float32)
    )
    rtt = measure_round_trip_ms()

    @jax.jit
    def chain(params, key, mel):
        def body(i, acc):
            w = student_chain_generate(
                cfg, params, mel, jax.random.fold_in(key, i)
            )
            return acc + w.sum()

        return jax.lax.fori_loop(0, n_iters, body, jnp.float32(0))

    dt = _time_chain(
        lambda: chain(variables["params"], jax.random.PRNGKey(1), mel),
        n_iters, rtt_ms=rtt,
    )
    audio = batch * frames * hop / sr
    return dt * 1e3, audio / dt


def main():
    emit("device", kind=str(jax.devices()[0]))

    # ---- A. AR backends ----
    cases = [
        ("teacher_lj_24x128", get_config("teacher_lj")),
        ("deep_48x128", override(
            override(get_config("teacher_lj"), "teacher.n_blocks", 6),
            "teacher.layers_per_block", 8)),
        ("wide_24x256", override(
            override(
                override(get_config("teacher_lj"),
                         "teacher.residual_channels", 256),
                "teacher.gate_channels", 512),
            "teacher.skip_channels", 256)),
    ]
    for name, cfg in cases:
        for backend in ("scan", "pallas"):
            try:
                r = measure_ar(cfg, backend)
                emit("ar", case=name, backend=backend, **r)
            except Exception as e:
                emit("ar", case=name, backend=backend,
                     error=repr(e)[:300])

    # ---- B. flow-chain kernel vs megakernel+glue ----
    scfg = get_config("student_iaf")
    try:
        ms, xrt = gen_ms(scfg, "auto", 8, 2.0)
        emit("student_gen", backend="mega_glue", call_ms=round(ms, 2),
             x_realtime=round(xrt, 1))
    except Exception as e:
        emit("student_gen", backend="mega_glue", error=repr(e)[:300])
    try:
        ms, xrt = chain_gen_ms(scfg, 8, 2.0)
        emit("student_gen", backend="chain", call_ms=round(ms, 2),
             x_realtime=round(xrt, 1))
    except Exception as e:
        emit("student_gen", backend="chain", error=repr(e)[:300])
    # config[4] sizes: expected to exceed VMEM (informative either way)
    try:
        ms, xrt = chain_gen_ms(get_config("large_student_sharded"), 8, 2.0)
        emit("config4_gen", mode="chain", call_ms=round(ms, 2),
             x_realtime=round(xrt, 1))
    except Exception as e:
        emit("config4_gen", mode="chain", error=repr(e)[:300])

    # ---- C. student-direct retry + distill A/B ----
    for mode in ("off", "mega_train"):
        try:
            ms = student_direct_step_ms(scfg, mode)
            emit("student_direct_retry", mode=mode, step_ms=round(ms, 2))
        except Exception as e:
            emit("student_direct_retry", mode=mode, error=repr(e)[:300])

    from pwn_tpu.data import SyntheticTones, make_train_iterator
    from pwn_tpu.training.common import make_optimizer
    from pwn_tpu.training.distill import distillation_losses
    from pwn_tpu.training.teacher import prepare_batch

    def distill_step_ms(mode, n_iters=4):
        c = override(get_config("student_iaf"), "student.fused_layers",
                     mode)
        teacher, t_vars = init_teacher(c, jax.random.PRNGKey(0),
                                       use_scan=True)
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
        def chain(params, opt_state, t_params, wav, key):
            x_ref, mel = prepare_batch(wav, c)

            def body(i, carry):
                params, opt_state, acc = carry

                def loss_fn(p):
                    loss, _ = distillation_losses(
                        student, teacher, p, t_params, x_ref, mel,
                        jax.random.fold_in(key, i), c,
                    )
                    return loss

                loss, grads = jax.value_and_grad(loss_fn)(params)
                updates, opt_state = tx.update(grads, opt_state)
                params = jax.tree.map(lambda a, u: a + u, params,
                                      updates)
                return params, opt_state, acc + loss

            _, _, acc = jax.lax.fori_loop(
                0, n_iters, body, (params, opt_state, jnp.float32(0))
            )
            return acc

        dt = _time_chain(
            lambda: chain(params, opt_state, t_vars["params"], wav,
                          jax.random.PRNGKey(2)),
            n_iters, rtt_ms=rtt,
        )
        return dt * 1e3

    for mode in ("off", "mega_train"):
        try:
            ms = distill_step_ms(mode)
            emit("distill_step", student_mode=mode, step_ms=round(ms, 2))
        except Exception as e:
            emit("distill_step", student_mode=mode, error=repr(e)[:300])

    # ---- D. sp_mega 1-device recheck ----
    try:
        from jax.sharding import Mesh

        from pwn_tpu.parallel.sp import make_sp_generate_mega

        mesh = Mesh(np.asarray(jax.devices()[:1]).reshape(1, 1),
                    ("data", "model"))
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

    emit("done")
    return 0


if __name__ == "__main__":
    sys.exit(main())
