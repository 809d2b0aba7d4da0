"""Round-2 TPU session 9: measurements after the two root-cause fixes
from session 8 (the student-width Mosaic crash was a lane-offset-64
`dcat[..., C:2C]` feeding a time concatenate — fixed by per-segment
dcat dots; the remaining failures were scoped-vmem OOM — fixed by
raising vmem_limit_bytes on the backward pallas_call; the chain kernel's
`zhist[:, -1:]` offset-127 slice — fixed by passing z_shift as input).

One process, back-to-back A/Bs:
  1. teacher mega_train regression (protect 17.4 ms/step)
  2. student_direct train step: off vs mega_train
  3. distill step: off vs student mega_train
  4. student gen: mega_glue vs fused chain; chain at config[4] sizes
"""

import json
import sys

import jax
import jax.numpy as jnp

from pwn_tpu.benchmarks import _time_chain, measure_round_trip_ms
from pwn_tpu.config import get_config, override
from pwn_tpu.data import SyntheticTones, make_train_iterator
from pwn_tpu.models.student import init_student
from pwn_tpu.models.teacher import init_teacher
from pwn_tpu.training.common import make_optimizer
from pwn_tpu.training.distill import distillation_losses
from pwn_tpu.training.teacher import prepare_batch
from tools.r2_tpu_session1 import (
    gen_ms,
    student_direct_step_ms,
    train_step_ms,
)
from tools.r2_tpu_session3 import chain_gen_ms


def emit(tag, **kw):
    print(json.dumps({"tag": tag, **kw}), flush=True)


def distill_step_ms(mode, n_iters=4):
    """Distillation step wall time with the given STUDENT stack mode
    (same structure as r2 session 3's in-main measurement)."""
    c = override(get_config("student_iaf"), "student.fused_layers", mode)
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
            params = jax.tree.map(lambda a, u: a + u, params, updates)
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


def main():
    emit("device", kind=str(jax.devices()[0]))
    scfg = get_config("student_iaf")

    # ---- 1. teacher regression ----
    try:
        ms = train_step_ms(get_config("teacher_lj"), "mega_train")
        emit("teacher_train", mode="mega_train", step_ms=round(ms, 2))
    except Exception as e:
        emit("teacher_train", mode="mega_train", error=repr(e)[:300])

    # ---- 2. student direct train A/B ----
    for mode in ("off", "mega_train"):
        try:
            ms = student_direct_step_ms(scfg, mode)
            emit("student_direct", mode=mode, step_ms=round(ms, 2))
        except Exception as e:
            emit("student_direct", mode=mode, error=repr(e)[:300])

    # ---- 3. distill A/B ----
    for mode in ("off", "mega_train"):
        try:
            ms = distill_step_ms(mode)
            emit("distill_step", student_mode=mode, step_ms=round(ms, 2))
        except Exception as e:
            emit("distill_step", student_mode=mode, error=repr(e)[:300])

    # ---- 4. generation backends ----
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
    try:
        ms, xrt = chain_gen_ms(get_config("large_student_sharded"), 8,
                               2.0)
        emit("config4_gen", mode="chain", call_ms=round(ms, 2),
             x_realtime=round(xrt, 1))
    except Exception as e:
        emit("config4_gen", mode="chain", error=repr(e)[:300])

    emit("done")
    return 0


if __name__ == "__main__":
    sys.exit(main())
