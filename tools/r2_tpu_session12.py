"""Round-2 TPU session 12: mega_dx (frozen-teacher dx-only fused
backward) A/B inside the distillation step.

The distill step at 53.4 ms/step (session 9) spends ~34 ms scoring the
teacher (student-only direct step is 19.6 ms).  The teacher is frozen —
only input-gradients are needed — so the new fused_flow_stack_score
backward skips the weight-grad dots (~40% of backward MXU work).

One process, back-to-back: distill step with teacher mode
auto(=mega, XLA-recompute VJP) vs mega_train (full dw, wasted) vs
mega_dx; student mega_train throughout.
"""

import json
import traceback

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


def emit(tag, **kw):
    print(json.dumps({"tag": tag, **kw}), flush=True)


def distill_step_ms(teacher_mode, student_mode="mega_train", n_iters=4):
    c = override(get_config("student_iaf"), "student.fused_layers",
                 student_mode)
    tc = override(c, "teacher.fused_layers", teacher_mode)
    teacher, t_vars = init_teacher(tc, jax.random.PRNGKey(0),
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
    for tm in ("auto", "mega_train", "mega_dx", "auto", "mega_dx"):
        try:
            ms = distill_step_ms(tm)
            emit("distill_step", teacher_mode=tm, step_ms=round(ms, 2))
        except Exception:
            emit("distill_step", teacher_mode=tm, error="see traceback")
            traceback.print_exc()
    emit("done")


if __name__ == "__main__":
    main()
