"""Round-2 TPU session 15: EMA step overhead (real tree-update path) and
streaming-synthesis serving latency.

Session 14's "EMA" row was measured through session 1's hand-rolled
chain, which ignores `train.ema_decay` — this script times the EMA tree
multiply-add itself inside the chained step body (same A/B process), and
measures what no prior session did: per-chunk wall latency of
`stream_student_chunks` (time-to-first-chunk + steady-state), the
serving-mode metric.
"""

import json
import time
import traceback

import jax
import jax.numpy as jnp
import numpy as np

from pwn_tpu.benchmarks import _time_chain, measure_round_trip_ms
from pwn_tpu.config import get_config, override
from pwn_tpu.data import SyntheticTones, make_train_iterator
from pwn_tpu.generate import stream_student_chunks
from pwn_tpu.models.student import init_student
from pwn_tpu.models.teacher import init_teacher
from pwn_tpu.training.common import make_optimizer
from pwn_tpu.training.teacher import prepare_batch


def emit(tag, **kw):
    print(json.dumps({"tag": tag, **kw}), flush=True)


def teacher_step_ms(cfg, ema_decay, n_iters=8):
    """Teacher mega_train step wall ms, optionally with the EMA update
    (ema <- ema*d + params*(1-d)) in the body — the exact tree op
    training/common.py::update_ema performs."""
    c = override(cfg, "teacher.fused_layers", "mega_train")
    model, variables = init_teacher(c, jax.random.PRNGKey(0),
                                    use_scan=False)
    tx = make_optimizer(c.train)
    params = variables["params"]
    opt_state = tx.init(params)
    B = c.train.global_batch_size
    ds = SyntheticTones(8, c.train.crop_samples, c.dsp.sample_rate)
    wav = jnp.asarray(next(make_train_iterator(ds, c, B, seed=0)))
    rtt = measure_round_trip_ms()

    if ema_decay > 0:
        ema0 = jax.tree.map(jnp.array, params)

        @jax.jit
        def chain(params, opt_state, ema, wav):
            x, mel = prepare_batch(wav, c)

            def body(i, carry):
                params, opt_state, ema, acc = carry

                def loss_fn(p):
                    return model.apply({"params": p}, x, mel,
                                       method="loss")

                loss, grads = jax.value_and_grad(loss_fn)(params)
                updates, opt_state = tx.update(grads, opt_state)
                params = jax.tree.map(lambda a, u: a + u, params,
                                      updates)
                ema = jax.tree.map(
                    lambda e, p: e * ema_decay + p * (1 - ema_decay),
                    ema, params,
                )
                return params, opt_state, ema, acc + loss

            _, _, _, acc = jax.lax.fori_loop(
                0, n_iters, body,
                (params, opt_state, ema, jnp.float32(0)),
            )
            return acc

        fn = lambda: chain(params, opt_state, ema0, wav)  # noqa: E731
    else:

        @jax.jit
        def chain(params, opt_state, wav):
            x, mel = prepare_batch(wav, c)

            def body(i, carry):
                params, opt_state, acc = carry

                def loss_fn(p):
                    return model.apply({"params": p}, x, mel,
                                       method="loss")

                loss, grads = jax.value_and_grad(loss_fn)(params)
                updates, opt_state = tx.update(grads, opt_state)
                params = jax.tree.map(lambda a, u: a + u, params,
                                      updates)
                return params, opt_state, acc + loss

            _, _, acc = jax.lax.fori_loop(
                0, n_iters, body, (params, opt_state, jnp.float32(0))
            )
            return acc

        fn = lambda: chain(params, opt_state, wav)  # noqa: E731

    return _time_chain(fn, n_iters, rtt_ms=rtt) * 1e3


def streaming_latency(chunk_frames, n_chunks=12, batch=1):
    """Warm time-to-first-chunk and steady per-chunk wall ms for the
    streaming student path (each chunk = one jitted window call + a
    device->host chunk transfer; wall includes the axon tunnel RTT,
    reported separately for net figures)."""
    c = get_config("student_iaf")
    hop, sr = c.dsp.hop_length, c.dsp.sample_rate
    frames = chunk_frames * n_chunks
    model, variables = init_student(c, jax.random.PRNGKey(0))
    params = variables["params"]
    mel = jnp.asarray(
        np.random.default_rng(0)
        .uniform(0, 1, (batch, frames, c.dsp.n_mels)).astype(np.float32)
    )
    rtt = measure_round_trip_ms()

    def run():
        gen = stream_student_chunks(
            c, params, mel, key=jax.random.PRNGKey(1),
            chunk_frames=chunk_frames,
        )
        times = []
        t0 = time.perf_counter()
        for _ in gen:
            t1 = time.perf_counter()
            times.append((t1 - t0) * 1e3)
            t0 = t1
        return times

    cold = run()           # includes window_fn compile on chunk 0
    warm = run()
    steady = warm[1:]
    chunk_audio_ms = chunk_frames * hop / sr * 1e3
    mean_ms = float(np.mean(steady))
    return {
        "chunk_frames": chunk_frames,
        "chunk_audio_ms": round(chunk_audio_ms, 1),
        "cold_first_chunk_ms": round(cold[0], 1),
        "warm_first_chunk_ms": round(warm[0], 1),
        "steady_chunk_ms": round(mean_ms, 2),
        "steady_chunk_ms_net_rtt": round(mean_ms - rtt, 2),
        "x_realtime_wall": round(chunk_audio_ms / mean_ms, 1),
        "x_realtime_net_rtt": round(
            chunk_audio_ms / max(mean_ms - rtt, 1e-6), 1),
        "rtt_ms": round(rtt, 2),
    }


def main():
    emit("device", kind=str(jax.devices()[0]))
    tcfg = get_config("teacher_lj")

    for name, fn in (
        ("teacher_no_ema", lambda: teacher_step_ms(tcfg, 0.0)),
        ("teacher_ema", lambda: teacher_step_ms(tcfg, 0.9995)),
        ("teacher_no_ema_2", lambda: teacher_step_ms(tcfg, 0.0)),
        ("stream_cf64", lambda: streaming_latency(64)),
        ("stream_cf16", lambda: streaming_latency(16)),
        ("stream_cf64_b8", lambda: streaming_latency(64, batch=8)),
    ):
        try:
            r = fn()
            if isinstance(r, dict):
                emit(name, **r)
            else:
                emit(name, step_ms=round(r, 2))
        except Exception:
            emit(name, error="see traceback")
            traceback.print_exc()
    emit("done")


if __name__ == "__main__":
    main()
