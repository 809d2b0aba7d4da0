"""Round-2 TPU session 13: student-generation time breakdown.

At 1690x realtime (9.45 ms / batch 8 x 2 s) where does the time go?
Back-to-back in one process:
  1. full generate (upsample + flows + deemph-less module path)
  2. flows_from_z only, cond precomputed (isolates the flow stacks)
  3. upsample_cond only (isolates the transposed-conv upsampler)
The residual (1 - 2 - 3) is glue (noise draw, scaling).
"""

import json
import traceback

import jax
import jax.numpy as jnp
import numpy as np

from pwn_tpu.benchmarks import _time_chain, measure_round_trip_ms
from pwn_tpu.config import get_config
from pwn_tpu.models.student import init_student


def emit(tag, **kw):
    print(json.dumps({"tag": tag, **kw}), flush=True)


def main():
    emit("device", kind=str(jax.devices()[0]))
    cfg = get_config("student_iaf")
    sr, hop = cfg.dsp.sample_rate, cfg.dsp.hop_length
    B, seconds = 8, 2.0
    frames = int(seconds * sr) // hop
    model, variables = init_student(cfg, jax.random.PRNGKey(0))
    params = variables["params"]
    mel = jnp.asarray(
        np.random.default_rng(0)
        .uniform(0, 1, (B, frames, cfg.dsp.n_mels)).astype(np.float32)
    )
    rtt = measure_round_trip_ms()
    n_iters = 8

    def timed(name, fn, *args):
        @jax.jit
        def chain(params, key, *a):
            def body(i, acc):
                out = fn(params, jax.random.fold_in(key, i), *a)
                return acc + out.sum()

            return jax.lax.fori_loop(0, n_iters, body, jnp.float32(0))

        try:
            dt = _time_chain(
                lambda: chain(params, jax.random.PRNGKey(1), *args),
                n_iters, rtt_ms=rtt,
            )
            emit(name, call_ms=round(dt * 1e3, 3))
            return dt
        except Exception:
            emit(name, error="see traceback")
            traceback.print_exc()
            return None

    def full(params, key, mel):
        return model.apply({"params": params}, key, mel,
                           method="generate")

    def ups(params, key, mel):
        return model.apply({"params": params}, mel,
                           method="upsample_cond")

    t_full = timed("full_generate", full, mel)

    cond = model.apply({"params": params}, mel, method="upsample_cond")
    cond = jax.block_until_ready(cond)
    T = cond.shape[1]

    def flows(params, key, cond):
        z = jax.random.logistic(key, (B, T), jnp.float32)
        return model.apply({"params": params}, z, cond,
                           method="flows_from_z")

    t_flows = timed("flows_plus_noise", flows, cond)
    t_ups = timed("upsample_only", ups, mel)

    if t_full and t_flows and t_ups:
        emit("breakdown", full_ms=round(t_full * 1e3, 3),
             flows_ms=round(t_flows * 1e3, 3),
             upsample_ms=round(t_ups * 1e3, 3),
             glue_ms=round((t_full - t_flows - t_ups) * 1e3, 3))
    emit("done")


if __name__ == "__main__":
    main()
