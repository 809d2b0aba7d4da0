"""Round-2 TPU session 2: settle the AR-backend question with data
(VERDICT r1 item 5) — scan conv-queue vs whole-loop Pallas kernel,
back-to-back in ONE process, at teacher_lj and larger stacks.

The Pallas AR kernel keeps ALL stack weights + conv queues VMEM-resident
for the whole waveform; that bounds the stack size it can serve at all
(w_in alone is L * (2C+M) * G * 2 bytes) — stacks that exceed VMEM are
reported as errors, which is itself part of the answer.
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
from pwn_tpu.models.teacher import init_teacher


def emit(tag, **kw):
    print(json.dumps({"tag": tag, **kw}), flush=True)


def measure(cfg, backend, batch=8, seconds=0.25):
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


def main():
    emit("device", kind=str(jax.devices()[0]))
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
                r = measure(cfg, backend)
                emit("ar", case=name, backend=backend, **r)
            except Exception as e:
                emit("ar", case=name, backend=backend,
                     error=repr(e)[:300])
    emit("done")
    return 0


if __name__ == "__main__":
    sys.exit(main())
