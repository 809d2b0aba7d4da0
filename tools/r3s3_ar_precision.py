#!/usr/bin/env python
"""r3 session 3 diagnostic: is the gaussian AR kernel's 0.02-0.03
TPU-vs-scan divergence a miscompile or ordinary MXU precision drift
compounding through the AR feedback loop?

Method: tiny fp32 config, shared pre-drawn noise stream; reference =
conv-queue scan ON CPU (exact fp32).  Compare (a) scan on TPU and
(b) Pallas kernel on TPU against it, for BOTH heads (mol = shipped
default control).  If scan-TPU drifts from scan-CPU by the same order
as pallas-TPU, the kernel is innocent — it's default-precision matmuls
feeding back sample-by-sample.  Also report the first step where the
two TPU paths disagree by >1e-3 (gradual onset = compounding noise;
instant = real bug).
"""

import sys

sys.path.insert(0, ".")

from bench import _tpu_tunnel_reachable  # noqa: E402

if not _tpu_tunnel_reachable():
    print("FATAL: axon tunnel unreachable")
    sys.exit(1)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from pwn_tpu.config import get_config, override  # noqa: E402
from pwn_tpu.models import sampling  # noqa: E402
from pwn_tpu.models.teacher import init_teacher  # noqa: E402
from pwn_tpu.utils.platform import (  # noqa: E402
    enable_persistent_compilation_cache,
)

enable_persistent_compilation_cache()
print("devices:", jax.devices(), flush=True)
cpu = jax.devices("cpu")[0]

B, F = 4, 4
for head in ("mol", "gaussian"):
    cfg = get_config("tiny_teacher")
    if head == "gaussian":
        cfg = override(cfg, "teacher.output", "gaussian")
    model, variables = init_teacher(cfg, jax.random.PRNGKey(0))
    T = F * cfg.dsp.hop_length
    mel = jnp.asarray(
        np.random.default_rng(0)
        .uniform(0, 1, (B, F, cfg.dsp.n_mels))
        .astype(np.float32)
    )
    key = jax.random.PRNGKey(7)
    noise = sampling.draw_noise(cfg, key, T, B)

    with jax.default_device(cpu):
        v_c = jax.device_put(variables, cpu)
        ref = np.asarray(
            sampling.fast_sample(model, v_c, key,
                                 jax.device_put(mel, cpu),
                                 uniforms=jax.device_put(noise, cpu))
        )
    scan_tpu = np.asarray(
        sampling.fast_sample(model, variables, key, mel, uniforms=noise)
    )
    pallas_tpu = np.asarray(
        sampling.fast_sample_pallas(model, variables, key, mel)
    )

    def rows(a, b):
        return np.array2string(np.abs(a - b).max(axis=1), precision=4)

    print(f"[{head}] scan-TPU  vs scan-CPU rows:", rows(scan_tpu, ref))
    print(f"[{head}] pallas    vs scan-CPU rows:", rows(pallas_tpu, ref))
    print(f"[{head}] pallas    vs scan-TPU rows:", rows(pallas_tpu,
                                                        scan_tpu))
    d = np.abs(pallas_tpu - scan_tpu)
    onset = [int(np.argmax(d[b] > 1e-3)) if (d[b] > 1e-3).any() else -1
             for b in range(B)]
    print(f"[{head}] first step |pallas-scanTPU|>1e-3 per row:", onset,
          flush=True)
