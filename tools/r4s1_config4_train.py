#!/usr/bin/env python
"""r4 session 1: settle config[4]'s training-parallelism story with data
(VERDICT r3 item 4).

Two questions, answered back-to-back in ONE process on the real chip:

1. Does `large_student_sharded` training fit + run fast on a single v5e
   chip at per-chip batch 8 with the fused kernels (the DP unit of
   work)?  Measure teacher / distill / direct steps, fused vs XLA.
2. The analytic side (printed for BASELINE.md): Megatron gate-sharded
   TP training is comm-bound ~7:1 per layer for this activation-
   dominated model (benchmarks.analytic_tp_efficiency), while DP's
   single grad all-reduce predicts >=93% weak-scaling efficiency
   (analytic_dp_efficiency).

Decision criterion: if the fused single-chip step fits HBM and beats
XLA, config[4] trains DP (mesh model=1) and the TP machinery remains
for state storage / generation sharding — BASELINE.md records it.
"""

import json
import sys

sys.path.insert(0, ".")

from bench import _tpu_tunnel_reachable  # noqa: E402

if not _tpu_tunnel_reachable():
    print("FATAL: axon tunnel unreachable")
    sys.exit(1)

import jax  # noqa: E402

from pwn_tpu.benchmarks import (  # noqa: E402
    analytic_dp_efficiency,
    analytic_tp_efficiency,
    measure_distill_train,
    measure_student_direct_train,
    measure_teacher_train,
)
from pwn_tpu.config import get_config, override  # noqa: E402
from pwn_tpu.utils.platform import (  # noqa: E402
    enable_persistent_compilation_cache,
)

enable_persistent_compilation_cache()
print("devices:", jax.devices(), flush=True)


def cfg4(batch, **flags):
    cfg = get_config("large_student_sharded")
    cfg = override(cfg, "train.global_batch_size", batch)
    cfg = override(cfg, "mesh.model", 1)  # single-chip DP unit of work
    for k, v in flags.items():
        cfg = override(cfg, k, v)
    return cfg


B = 8  # per-chip batch (global 64 over 8 chips DP)

results = {}
for mode, flags in (
    ("fused(auto)", {}),
    ("xla", {"teacher.fused_layers": "off",
             "student.fused_layers": "off"}),
):
    print(f"\n=== {mode} ===", flush=True)
    c = cfg4(B, **flags)
    r = {}
    r["teacher_train"] = measure_teacher_train(c)
    print("teacher:", json.dumps(r["teacher_train"]), flush=True)
    r["distill_train"] = measure_distill_train(c)
    print("distill:", json.dumps(r["distill_train"]), flush=True)
    r["student_direct"] = measure_student_direct_train(c)
    print("direct:", json.dumps(r["student_direct"]), flush=True)
    results[mode] = r

print("\n=== summary (config[4], single chip, batch 8 x 24576) ===")
for step in ("teacher_train", "distill_train", "student_direct"):
    f = results["fused(auto)"][step]["step_ms"]
    x = results["xla"][step]["step_ms"]
    print(f"{step}: fused {f:.1f} ms/step vs XLA {x:.1f} ms/step "
          f"({x / max(f, 1e-9):.2f}x)")

c = cfg4(B)
print("\nanalytic TP roofline:",
      json.dumps(analytic_tp_efficiency(c), indent=1))
dist = results["fused(auto)"]["distill_train"]["step_ms"]
print("\nanalytic DP roofline at the measured fused distill step:",
      json.dumps(analytic_dp_efficiency(c, dist,
                                        counts=(2, 4, 8, 16, 64))))
