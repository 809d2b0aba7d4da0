"""Round-3 session 1: q8 serving megakernel — correctness cross-check +
back-to-back speed A/B vs the bf16 megakernel, ONE TPU process.

Shapes: per-flow stack invocations as generation issues them —
  student_iaf  : C=64,  G=128, S=64,  L=10, T=22016 (2 s @ 22.05 kHz)
  config[4]    : C=128, G=256, S=128, L=10, T=24576 (~1 s @ 24 kHz)
"""
import sys, time, functools
import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from pwn_tpu.ops.pallas.flow_stack_q8 import (
    fused_flow_stack_q8, q8_reference_xla,
)
from pwn_tpu.ops.pallas.flow_stack import fused_flow_stack

cpu = jax.devices("cpu")[0]
print("devices:", jax.devices(), flush=True)


def make_args(B, T, C, M, G, S, L, seed=0):
    rng = np.random.default_rng(seed)
    dt = jnp.bfloat16
    return (
        jnp.asarray(rng.normal(0, 0.3, (B, T, C)), dt),
        jnp.asarray(rng.normal(0, 1.0, (B, T, M)), dt),
        jnp.asarray(rng.normal(0, 0.08, (L, 2 * C + M, G)), dt),
        jnp.asarray(rng.normal(0, 0.02, (L, G)), jnp.float32),
        jnp.asarray(rng.normal(0, 0.1, (L, G // 2, C + S)), dt),
        jnp.asarray(rng.normal(0, 0.02, (L, C + S)), jnp.float32),
    )


def snr(ref, x):
    e = np.asarray(ref, np.float32) - np.asarray(x, np.float32)
    return 10 * np.log10(
        (np.asarray(ref, np.float32) ** 2).mean() / max((e ** 2).mean(), 1e-20))


def force(x):
    return float(np.asarray(x))


def rtt_ms(reps=5):
    f = jax.jit(lambda a: a.sum())
    x = jnp.ones((8, 8))
    force(f(x))
    t0 = time.perf_counter()
    for _ in range(reps):
        force(f(x))
    return (time.perf_counter() - t0) / reps * 1e3


def time_chain(fn, args, n_iters=8, reps=3, rtt=0.0):
    """fn(x0, cond, *weights) -> skip; chain n_iters data-dependent calls."""
    @jax.jit
    def chain(x0, cond, *w):
        def body(i, acc):
            s = fn(x0 + (acc * 0).astype(x0.dtype), cond, *w)
            return acc + s.astype(jnp.float32).sum()
        return jax.lax.fori_loop(0, n_iters, body, jnp.float32(0))

    force(chain(*args))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        force(chain(*args))
        best = min(best, time.perf_counter() - t0)
    return max(best - rtt / 1e3, 1e-9) / n_iters * 1e3  # ms/call


CASES = {
    "student_iaf": dict(B=8, T=22016, C=64, M=80, G=128, S=64, L=10),
    "config4": dict(B=8, T=24576, C=128, M=80, G=256, S=128, L=10),
}
DIL = tuple(2 ** i for i in range(10))

# --- correctness: TPU q8 kernel vs CPU-emulated integer reference ------
a_small = make_args(8, 4096, 64, 80, 128, 64, 10)
with jax.default_device(cpu):
    ref = np.asarray(jax.jit(
        lambda *a: q8_reference_xla(*a, DIL), backend="cpu"
    )(*jax.device_put(a_small, cpu)), np.float32)
ker = np.asarray(fused_flow_stack_q8(*a_small, dilations=DIL), np.float32)
bf = np.asarray(fused_flow_stack(*a_small, dilations=DIL), np.float32)
print(f"xcheck: TPU q8 vs CPU int-ref SNR {snr(ref, ker):.1f} dB "
      f"(max abs {np.abs(ref - ker).max():.5f}); "
      f"q8 vs bf16 SNR {snr(bf, ker):.1f} dB", flush=True)

# --- speed A/B ---------------------------------------------------------
r = rtt_ms()
print(f"rtt {r:.1f} ms", flush=True)
for name, sh in CASES.items():
    args = make_args(**sh)
    bf_fn = functools.partial(fused_flow_stack, dilations=DIL)
    q8_fn = functools.partial(fused_flow_stack_q8, dilations=DIL)
    t_bf = time_chain(bf_fn, args, rtt=r)
    t_q8 = time_chain(q8_fn, args, rtt=r)
    t_bf2 = time_chain(bf_fn, args, rtt=r)  # re-measure to bound drift
    print(f"{name}: bf16 {t_bf:.2f} ms | q8 {t_q8:.2f} ms | "
          f"bf16 again {t_bf2:.2f} ms | q8 speedup "
          f"{min(t_bf, t_bf2) / t_q8:.2f}x", flush=True)
print("done", flush=True)
