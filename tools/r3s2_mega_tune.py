"""Round-3 session 2: generation megakernel micro-tuning, one TPU
process, back-to-back variants (CLAUDE.md measurement rules).

Knobs (flow_stack.py, read at trace time):
  PWN_TPU_MEGA_HIST_MB  history scratch budget -> batch block bb
  PWN_TPU_MEGA_ACT_BF16 tanh/sigmoid in bf16 instead of fp32
  fs.FLOW_TILE          time tile (module attr; 512 default)
"""
import os, sys, time, functools
import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
import pwn_tpu.ops.pallas.flow_stack as fs

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


def time_variant(args, dil, n_iters=8, reps=3, rtt=0.0):
    @jax.jit
    def chain(x0, cond, *w):
        def body(i, acc):
            s = fs.fused_flow_stack(
                x0 + (acc * 0).astype(x0.dtype), cond, *w, dilations=dil)
            return acc + s.astype(jnp.float32).sum()
        return jax.lax.fori_loop(0, n_iters, body, jnp.float32(0))

    force(chain(*args))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        force(chain(*args))
        best = min(best, time.perf_counter() - t0)
    return max(best - rtt / 1e3, 1e-9) / n_iters * 1e3


def set_knobs(hist_mb=4, act_bf16=False, tile=512):
    os.environ["PWN_TPU_MEGA_HIST_MB"] = str(hist_mb)
    os.environ["PWN_TPU_MEGA_ACT_BF16"] = "1" if act_bf16 else "0"
    fs.FLOW_TILE = tile


CASES = {
    "student_iaf": dict(B=8, T=44032, C=64, M=80, G=128, S=64, L=10),
    "config4": dict(B=8, T=24576, C=128, M=80, G=256, S=128, L=10),
}
DIL = tuple(2 ** i for i in range(10))
VARIANTS = [
    ("base(h4,f32,t512)", dict()),
    ("bb_up(h8)", dict(hist_mb=8)),
    ("act_bf16", dict(act_bf16=True)),
    ("bb_up+act", dict(hist_mb=8, act_bf16=True)),
    ("tile1024(h16)", dict(hist_mb=16, tile=1024)),
]

r = rtt_ms()
print(f"rtt {r:.1f} ms", flush=True)

for name, sh in CASES.items():
    args = make_args(**sh)
    # correctness anchor for semantic variants
    set_knobs()
    base_out = np.asarray(
        fs.fused_flow_stack(*args, dilations=DIL), np.float32)
    base_ms = None
    for vname, kn in VARIANTS:
        set_knobs(**kn)
        try:
            out = np.asarray(
                fs.fused_flow_stack(*args, dilations=DIL), np.float32)
            err = np.abs(out - base_out).max()
            ms = time_variant(args, DIL, rtt=r)
        except Exception as e:  # noqa: BLE001 — record and continue
            print(f"{name} {vname}: FAILED {type(e).__name__}: "
                  f"{str(e)[:120]}", flush=True)
            continue
        if base_ms is None:
            base_ms = ms
        print(f"{name} {vname}: {ms:.2f} ms  (vs base "
              f"{base_ms / ms:.2f}x, max|d|={err:.4f})", flush=True)
    # re-time base to bound chip drift
    set_knobs()
    ms = time_variant(args, DIL, rtt=r)
    print(f"{name} base again: {ms:.2f} ms", flush=True)

# --- end-to-end generate at the best knobs is run by a follow-up probe
print("done", flush=True)
