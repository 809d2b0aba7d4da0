#!/usr/bin/env python
"""r4 session 2: long-horizon AR numeric drift (VERDICT r3 item 5).

r3 calibrated ~0.02 abs drift at 512 feedback steps (both TPU backends
vs the exact fp32 CPU scan, tools/r3s3_ar_precision.py); real teacher
resynthesis runs 1e4-1e5 steps.  This tool measures, in ONE process:

A. Drift GROWTH: tiny fp32 config, both heads, one 49152-step run per
   backend on a shared noise stream; per-row max |TPU - exactCPU| over
   prefixes t in {512, 2k, 8k, 16k, 32k, 49k}.  (Prefix comparison is
   valid because all backends consume the identical pre-drawn stream.)

B. AUDIO impact at production size: train teacher_lj (bf16) in-process
   for 2k steps on a tone corpus, resynthesize a held-out 1 s clip with
   (pallas-TPU | scan-TPU | exact CPU scan), report pairwise mel-L2 and
   mel-L2 vs source — does numeric drift change the audio metrics?

C. The fp32-stored-weights kernel variant (weights_dtype="float32",
   fp32 inner compute either way): drift vs exact CPU and per-step cost
   vs the bf16-stored default, teacher_lj size.
"""

import sys
import time

sys.path.insert(0, ".")

from bench import _tpu_tunnel_reachable  # noqa: E402

if not _tpu_tunnel_reachable():
    print("FATAL: axon tunnel unreachable")
    sys.exit(1)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
import optax  # noqa: E402

from pwn_tpu.config import get_config, override  # noqa: E402
from pwn_tpu.models import sampling  # noqa: E402
from pwn_tpu.models.teacher import init_teacher  # noqa: E402
from pwn_tpu.utils.platform import (  # noqa: E402
    enable_persistent_compilation_cache,
)

enable_persistent_compilation_cache()
print("devices:", jax.devices(), flush=True)
cpu = jax.devices("cpu")[0]

CHECKPOINTS = (512, 2048, 8192, 16384, 32768, 49152)


def prefix_drift(a, b, T):
    return {t: float(np.abs(a[:, :t] - b[:, :t]).max())
            for t in CHECKPOINTS if t <= T}


# --------------------------------------------------------------- part A
B = 4
for head in ("mol", "gaussian"):
    cfg = get_config("tiny_teacher")
    if head == "gaussian":
        cfg = override(cfg, "teacher.output", "gaussian")
    hop = cfg.dsp.hop_length
    F = 49152 // hop
    T = F * hop
    model, variables = init_teacher(cfg, jax.random.PRNGKey(0))
    mel = jnp.asarray(
        np.random.default_rng(0)
        .uniform(0, 1, (B, F, cfg.dsp.n_mels)).astype(np.float32)
    )
    key = jax.random.PRNGKey(7)
    noise = sampling.draw_noise(cfg, key, T, B)

    with jax.default_device(cpu):
        v_c = jax.device_put(variables, cpu)
        t0 = time.time()
        ref = np.asarray(sampling.fast_sample(
            model, v_c, key, jax.device_put(mel, cpu),
            uniforms=jax.device_put(noise, cpu),
        ))
        print(f"[{head}] exact CPU scan {T} steps: {time.time()-t0:.0f}s",
              flush=True)
    scan_tpu = np.asarray(
        sampling.fast_sample(model, variables, key, mel, uniforms=noise)
    )
    pallas_tpu = np.asarray(
        sampling.fast_sample_pallas(model, variables, key, mel)
    )
    print(f"[{head}] drift vs exact CPU (max over {B} rows):")
    for name, a in (("scan-TPU", scan_tpu), ("pallas-TPU", pallas_tpu)):
        d = prefix_drift(a, ref, T)
        print(f"  {name}: " + "  ".join(
            f"t={t}: {v:.4f}" for t, v in d.items()), flush=True)

# --------------------------------------------------------------- part B
print("\n=== part B: audio impact at teacher_lj size (bf16) ===",
      flush=True)
from pwn_tpu.data import SyntheticTones  # noqa: E402
from pwn_tpu.training.teacher import prepare_batch  # noqa: E402
from pwn_tpu.utils import dsp  # noqa: E402

cfg = override(get_config("teacher_lj"), "teacher.fused_layers",
               "mega_train")
model, variables = init_teacher(cfg, jax.random.PRNGKey(0),
                                use_scan=False)
params = variables["params"]
tx = optax.adam(1e-3)
opt = tx.init(params)
ds = SyntheticTones(8, cfg.train.crop_samples, cfg.dsp.sample_rate,
                    seed=3)
wav = jnp.asarray(np.stack([ds[i] for i in range(8)]))
x, mel_tr = prepare_batch(wav, cfg)


@jax.jit
def step(p, o):
    l, g = jax.value_and_grad(
        lambda q: model.apply({"params": q}, x, mel_tr, method="loss")
    )(p)
    u, o = tx.update(g, o)
    return optax.apply_updates(p, u), o, l


t0 = time.time()
for i in range(2000):
    params, opt, l = step(params, opt)
print(f"teacher_lj 2k steps: NLL {float(l):.3f}, "
      f"{time.time()-t0:.0f}s wall", flush=True)

# held-out clip, 1 s
sr = cfg.dsp.sample_rate
hop = cfg.dsp.hop_length
clip = SyntheticTones(1, sr, sr, seed=7919)[0]
xh = jnp.clip(dsp.preemphasis(jnp.asarray(clip)[None],
                              cfg.dsp.preemphasis), -1, 1)
mel_h = dsp.mel_spectrogram(xh, cfg.dsp)[:, : sr // hop]
F = mel_h.shape[1]
T = F * hop
# AR generation model (plain stack flags for sampling paths)
gen_model, _ = init_teacher(get_config("teacher_lj"),
                            jax.random.PRNGKey(0))
gv = {"params": params}
key = jax.random.PRNGKey(11)
noise = sampling.draw_noise(cfg, key, T, 1)

t0 = time.time()
pall = np.asarray(sampling.fast_sample_pallas(
    gen_model, gv, key, mel_h, temperature=0.8))
print(f"pallas-TPU 1 s resynthesis: {time.time()-t0:.1f}s", flush=True)
t0 = time.time()
pall32 = np.asarray(sampling.fast_sample_pallas(
    gen_model, gv, key, mel_h, temperature=0.8,
    weights_dtype="float32"))
print(f"pallas-TPU fp32-weights: {time.time()-t0:.1f}s", flush=True)
scan_t = np.asarray(sampling.fast_sample(
    gen_model, gv, key, mel_h, uniforms=noise, temperature=0.8))
with jax.default_device(cpu):
    gv_c = jax.device_put(gv, cpu)
    t0 = time.time()
    ref = np.asarray(sampling.fast_sample(
        gen_model, gv_c, key, jax.device_put(mel_h, cpu),
        uniforms=jax.device_put(noise, cpu), temperature=0.8))
    print(f"exact CPU scan 1 s: {time.time()-t0:.0f}s", flush=True)


def mel_l2(a, b):
    ma = dsp.mel_spectrogram(jnp.asarray(a), cfg.dsp)
    mb = dsp.mel_spectrogram(jnp.asarray(b), cfg.dsp)
    return float(jnp.sqrt(jnp.mean((ma - mb) ** 2)))


print("\nwaveform max|diff| vs exact CPU:")
for name, a in (("pallas", pall), ("pallas-fp32w", pall32),
                ("scan-TPU", scan_t)):
    print(f"  {name}: {np.abs(a - ref).max():.4f}  "
          f"mel-L2 vs CPU-AR: {mel_l2(a, ref):.5f}", flush=True)
print("mel-L2 vs source (drift-relevance yardstick):")
src = np.asarray(xh)
for name, a in (("cpu-exact", ref), ("pallas", pall),
                ("pallas-fp32w", pall32), ("scan-TPU", scan_t)):
    print(f"  {name}: {mel_l2(a, src):.5f}", flush=True)

# --------------------------------------------------------------- part C
print("\n=== part C: fp32-stored-weights kernel cost (teacher_lj) ===",
      flush=True)
from pwn_tpu.benchmarks import _time_chain  # noqa: E402

B2, F2 = 8, 21
mel_b = jnp.asarray(
    np.random.default_rng(0)
    .uniform(0, 1, (B2, F2, cfg.dsp.n_mels)).astype(np.float32)
)
T2 = F2 * hop
for name, kw in (("bf16-weights", {}),
                 ("fp32-weights", {"weights_dtype": "float32"})):
    @jax.jit
    def chain(v, key, mel, n, kw=kw):
        def body(i, acc):
            w = sampling.fast_sample_pallas(
                gen_model, v, jax.random.fold_in(key, i), mel, **kw)
            return acc + w.sum()
        return jax.lax.fori_loop(0, n, body, jnp.float32(0))

    dt, meta = _time_chain(
        lambda n: chain(gv, jax.random.PRNGKey(1), mel_b,
                        jnp.int32(n)), 1)
    if dt is None:
        print(f"  {name}: timing error: {meta}")
    else:
        print(f"  {name}: {dt / T2 * 1e6:.2f} us/step "
              f"({B2 * T2 / dt / 1e6:.2f} M samples/s)  [{meta}]",
              flush=True)
