"""Benchmark suite (SURVEY.md §6: primary metric = audio-seconds/s per
chip for student IAF inference; secondary = teacher train utterances/s).

Measurement methodology, forced by the axon tunnel platform:

* `block_until_ready` does NOT synchronize on this platform (execution is
  deferred until a host transfer), so every timed region is forced by a
  scalar device->host transfer of a checksum that depends on the full
  computation;
* each sync costs a ~30 ms tunnel round-trip, so N iterations are CHAINED
  inside one jitted `fori_loop` (data-dependent through an accumulator) and
  a single transfer closes the chain; the measured round-trip latency is
  subtracted once;
* reported numbers are the best of a few chain repetitions (steady-state,
  post-compile).
"""

from __future__ import annotations

import time
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from pwn_tpu.config import Config, get_config
from pwn_tpu.data import SyntheticTones, make_train_iterator
from pwn_tpu.models import sampling
from pwn_tpu.models.student import init_student
from pwn_tpu.models.teacher import init_teacher
from pwn_tpu.training.common import make_optimizer
from pwn_tpu.training.teacher import prepare_batch


def _force(x) -> float:
    """Synchronize by transferring a scalar to host."""
    return float(np.asarray(x))


def measure_round_trip_ms(reps: int = 5) -> float:
    x = jnp.ones((8, 8))
    f = jax.jit(lambda a: a.sum())
    _force(f(x))
    t0 = time.perf_counter()
    for _ in range(reps):
        _force(f(x))
    return (time.perf_counter() - t0) / reps * 1e3


def _time_chain(chain_fn, n_iters: int, reps: int = 3,
                rtt_ms: float | None = None) -> float:
    """Best per-iteration seconds for a jitted chain of n_iters steps."""
    _force(chain_fn())  # compile + warmup
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        _force(chain_fn())
        best = min(best, time.perf_counter() - t0)
    if rtt_ms is not None:
        best = max(best - rtt_ms / 1e3, 1e-9)
    return best / n_iters


def measure_student_inference(
    cfg: Config, batch: int = 8, seconds: float = 2.0, n_iters: int = 8
) -> Dict[str, Any]:
    """Student parallel synthesis throughput: audio-seconds/s per chip."""
    sr = cfg.dsp.sample_rate
    hop = cfg.dsp.hop_length
    frames = int(seconds * sr) // hop
    T = frames * hop
    model, variables = init_student(cfg, jax.random.PRNGKey(0))
    mel = jnp.asarray(
        np.random.default_rng(0)
        .uniform(0, 1, (batch, frames, cfg.dsp.n_mels))
        .astype(np.float32)
    )
    rtt = measure_round_trip_ms()

    @jax.jit
    def chain(v, key, mel):
        def body(i, acc):
            w = model.apply(v, jax.random.fold_in(key, i), mel,
                            method="generate")
            return acc + w.sum()

        return jax.lax.fori_loop(0, n_iters, body, jnp.float32(0))

    key = jax.random.PRNGKey(1)
    dt = _time_chain(lambda: chain(variables, key, mel), n_iters,
                     rtt_ms=rtt)
    audio_sec = batch * T / sr
    n_dev = jax.local_device_count()
    return {
        "audio_sec_per_s_per_chip": audio_sec / dt / n_dev,
        "batch": batch,
        "samples": T,
        "step_ms": dt * 1e3,
        "samples_per_s": batch * T / dt,
        "round_trip_ms": rtt,
    }


def measure_teacher_train(cfg: Config, n_iters: int = 6) -> Dict[str, Any]:
    """Teacher teacher-forcing training throughput: utterances/s."""
    from pwn_tpu.config import override

    # same model mode as the real training loop: the fused-backward
    # train megakernel on TPU (18.2 vs 42.6 ms/step on v5e, r2 session
    # 1), unrolled XLA on CPU (resolve_stack_mode maps mega_train->xla
    # there)
    cfg = override(cfg, "teacher.fused_layers", "mega_train")
    model, variables = init_teacher(cfg, jax.random.PRNGKey(0),
                                    use_scan=False)
    tx = make_optimizer(cfg.train)
    params = variables["params"]
    opt_state = tx.init(params)
    B = cfg.train.global_batch_size
    ds = SyntheticTones(8, cfg.train.crop_samples, cfg.dsp.sample_rate)
    wav = jnp.asarray(next(make_train_iterator(ds, cfg, B, seed=0)))
    rtt = measure_round_trip_ms()

    @jax.jit
    def chain(params, opt_state, wav):
        x, mel = prepare_batch(wav, cfg)

        def body(i, carry):
            params, opt_state, acc = carry

            def loss_fn(p):
                return model.apply({"params": p}, x, mel, method="loss")

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = tx.update(grads, opt_state)
            params = jax.tree.map(lambda a, u: a + u, params, updates)
            return params, opt_state, acc + loss

        _, _, acc = jax.lax.fori_loop(
            0, n_iters, body, (params, opt_state, jnp.float32(0))
        )
        return acc

    dt = _time_chain(lambda: chain(params, opt_state, wav), n_iters,
                     rtt_ms=rtt)
    return {
        "teacher_utt_per_s": B / dt,
        "step_ms": dt * 1e3,
        "batch": B,
        "crop_samples": cfg.train.crop_samples,
        "samples_per_s": B * cfg.train.crop_samples / dt,
    }


def measure_distill_train(cfg: Config, n_iters: int = 4) -> Dict[str, Any]:
    """Distillation step throughput (BASELINE config[3] workload):
    student fwd+bwd + frozen-teacher scoring per utterance batch."""
    from pwn_tpu.config import override
    from pwn_tpu.models.student import init_student
    from pwn_tpu.training.distill import distillation_losses

    # mirror run_distillation's mode resolution: frozen teacher scored
    # via mega_dx (dx-only fused backward), student on mega_train
    # (53.9 -> 30.9 ms/step together, r2 session 12)
    t_flag = "mega_dx" if cfg.teacher.fused_layers == "auto" \
        else cfg.teacher.fused_layers
    s_flag = "mega_train" if cfg.student.fused_layers == "auto" \
        else cfg.student.fused_layers
    teacher, t_vars = init_teacher(
        override(cfg, "teacher.fused_layers", t_flag),
        jax.random.PRNGKey(0), use_scan=True,
    )
    student, s_vars = init_student(
        override(cfg, "student.fused_layers", s_flag),
        jax.random.PRNGKey(1), use_scan=False,
    )
    tx = make_optimizer(cfg.train)
    params = s_vars["params"]
    opt_state = tx.init(params)
    B = cfg.train.global_batch_size
    ds = SyntheticTones(8, cfg.train.crop_samples, cfg.dsp.sample_rate)
    wav = jnp.asarray(next(make_train_iterator(ds, cfg, B, seed=0)))
    rtt = measure_round_trip_ms()

    @jax.jit
    def chain(params, opt_state, t_params, wav, key):
        x_ref, mel = prepare_batch(wav, cfg)

        def body(i, carry):
            params, opt_state, acc = carry

            def loss_fn(p):
                loss, _ = distillation_losses(
                    student, teacher, p, t_params, x_ref, mel,
                    jax.random.fold_in(key, i), cfg,
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
    return {
        "distill_utt_per_s": B / dt,
        "step_ms": dt * 1e3,
        "batch": B,
        "crop_samples": cfg.train.crop_samples,
    }


def measure_student_direct_train(cfg: Config,
                                 n_iters: int = 4) -> Dict[str, Any]:
    """Direct (teacher-free) student training throughput — the
    reference's WIP mode (SURVEY.md §2a low-confidence flag): IAF
    closed-form NLL + power loss, student on the mega_train fused
    backward (70.4 -> 19.6 ms/step on v5e, r2 session 9)."""
    from pwn_tpu.config import override
    from pwn_tpu.models.student import init_student
    from pwn_tpu.training.student_direct import direct_student_losses

    s_flag = "mega_train" if cfg.student.fused_layers == "auto" \
        else cfg.student.fused_layers
    student, s_vars = init_student(
        override(cfg, "student.fused_layers", s_flag),
        jax.random.PRNGKey(1), use_scan=False,
    )
    tx = make_optimizer(cfg.train)
    params = s_vars["params"]
    opt_state = tx.init(params)
    B = cfg.train.global_batch_size
    ds = SyntheticTones(8, cfg.train.crop_samples, cfg.dsp.sample_rate)
    wav = jnp.asarray(next(make_train_iterator(ds, cfg, B, seed=0)))
    rtt = measure_round_trip_ms()

    @jax.jit
    def chain(params, opt_state, wav, key):
        x_ref, mel = prepare_batch(wav, cfg)

        def body(i, carry):
            params, opt_state, acc = carry

            def loss_fn(p):
                loss, _ = direct_student_losses(
                    student, p, x_ref, mel,
                    jax.random.fold_in(key, i), cfg,
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
        lambda: chain(params, opt_state, wav, jax.random.PRNGKey(2)),
        n_iters, rtt_ms=rtt,
    )
    return {
        "student_direct_utt_per_s": B / dt,
        "step_ms": dt * 1e3,
        "batch": B,
        "crop_samples": cfg.train.crop_samples,
    }


def measure_teacher_ar_sampling(
    cfg: Config, batch: int = 8, seconds: float = 0.25
) -> Dict[str, Any]:
    """Teacher AR sampling throughput (the default backend: whole-loop
    Pallas kernel on TPU — 4-6x over the conv-queue scan at every
    measured size, r2 session 3 — scan on CPU)."""
    sr = cfg.dsp.sample_rate
    hop = cfg.dsp.hop_length
    frames = max(int(seconds * sr) // hop, 2)
    T = frames * hop
    model, variables = init_teacher(cfg, jax.random.PRNGKey(0))
    mel = jnp.asarray(
        np.random.default_rng(0)
        .uniform(0, 1, (batch, frames, cfg.dsp.n_mels))
        .astype(np.float32)
    )
    rtt = measure_round_trip_ms()

    fn = (
        sampling.fast_sample
        if jax.default_backend() == "cpu"
        else sampling.fast_sample_pallas
    )

    @jax.jit
    def run(v, key, mel):
        return fn(model, v, key, mel).sum()

    key = jax.random.PRNGKey(1)
    dt = _time_chain(lambda: run(variables, key, mel), 1, rtt_ms=rtt)
    return {
        "ar_samples_per_s": batch * T / dt,
        "ar_steps_per_s": T / dt,
        "ar_audio_sec_per_s": batch * T / sr / dt,
        "ar_us_per_step": dt / T * 1e6,
        "batch": batch,
        "samples": T,
    }


# ---------------------------------------------------------------------------
# Analytic FLOPs model + MFU (SURVEY.md §6; VERDICT r1 next-item 9)
# ---------------------------------------------------------------------------

# bf16 peak per chip by device kind substring (datasheet numbers).
_PEAK_BF16_TFLOPS = {
    "v5 lite": 197.0, "v5e": 197.0, "v5litepod": 197.0,
    "v4": 275.0, "v5p": 459.0, "v6e": 918.0, "v6": 918.0,
}


def peak_bf16_tflops() -> float | None:
    kind = getattr(jax.devices()[0], "device_kind", "").lower()
    for key, val in _PEAK_BF16_TFLOPS.items():
        if key in kind:
            return val
    return None


def _stack_macs_per_sample(C: int, G: int, S: int, M: int, L: int,
                           out_dim: int) -> float:
    """MACs per output timestep of one WaveNetStack (front 1x1 + L gated
    layers as two wide GEMMs + relu/1x1/1x1 head) — mirrors
    models/modules.py::gated_layer_xla exactly."""
    return (C                               # front 1x1 (1 -> C)
            + L * ((2 * C + M) * G          # gate GEMM [x|shift|cond]@w_in
                   + (G // 2) * (C + S))    # out GEMM z@[w_res|w_skip]
            + S * S + S * out_dim)          # head1 + head2


def _upsample_macs_per_sample(cfg: Config) -> float:
    """Transposed-conv mel upsampler MACs amortized per OUTPUT sample."""
    M = cfg.dsp.n_mels
    strides = list(cfg.teacher.upsample_strides)
    mult = cfg.teacher.upsample_kernel_mult
    total = 0.0
    for i, s in enumerate(strides):
        after = 1
        for s2 in strides[i + 1:]:
            after *= s2
        total += (s * mult) * M * M / after
    return total


def student_gen_flops_per_sample(cfg: Config) -> float:
    """Forward FLOPs per generated audio sample (all flows + upsampler)."""
    sc = cfg.student
    macs = cfg.student.n_flows * _stack_macs_per_sample(
        sc.residual_channels, sc.gate_channels, sc.skip_channels,
        cfg.dsp.n_mels, sc.layers_per_flow, out_dim=2,
    ) + _upsample_macs_per_sample(cfg)
    return 2.0 * macs


def teacher_fwd_flops_per_sample(cfg: Config) -> float:
    tc = cfg.teacher
    macs = _stack_macs_per_sample(
        tc.residual_channels, tc.gate_channels, tc.skip_channels,
        cfg.dsp.n_mels, tc.n_layers, out_dim=tc.head_dim,
    ) + _upsample_macs_per_sample(cfg)
    return 2.0 * macs


def analytic_dp_efficiency(cfg: Config, step_ms: float,
                           counts=(2, 4, 8, 16, 64, 256)) -> Any:
    """Predicted DP weak-scaling efficiency from the roofline the CPU
    sim cannot measure (its 8 virtual devices share 4 host cores, so
    measured sim "efficiency" reflects oversubscription, not ICI).

    Model: per step, fp32 gradients ring-all-reduce 2·P·(n−1)/n bytes
    per chip; efficiency = step / (step + comm), zero overlap assumed
    (conservative — XLA overlaps the all-reduce with the backward).
    Bandwidths: v5e ICI 2×45 GB/s per chip along one torus axis
    (intra-slice), DCN ≈ 25 GB/s per host (the ≥2-host rows; 8 chips'
    grads funnel through one host NIC after an intra-slice reduce).
    SURVEY §6 target: ≥85 % to N≥2 hosts.
    """
    import numpy as _np

    tpl = jax.eval_shape(
        lambda k: init_teacher(cfg, k)[1]["params"], jax.random.PRNGKey(0)
    )
    p_bytes = sum(
        int(_np.prod(leaf.shape)) * 4 for leaf in jax.tree.leaves(tpl)
    )
    ICI_BW = 9.0e10   # bytes/s, v5e, one torus axis both directions
    DCN_BW = 2.5e10   # bytes/s per host
    rows = []
    for n in counts:
        hosts = max(1, n // 8)
        if hosts == 1:
            comm_s = 2.0 * p_bytes * (n - 1) / n / ICI_BW
            link = "ici"
        else:
            # intra-slice reduce (ICI) + inter-host ring over DCN
            comm_s = (2.0 * p_bytes * 7 / 8 / ICI_BW
                      + 2.0 * p_bytes * (hosts - 1) / hosts / DCN_BW)
            link = "dcn"
        eff = (step_ms / 1e3) / ((step_ms / 1e3) + comm_s)
        rows.append({"devices": n, "hosts": hosts, "link": link,
                     "comm_ms": round(comm_s * 1e3, 3),
                     "predicted_efficiency": round(eff, 4)})
    return {"param_bytes": p_bytes, "step_ms": step_ms,
            "note": "ring all-reduce roofline, zero overlap assumed",
            "rows": rows}


def _dp_scaling_cpu_sim() -> Any:
    """CPU-simulated DP scaling table in a subprocess with 8 virtual
    devices (the single-chip axon environment cannot grow real devices).
    Rows are labelled sim — throughput is bounded by the shared host
    cores (4), so the table audits the sharding machinery end-to-end,
    not ICI; `analytic_dp_efficiency` carries the hardware claim."""
    import json
    import os
    import subprocess
    import sys

    code = (
        "import json, os\n"
        "os.environ['JAX_PLATFORMS'] = 'cpu'\n"
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "from pwn_tpu.benchmarks import measure_scaling\n"
        "from pwn_tpu.config import get_config, override\n"
        "cfg = override(get_config('tiny_teacher'),"
        " 'train.crop_samples', 1024)\n"
        "cfg = override(cfg, 'train.global_batch_size', 8)\n"
        "print('DPSCALE ' + json.dumps(measure_scaling(cfg, n_iters=2)))\n"
    )
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                        + " --xla_force_host_platform_device_count=8")
    try:
        r = subprocess.run(
            [sys.executable, "-c", code], env=env, capture_output=True,
            text=True, timeout=600, cwd=os.path.dirname(
                os.path.dirname(os.path.abspath(__file__))),
        )
        for line in r.stdout.splitlines():
            if line.startswith("DPSCALE "):
                rows = json.loads(line[len("DPSCALE "):])
                for row in rows:
                    row["sim"] = "cpu-8dev-tiny"
                return rows
        return {"error": (r.stderr or r.stdout)[-500:]}
    except Exception as e:  # never fail the bench over the sim table
        return {"error": repr(e)}


def run_bench(case: str = "student_iaf", overrides=None,
              full: bool = True) -> Dict[str, Any]:
    cfg = get_config(case, **(overrides or {}))
    student = measure_student_inference(cfg)
    detail: Dict[str, Any] = {"student": student,
                              "device": str(jax.devices()[0])}
    peak = peak_bf16_tflops()
    s_flops_rate = (student_gen_flops_per_sample(cfg)
                    * student["samples_per_s"])
    mfu: Dict[str, Any] = {
        "peak_bf16_tflops": peak,
        "student_infer_tflops": round(s_flops_rate / 1e12, 3),
        "student_infer": (round(s_flops_rate / (peak * 1e12), 4)
                          if peak else None),
        "note": "analytic GEMM/conv FLOPs vs datasheet bf16 peak",
    }
    if full:
        detail["teacher_train"] = measure_teacher_train(
            get_config("teacher_lj")
        )
        detail["distill_train"] = measure_distill_train(
            get_config("student_iaf")
        )
        detail["student_direct_train"] = measure_student_direct_train(
            get_config("student_iaf")
        )
        detail["teacher_ar"] = measure_teacher_ar_sampling(
            get_config("teacher_lj")
        )
        # train fwd+bwd ~= 3x forward FLOPs
        t_cfg = get_config("teacher_lj")
        t_rate = (3.0 * teacher_fwd_flops_per_sample(t_cfg)
                  * detail["teacher_train"]["samples_per_s"])
        mfu["teacher_train_tflops"] = round(t_rate / 1e12, 3)
        mfu["teacher_train"] = (round(t_rate / (peak * 1e12), 4)
                                if peak else None)
        if jax.local_device_count() > 1:
            detail["dp_scaling"] = measure_scaling(
                get_config("teacher_lj")
            )
        else:
            detail["dp_scaling"] = _dp_scaling_cpu_sim()
        detail["dp_analytic"] = analytic_dp_efficiency(
            t_cfg, detail["teacher_train"]["step_ms"]
        )
    detail["mfu"] = mfu
    value = student["audio_sec_per_s_per_chip"]
    return {
        # ONE-LINE driver contract (repo-root bench.py prints this):
        "metric": "student_audio_sec_per_s_per_chip",
        "value": round(value, 2),
        "unit": "audio-sec/s/chip (= x realtime)",
        # north-star target is >100x realtime per chip (BASELINE.json)
        "vs_baseline": round(value / 100.0, 3),
        "detail": detail,
    }


def measure_scaling(cfg: Config, n_iters: int = 4):
    """DP scaling table over the locally visible devices (SURVEY.md §6
    "measurement points: 1 chip, 1 host, N hosts").

    On the single-chip axon environment this yields the 1-chip row only;
    on a pod slice (or the CPU sim mesh) it measures each power-of-two
    device count and reports efficiency vs the 1-device row.
    """
    import numpy as _np
    from jax.sharding import Mesh

    from pwn_tpu.config import override
    from pwn_tpu.parallel.mesh import batch_sharding, replicated

    cfg = override(cfg, "teacher.fused_layers", "off")
    devices = jax.devices()
    counts = [n for n in (1, 2, 4, 8, 16, 32) if n <= len(devices)]
    model, variables = init_teacher(cfg, jax.random.PRNGKey(0),
                                    use_scan=False)
    rows = []
    for n in counts:
        mesh = Mesh(_np.asarray(devices[:n]).reshape(n, 1),
                    ("data", "model"))
        # weak scaling: per-device batch held at the 1-device global
        # batch (the convention behind SURVEY §6's "batch 256 across 2
        # hosts" config); ideal = flat step_ms, efficiency 1.0
        B = cfg.train.global_batch_size * n
        ds = SyntheticTones(8, cfg.train.crop_samples, cfg.dsp.sample_rate)
        wav = jax.device_put(
            next(make_train_iterator(ds, cfg, B, seed=0)),
            batch_sharding(mesh),
        )
        params = jax.device_put(variables["params"], replicated(mesh))
        rtt = measure_round_trip_ms()

        @jax.jit
        def chain(params, wav):
            x, mel = prepare_batch(wav, cfg)

            def body(i, acc):
                def loss_fn(p):
                    return model.apply({"params": p}, x, mel,
                                       method="loss")

                loss, grads = jax.value_and_grad(loss_fn)(params)
                # accumulate the real grad norm so the backward pass
                # cannot be dead-code-eliminated
                gnorm = sum(
                    jnp.sum(jnp.square(g)) for g in jax.tree.leaves(grads)
                )
                return acc + loss + jnp.sqrt(gnorm) * 1e-6

            return jax.lax.fori_loop(0, n_iters, body, jnp.float32(0))

        dt = _time_chain(lambda: chain(params, wav), n_iters, rtt_ms=rtt)
        rows.append({"devices": n, "batch": B, "utt_per_s": B / dt,
                     "step_ms": dt * 1e3})
    base = rows[0]["utt_per_s"] / rows[0]["devices"]
    for r in rows:
        r["efficiency"] = round(
            (r["utt_per_s"] / r["devices"]) / base, 3
        )
    return rows
