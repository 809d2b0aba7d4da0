"""Benchmark suite (SURVEY.md §6: primary metric = audio-seconds/s per
chip for student IAF inference; secondary = teacher train utterances/s).

Measurement methodology, forced by the axon tunnel platform:

* `block_until_ready` does NOT synchronize on this platform (execution is
  deferred until a host transfer), so every timed region is forced by a
  scalar device->host transfer of a checksum that depends on the full
  computation;
* each sync costs a ~30 ms tunnel round-trip, so N iterations are CHAINED
  inside one jitted `fori_loop` (data-dependent through an accumulator)
  and a single transfer closes the chain;
* the fixed per-call overhead (tunnel RTT + dispatch) is removed by
  TWO-POINT DIFFERENCING, not subtraction of a separately measured RTT:
  each chain takes its iteration count as a DYNAMIC device scalar, the
  chain is timed at N and 2N iterations, and the per-iteration time is
  (t_2N - t_N) / N.  The overhead cancels exactly instead of relying on
  an RTT estimate that can drift between its measurement and the timed
  run — round 3's bench subtracted a stale RTT, clamped negative results
  to ~0 and published physically impossible numbers (48e9 utt/s,
  MFU 7.4e7; VERDICT r3 weak item 1).  This module now NEVER clamps: a
  measurement whose signal is not clearly above the tunnel noise is
  retried with a longer chain and, failing that, reported as an explicit
  `timing_error` with zeroed rates;
* every reported rate is bound-checked against the analytic FLOPs floor
  (`step_ms >= flops / datasheet_peak`) and the MFU ceiling (<= 1.0)
  before it is allowed into the bench output (`_plausibility_check`).
"""

from __future__ import annotations

import time
from typing import Any, Callable, Dict, Optional, Tuple

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


def measure_round_trip_ms(reps: int = 7) -> float:
    """Median device->host sync latency for a trivial computation."""
    x = jnp.ones((8, 8))
    f = jax.jit(lambda a: a.sum())
    _force(f(x))
    samples = []
    for _ in range(reps):
        t0 = time.perf_counter()
        _force(f(x))
        samples.append(time.perf_counter() - t0)
    return float(np.median(samples)) * 1e3


def _time_chain(
    chain_fn: Callable[[int], Any],
    n_iters: int,
    reps: int = 3,
    max_doublings: int = 3,
) -> Tuple[Optional[float], Dict[str, Any]]:
    """Best per-iteration seconds for a jitted chain with a DYNAMIC
    iteration count.

    `chain_fn(n)` must run n timed iterations inside one jit call (a
    `fori_loop` whose bound is a traced scalar, so n does not recompile)
    and return a device scalar depending on all of them.  The chain is
    timed at n and 2n; per-iteration time = (t_2n - t_n) / n, which
    cancels the fixed tunnel/dispatch overhead exactly.

    Validation (VERDICT r3 item 1): the differenced signal must exceed
    1.5x the adjacent-measured RTT, else the chain is re-timed with a
    doubled n (up to `max_doublings`), and a still-unresolvable
    measurement returns (None, meta-with-error) — never a clamped or
    negative number.
    """
    _force(chain_fn(1))  # compile + warmup (n is dynamic: no recompile)
    meta: Dict[str, Any] = {}
    for attempt in range(max_doublings + 1):
        rtt_ms = measure_round_trip_ms()
        # alternate the two chain lengths so slow drift in tunnel
        # latency hits both estimates equally
        t1 = t2 = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            _force(chain_fn(n_iters))
            t1 = min(t1, time.perf_counter() - t0)
            t0 = time.perf_counter()
            _force(chain_fn(2 * n_iters))
            t2 = min(t2, time.perf_counter() - t0)
        diff = t2 - t1
        meta = {
            "n_iters": n_iters,
            "rtt_ms": round(rtt_ms, 3),
            "chain_1x_ms": round(t1 * 1e3, 3),
            "chain_2x_ms": round(t2 * 1e3, 3),
            "method": "two-point differencing (overhead cancels)",
        }
        if diff > 1.5 * rtt_ms / 1e3:
            return diff / n_iters, meta
        n_iters *= 2
    meta["timing_error"] = (
        "chain timing not separable from tunnel noise: "
        f"t(2n)-t(n) = {diff * 1e3:.3f} ms <= 1.5x RTT "
        f"({rtt_ms:.1f} ms) after {max_doublings} doublings "
        f"(largest chain timed: n={n_iters // 2}, 2n={n_iters}); "
        "refusing to report a rate"
    )
    return None, meta


def _rate_result(dt: Optional[float], meta: Dict[str, Any],
                 fields: Dict[str, Callable[[float], float]],
                 extra: Dict[str, Any]) -> Dict[str, Any]:
    """Assemble a measurement dict; zero the rates on timing failure."""
    out: Dict[str, Any] = dict(extra)
    if dt is None:
        for k in fields:
            out[k] = 0.0
        out["step_ms"] = 0.0
        out["error"] = meta.get("timing_error", "timing failed")
    else:
        for k, fn in fields.items():
            out[k] = fn(dt)
        out["step_ms"] = dt * 1e3
    out["timing"] = meta
    return out


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

    @jax.jit
    def chain(v, key, mel, n):
        def body(i, acc):
            w = model.apply(v, jax.random.fold_in(key, i), mel,
                            method="generate")
            return acc + w.sum()

        return jax.lax.fori_loop(0, n, body, jnp.float32(0))

    key = jax.random.PRNGKey(1)
    dt, meta = _time_chain(
        lambda n: chain(variables, key, mel, jnp.int32(n)), n_iters
    )
    audio_sec = batch * T / sr
    n_dev = jax.local_device_count()
    return _rate_result(
        dt, meta,
        {
            "audio_sec_per_s_per_chip": lambda s: audio_sec / s / n_dev,
            "samples_per_s": lambda s: batch * T / s,
        },
        {"batch": batch, "samples": T},
    )


def measure_teacher_train(cfg: Config, n_iters: int = 6) -> Dict[str, Any]:
    """Teacher teacher-forcing training throughput: utterances/s."""
    from pwn_tpu.config import override

    # same model mode as the real training loop: "auto" -> the fused-
    # backward train megakernel on TPU (18.2 vs 42.6 ms/step on v5e, r2
    # session 1), unrolled XLA on CPU (resolve_stack_mode maps
    # mega_train->xla there); explicit flags pass through for A/B tools
    if cfg.teacher.fused_layers == "auto":
        cfg = override(cfg, "teacher.fused_layers", "mega_train")
    model, variables = init_teacher(cfg, jax.random.PRNGKey(0),
                                    use_scan=False)
    tx = make_optimizer(cfg.train)
    params = variables["params"]
    opt_state = tx.init(params)
    B = cfg.train.global_batch_size
    ds = SyntheticTones(8, cfg.train.crop_samples, cfg.dsp.sample_rate)
    wav = jnp.asarray(next(make_train_iterator(ds, cfg, B, seed=0)))

    @jax.jit
    def chain(params, opt_state, wav, n):
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
            0, n, body, (params, opt_state, jnp.float32(0))
        )
        return acc

    dt, meta = _time_chain(
        lambda n: chain(params, opt_state, wav, jnp.int32(n)), n_iters
    )
    return _rate_result(
        dt, meta,
        {
            "teacher_utt_per_s": lambda s: B / s,
            "samples_per_s": lambda s: B * cfg.train.crop_samples / s,
        },
        {"batch": B, "crop_samples": cfg.train.crop_samples},
    )


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

    @jax.jit
    def chain(params, opt_state, t_params, wav, key, n):
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
            0, n, body, (params, opt_state, jnp.float32(0))
        )
        return acc

    dt, meta = _time_chain(
        lambda n: chain(params, opt_state, t_vars["params"], wav,
                        jax.random.PRNGKey(2), jnp.int32(n)),
        n_iters,
    )
    return _rate_result(
        dt, meta,
        {"distill_utt_per_s": lambda s: B / s},
        {"batch": B, "crop_samples": cfg.train.crop_samples},
    )


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

    @jax.jit
    def chain(params, opt_state, wav, key, n):
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
            0, n, body, (params, opt_state, jnp.float32(0))
        )
        return acc

    dt, meta = _time_chain(
        lambda n: chain(params, opt_state, wav, jax.random.PRNGKey(2),
                        jnp.int32(n)),
        n_iters,
    )
    return _rate_result(
        dt, meta,
        {"student_direct_utt_per_s": lambda s: B / s},
        {"batch": B, "crop_samples": cfg.train.crop_samples},
    )


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

    fn = (
        sampling.fast_sample
        if jax.default_backend() == "cpu"
        else sampling.fast_sample_pallas
    )

    @jax.jit
    def chain(v, key, mel, n):
        def body(i, acc):
            wav = fn(model, v, jax.random.fold_in(key, i), mel)
            return acc + wav.sum()

        return jax.lax.fori_loop(0, n, body, jnp.float32(0))

    key = jax.random.PRNGKey(1)
    # start at 4 chained waveforms (~120 ms of AR signal at the measured
    # 5.5 us/step): BENCH_r04's row rested on an n_iters=2 chain, the
    # thinnest sample in the suite (VERDICT r4 item 8) — 4/8 matches the
    # other sections' sample depth and still auto-doubles if noisy
    dt, meta = _time_chain(
        lambda n: chain(variables, key, mel, jnp.int32(n)), 4
    )
    return _rate_result(
        dt, meta,
        {
            "ar_samples_per_s": lambda s: batch * T / s,
            "ar_steps_per_s": lambda s: T / s,
            "ar_audio_sec_per_s": lambda s: batch * T / sr / s,
            "ar_us_per_step": lambda s: s / T * 1e6,
        },
        {"batch": batch, "samples": T},
    )


# ---------------------------------------------------------------------------
# On-TPU kernel-correctness canary (VERDICT r3 item 3)
# ---------------------------------------------------------------------------


def kernel_canary(cfg: Config, batch: int = 8,
                  T: int = 2048) -> Dict[str, Any]:
    """~1 s per-batch-row correctness check of every shipped Pallas
    kernel family, run on the REAL device inside each bench.

    Guards the bb=8-class Mosaic miscompile (BASELINE.md round 3): a
    miscompile corrupted SPECIFIC batch rows by O(1) while interpret
    mode stayed bit-exact, so interpret-mode CI provably cannot catch
    it.  Checks, at the preset's resolved kernel layout:

    * generation megakernel skip-sum vs the fp32 XLA reference, per row;
    * mega_train forward + fused Pallas backward dx (a per-row quantity,
      unlike weight grads) vs fp32 XLA `jax.grad`, per row;
    * AR sampler cross-row uniformity: Pallas vs conv-queue scan on a
      shared noise stream — compounding MXU drift hits all rows alike
      (~0.02 @ 512 steps), a miscompile blows up SPECIFIC rows
      (tools/r3s3_ar_precision.py calibration).
    """
    if jax.default_backend() == "cpu":
        return {"skipped": "cpu backend (kernels run in interpret mode; "
                           "the miscompile class is TPU-only)"}
    from pwn_tpu.ops.pallas import flow_stack as fs

    sc = cfg.student
    L, C, G, S = (sc.layers_per_flow, sc.residual_channels,
                  sc.gate_channels, sc.skip_channels)
    M = cfg.dsp.n_mels
    dil = sc.flow_dilations
    dt = jnp.bfloat16 if sc.compute_dtype == "bfloat16" else jnp.float32
    rng = np.random.default_rng(42)

    def arr(shape, scale):
        return jnp.asarray(rng.normal(0, scale, shape).astype(np.float32))

    x0 = arr((batch, T, C), 0.5).astype(dt)
    cond = arr((batch, T, M), 0.5).astype(dt)
    w_in = arr((L, 2 * C + M, G), (2 * C + M) ** -0.5).astype(dt)
    b_g = arr((L, G), 0.1).astype(dt)
    w_out = arr((L, G // 2, C + S), (G // 2) ** -0.5).astype(dt)
    b_rs = arr((L, C + S), 0.1).astype(dt)
    f32 = [a.astype(jnp.float32)
           for a in (x0, cond, w_in, b_g, w_out, b_rs)]

    @jax.jit
    def ref_fwd_dx(x0f, condf, w_inf, b_gf, w_outf, b_rsf):
        def f(x):
            return fs._reference_xla_unrolled(
                x, condf, w_inf, b_gf, w_outf, b_rsf, dilations=dil
            ).astype(jnp.float32).sum()

        skip = fs._reference_xla_unrolled(
            x0f, condf, w_inf, b_gf, w_outf, b_rsf, dilations=dil
        )
        return skip.astype(jnp.float32), jax.grad(f)(x0f)

    ref_skip, ref_dx = ref_fwd_dx(*f32)
    ref_skip = np.asarray(ref_skip)
    ref_dx = np.asarray(ref_dx)

    @jax.jit
    def mega(x0, cond, w_in, b_g, w_out, b_rs):
        skip = fs.fused_flow_stack(
            x0, cond, w_in, b_g, w_out, b_rs, dilations=dil,
            interpret=False,
        )
        dx = jax.grad(
            lambda x: fs.fused_flow_stack_train(
                x, cond, w_in, b_g, w_out, b_rs, dilations=dil,
                interpret=False,
            ).astype(jnp.float32).sum()
        )(x0)
        return skip.astype(jnp.float32), dx.astype(jnp.float32)

    gen_skip, train_dx = mega(x0, cond, w_in, b_g, w_out, b_rs)
    gen_skip = np.asarray(gen_skip)
    train_dx = np.asarray(train_dx)

    def row_rel(out, ref):
        err = np.abs(out - ref).reshape(batch, -1).max(axis=1)
        scale = np.abs(ref).reshape(batch, -1).max(axis=1) + 1e-6
        return err / scale

    gen_rows = row_rel(gen_skip, ref_skip)
    dx_rows = row_rel(train_dx, ref_dx)

    # AR backend agreement on the r3-CALIBRATED configuration: the tiny
    # fp32 teacher, where tools/r3s3_ar_precision.py measured ~0.02 abs
    # drift between the Pallas kernel and the conv-queue scan over 512
    # feedback steps.  At bf16 preset sizes the two backends' different
    # inner precisions (kernel: fp32 over bf16 weights; scan: bf16)
    # amplify chaotically through the feedback loop to O(1) on EVERY
    # row — no miscompile signal survives there, so the preset-layout
    # coverage comes from the flow-stack checks above and the AR check
    # pins the calibrated layout (same compiled kernel code path).
    from pwn_tpu.config import override as _ov

    cfg_ar = get_config("tiny_teacher")
    if cfg.teacher.output != cfg_ar.teacher.output:
        cfg_ar = _ov(cfg_ar, "teacher.output", cfg.teacher.output)
    hop = cfg_ar.dsp.hop_length
    frames = max(512 // hop, 2)
    Tar = frames * hop
    model, variables = init_teacher(cfg_ar, jax.random.PRNGKey(0))
    if cfg_ar.teacher.output == "mol":
        # pin the Gumbel-argmax mixture choice to component 0: on a
        # random-init model the logits are near-uniform, so ANY numeric
        # drift flips selections and the trajectories diverge to O(1)
        # on every row (the known MoL value-comparison trap, BASELINE.md
        # round 3) — with a +25 logit bias the comparison stays
        # continuous and the ~0.02 @ 512-step drift bound applies
        b = variables["params"]["stack"]["head2"]["bias"]
        variables = {
            **variables,
            "params": {
                **variables["params"],
                "stack": {
                    **variables["params"]["stack"],
                    "head2": {
                        **variables["params"]["stack"]["head2"],
                        "bias": b.at[0].add(25.0),
                    },
                },
            },
        }
    mel = jnp.asarray(
        np.random.default_rng(0)
        .uniform(0, 1, (batch, frames, cfg_ar.dsp.n_mels))
        .astype(np.float32)
    )
    # shared stream: fast_sample consumes the pre-drawn noise that
    # fast_sample_pallas derives internally from the same key
    key = jax.random.PRNGKey(7)
    noise = sampling.draw_noise(cfg_ar, key, Tar, batch)
    scan = np.asarray(jax.jit(
        lambda v, m, u: sampling.fast_sample(model, v, key, m, uniforms=u)
    )(variables, mel, noise))
    pall = np.asarray(jax.jit(
        lambda v, m: sampling.fast_sample_pallas(model, v, key, m)
    )(variables, mel))
    ar_rows = np.abs(pall - scan).max(axis=1)

    # thresholds calibrated on r3 data: healthy rows sit at the bf16
    # accumulation level (~0.005 rel for the stacks, ~0.02-0.03 abs for
    # 512 AR feedback steps); the observed miscompile was ~0.3 rel /
    # O(1) abs on specific rows
    GEN_THRESH, DX_THRESH, AR_THRESH = 0.08, 0.12, 0.15
    ok = bool(
        gen_rows.max() < GEN_THRESH
        and dx_rows.max() < DX_THRESH
        and ar_rows.max() < AR_THRESH
    )
    return {
        "pass": ok,
        "gen_row_rel_err": [round(float(v), 5) for v in gen_rows],
        "train_dx_row_rel_err": [round(float(v), 5) for v in dx_rows],
        "ar_row_abs_diff": [round(float(v), 5) for v in ar_rows],
        "thresholds": {"gen_rel": GEN_THRESH, "dx_rel": DX_THRESH,
                       "ar_abs": AR_THRESH},
        "layout": {"L": L, "C": C, "G": G, "S": S, "B": batch, "T": T,
                   "ar_steps": Tar},
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


def _plausibility_check(step_ms: float, flops_per_step: float,
                        peak_tflops: float | None) -> Optional[str]:
    """Physical-bounds gate: a step cannot beat the datasheet peak.

    Returns an error string for impossible numbers (VERDICT r3: the
    bench must refuse to print 48e9 utt/s / MFU 7.4e7 as data)."""
    if step_ms <= 0.0:
        return f"non-positive step time ({step_ms} ms)"
    if peak_tflops is None:
        return None
    floor_ms = flops_per_step / (peak_tflops * 1e12) * 1e3
    if step_ms < floor_ms:
        return (f"step_ms {step_ms:.4f} below analytic FLOPs floor "
                f"{floor_ms:.4f} ms (would exceed {peak_tflops} TFLOP/s "
                "datasheet peak) — measurement invalid")
    return None


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

    if step_ms is None or step_ms <= 0.0:
        return {"error": "no valid step_ms to extrapolate from "
                         "(upstream timing failed)"}
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


def analytic_tp_efficiency(cfg: Config, n_model: int = 2,
                           per_chip_batch: int = 8) -> Dict[str, Any]:
    """Roofline for Megatron gate-channel TP TRAINING of this model
    family (VERDICT r3 item 4): per gated layer, the row-parallel
    z @ [w_res|w_skip] output needs one psum of the (B, T, C+S)
    activation — compare that traffic against the layer's compute.

    The result is structural, not marginal: the model is ACTIVATION-
    dominated (total params ~13-50 MB vs ~100 MB of psum payload per
    layer per batch-8 step), so sharding parameters buys nothing while
    every layer pays an all-reduce bigger than the whole gradient
    all-reduce of DP.  This is why `large_student_sharded` trains DP
    (config.py) — the numbers below go to BASELINE.md.
    """
    ICI_BW = 9.0e10  # bytes/s per chip, v5e one torus axis
    T = cfg.train.crop_samples
    b = per_chip_batch
    peak = peak_bf16_tflops() or 197.0

    def layer_row(C, G, S, M, n_layers, tag):
        # one layer: gate GEMM (2C+M)xG + out GEMM (G/2)x(C+S), fwd;
        # training ~3x fwd FLOPs.  TP splits compute n_model ways.
        flops = 2.0 * b * T * ((2 * C + M) * G + (G // 2) * (C + S))
        compute_ms = 3.0 * flops / n_model / (peak * 1e12) * 1e3
        # psum payload: (b, T, C+S) bf16, fwd + the mirrored bwd
        # all-reduce of dz; ring cost 2*(n-1)/n per chip
        payload = b * T * (C + S) * 2
        comm_ms = (2.0 * payload * 2.0 * (n_model - 1) / n_model
                   / ICI_BW * 1e3)
        return {
            "stack": tag, "layers": n_layers,
            "per_layer_compute_ms": round(compute_ms, 4),
            "per_layer_psum_ms": round(comm_ms, 4),
            "comm_over_compute": round(comm_ms / compute_ms, 2),
            "step_comm_ms": round(comm_ms * n_layers, 2),
        }

    sc, tc, M = cfg.student, cfg.teacher, cfg.dsp.n_mels
    rows = [
        layer_row(sc.residual_channels, sc.gate_channels,
                  sc.skip_channels, M,
                  sc.n_flows * sc.layers_per_flow, "student"),
        layer_row(tc.residual_channels, tc.gate_channels,
                  tc.skip_channels, M, tc.n_layers, "teacher(score)"),
    ]
    total_comm = sum(r["step_comm_ms"] for r in rows)
    total_compute = sum(
        r["per_layer_compute_ms"] * r["layers"] for r in rows
    )
    return {
        "n_model": n_model, "per_chip_batch": b, "crop_samples": T,
        "rows": rows,
        "distill_step_comm_ms": round(total_comm, 1),
        "distill_step_compute_ms": round(total_compute, 1),
        "predicted_tp_efficiency": round(
            total_compute / (total_compute + total_comm), 3
        ),
        "note": "Megatron gate-sharded TP training roofline, zero "
                "overlap; compare DP's one 13-50 MB grad all-reduce "
                "per step (analytic_dp_efficiency)",
    }


def dp_equivalence_check(cfg: Config) -> Dict[str, Any]:
    """Pass/fail audit of the shard_map DP machinery: gradients from the
    per-device pmean path over ALL visible devices must equal the
    single-device gradients on the identical global batch.

    This replaces the former CPU-sim throughput table (VERDICT r3 weak
    item 2: 8 virtual devices on 4 oversubscribed host cores produced
    "efficiency" numbers from scheduler jitter — super-linear 1.249 at 2
    devices one round, 0.594 the next).  A correctness audit is what the
    sim can actually deliver; `analytic_dp_efficiency` carries the
    hardware efficiency claim.
    """
    from jax.sharding import Mesh, PartitionSpec as P

    from pwn_tpu.config import override

    cfg = override(cfg, "teacher.fused_layers", "off")
    devices = jax.devices()
    n = len(devices)
    model, variables = init_teacher(cfg, jax.random.PRNGKey(0),
                                    use_scan=False)
    params = variables["params"]
    B = max(cfg.train.global_batch_size, n)
    B -= B % n
    ds = SyntheticTones(8, cfg.train.crop_samples, cfg.dsp.sample_rate)
    wav = jnp.asarray(next(make_train_iterator(ds, cfg, B, seed=0)))

    def loss_grads(p, wav):
        x, mel = prepare_batch(wav, cfg)
        return jax.value_and_grad(
            lambda q: model.apply({"params": q}, x, mel, method="loss")
        )(p)

    ref_loss, ref_grads = jax.jit(loss_grads)(params, wav)

    mesh = Mesh(np.asarray(devices).reshape(n, 1), ("data", "model"))

    def dp(p, wav):
        loss, grads = loss_grads(p, wav)
        return jax.lax.pmean((loss, grads), "data")

    dp_loss, dp_grads = jax.jit(jax.shard_map(
        dp, mesh=mesh, in_specs=(P(), P("data")), out_specs=P(),
        check_vma=False,
    ))(params, wav)

    rel_errs = jax.tree.map(
        lambda a, b: float(
            jnp.max(jnp.abs(a - b)) / (jnp.max(jnp.abs(b)) + 1e-12)
        ),
        dp_grads, ref_grads,
    )
    max_rel = max(jax.tree.leaves(rel_errs))
    loss_rel = abs(float(dp_loss) - float(ref_loss)) / (
        abs(float(ref_loss)) + 1e-12
    )
    # tolerance matches tests/test_distributed.py: the per-shard pmean
    # changes fp32 reduction order, giving ~1e-4..1e-3 rel on grads
    ok = max_rel < 2e-3 and loss_rel < 1e-5
    return {"devices": n, "batch": B, "pass": bool(ok),
            "max_grad_rel_err": max_rel, "loss_rel_err": loss_rel,
            "note": "shard_map pmean grads vs single-device grads on the "
                    "identical global batch"}


def _dp_equivalence_cpu_sim() -> Any:
    """Run `dp_equivalence_check` in a subprocess with 8 virtual CPU
    devices (the single-chip axon environment cannot grow real devices)."""
    import json
    import os
    import subprocess
    import sys

    code = (
        "import json, os\n"
        "os.environ['JAX_PLATFORMS'] = 'cpu'\n"
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "from pwn_tpu.benchmarks import dp_equivalence_check\n"
        "from pwn_tpu.config import get_config, override\n"
        "cfg = override(get_config('tiny_teacher'),"
        " 'train.crop_samples', 1024)\n"
        "cfg = override(cfg, 'train.global_batch_size', 8)\n"
        "print('DPEQ ' + json.dumps(dp_equivalence_check(cfg)))\n"
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
            if line.startswith("DPEQ "):
                out = json.loads(line[len("DPEQ "):])
                out["sim"] = "cpu-8dev-tiny"
                return out
        return {"error": (r.stderr or r.stdout)[-500:]}
    except Exception as e:  # never fail the bench over the sim audit
        return {"error": repr(e)}


def run_bench(case: str = "student_iaf", overrides=None,
              full: bool = True) -> Dict[str, Any]:
    cfg = get_config(case, **(overrides or {}))
    student = measure_student_inference(cfg)
    detail: Dict[str, Any] = {"student": student,
                              "device": str(jax.devices()[0])}
    errors = []
    peak = peak_bf16_tflops()
    mfu: Dict[str, Any] = {
        "peak_bf16_tflops": peak,
        "note": "analytic GEMM/conv FLOPs vs datasheet bf16 peak",
    }
    def check_student(tag: str, s_cfg: Config, res: Dict[str, Any]):
        """Plausibility-gate a student-inference result + record MFU."""
        if "error" in res:
            errors.append(f"{tag}: " + res["error"])
            return
        flops_step = (student_gen_flops_per_sample(s_cfg)
                      * res["batch"] * res["samples"])
        bad = _plausibility_check(res["step_ms"], flops_step, peak)
        if bad:
            res["error"] = bad
            errors.append(f"{tag}: " + bad)
            return
        rate = flops_step / (res["step_ms"] / 1e3)
        mfu[f"{tag}_tflops"] = round(rate / 1e12, 3)
        mfu[tag] = (round(rate / (peak * 1e12), 4) if peak else None)

    check_student("student_infer", cfg, student)
    # the on-device kernel canary runs even when timing fails — its
    # whole purpose is to catch silent corruption independently
    detail["kernel_check"] = kernel_canary(cfg)
    if detail["kernel_check"].get("pass") is False:
        errors.append("kernel_check: per-row kernel validation FAILED "
                      "(possible Mosaic miscompile — see detail)")
    if full:
        t_cfg = get_config("teacher_lj")
        detail["teacher_train"] = measure_teacher_train(t_cfg)
        detail["distill_train"] = measure_distill_train(
            get_config("student_iaf")
        )
        detail["student_direct_train"] = measure_student_direct_train(
            get_config("student_iaf")
        )
        detail["teacher_ar"] = measure_teacher_ar_sampling(
            get_config("teacher_lj")
        )
        # config[4] generation (the other shipped generation preset;
        # VERDICT r4 item 8) — its C=128 flows also give the MFU-by-
        # channel-width comparison against student_iaf's C=64 row
        # (VERDICT r4 weak item 3: the K-padding hypothesis predicts
        # higher MFU here)
        if case != "large_student_sharded":
            c4 = get_config("large_student_sharded")
            detail["student_config4"] = measure_student_inference(c4)
            check_student("student_infer_config4", c4,
                          detail["student_config4"])
        tt = detail["teacher_train"]
        if "error" not in tt:
            # train fwd+bwd ~= 3x forward FLOPs
            t_flops_step = (3.0 * teacher_fwd_flops_per_sample(t_cfg)
                            * tt["batch"] * tt["crop_samples"])
            bad = _plausibility_check(tt["step_ms"], t_flops_step, peak)
            if bad:
                tt["error"] = bad
                errors.append("teacher_train: " + bad)
            else:
                rate = t_flops_step / (tt["step_ms"] / 1e3)
                mfu["teacher_train_tflops"] = round(rate / 1e12, 3)
                mfu["teacher_train"] = (round(rate / (peak * 1e12), 4)
                                        if peak else None)
        if jax.local_device_count() > 1:
            detail["dp_equivalence"] = dp_equivalence_check(
                get_config("teacher_lj")
            )
            detail["dp_scaling"] = measure_scaling(get_config("teacher_lj"))
        else:
            detail["dp_equivalence"] = _dp_equivalence_cpu_sim()
        if detail["dp_equivalence"].get("pass") is False:
            errors.append("dp_equivalence: sharded grads != single-device")
        detail["dp_analytic"] = analytic_dp_efficiency(
            t_cfg, detail["teacher_train"]["step_ms"]
        )
    for k, v in list(mfu.items()):
        if isinstance(v, float) \
                and k.endswith(("_infer", "_train", "_config4")) \
                and v > 1.0:
            errors.append(f"mfu.{k} = {v} > 1.0 — physically impossible")
            mfu[k] = None
    detail["mfu"] = mfu
    value = student["audio_sec_per_s_per_chip"] \
        if "error" not in student else 0.0
    out = {
        # ONE-LINE driver contract (repo-root bench.py prints this):
        "metric": "student_audio_sec_per_s_per_chip",
        "value": round(value, 2),
        "unit": "audio-sec/s/chip (= x realtime)",
        # north-star target is >100x realtime per chip (BASELINE.json)
        "vs_baseline": round(value / 100.0, 3),
        "detail": detail,
    }
    if errors:
        out["error"] = "; ".join(errors)
    return out


def measure_scaling(cfg: Config, n_iters: int = 4):
    """DP scaling table over the locally visible devices (SURVEY.md §6
    "measurement points: 1 chip, 1 host, N hosts").

    Only meaningful on REAL multi-device hardware (a pod slice); the
    single-chip axon environment reports the 1-chip row only, and the
    CPU sim path now runs `dp_equivalence_check` instead (VERDICT r3
    weak item 2: virtual devices on oversubscribed host cores measure
    scheduler jitter, not scaling).
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

        @jax.jit
        def chain(params, wav, k):
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

            return jax.lax.fori_loop(0, k, body, jnp.float32(0))

        dt, meta = _time_chain(
            lambda k: chain(params, wav, jnp.int32(k)), n_iters
        )
        if dt is None:
            rows.append({"devices": n, "batch": B,
                         "error": meta.get("timing_error"),
                         "timing": meta})
            continue
        rows.append({"devices": n, "batch": B, "utt_per_s": B / dt,
                     "step_ms": dt * 1e3, "timing": meta})
    valid = [r for r in rows if "utt_per_s" in r]
    # efficiency is only meaningful relative to the 1-device row: if
    # that row's timing failed, normalizing to the smallest surviving
    # row would silently overstate every efficiency (its own row reads
    # 1.0) — mark the column invalid instead
    base_rows = [r for r in valid if r["devices"] == 1]
    if base_rows:
        base = base_rows[0]["utt_per_s"]
        for r in valid:
            r["efficiency"] = round(
                (r["utt_per_s"] / r["devices"]) / base, 3
            )
    elif valid:
        for r in valid:
            r["efficiency"] = "invalid (1-device baseline failed)"
    return rows
