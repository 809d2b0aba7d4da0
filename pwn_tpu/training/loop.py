"""Training orchestration: the rebuilt `train.py` entry logic
(reference: SURVEY.md §3.1 call stack — hparams -> DataFlow -> trainer
with ModelSaver callbacks [R]).

One code path serves: teacher training, student distillation, single-chip
and multi-host data-parallel runs, with async orbax checkpointing and
exact data-stream resume.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Any, Optional

import jax

from pwn_tpu.config import Config
from pwn_tpu.data import (
    SyntheticTones,
    WavCropDataset,
    make_train_iterator,
    prefetch,
)
from pwn_tpu.data.pipeline import local_batch_size
from pwn_tpu.models.student import init_student
from pwn_tpu.models.teacher import init_teacher, make_teacher
from pwn_tpu.parallel import make_mesh, shard_batch
from pwn_tpu.training.common import (
    create_train_state,
    serving_params as _serving,
)
from pwn_tpu.training.distill import make_distill_train_step
from pwn_tpu.training.teacher import make_teacher_train_step
from pwn_tpu.utils.checkpoint import CheckpointManager
from pwn_tpu.utils.metrics import MetricsLogger
from pwn_tpu.utils.profiling import StepProfiler, apply_debug_flags


@dataclass
class RunResult:
    state: Any
    final_metrics: dict
    steps_run: int


def _train_stack_flag(flag: str, mesh) -> str:
    """Resolve a config `fused_layers` flag for a TRAIN step.

    "auto" -> "mega_train": megakernel forward saving per-layer inputs +
    fused Pallas backward — measured teacher 18.2 vs 42.6, student direct
    19.6 vs 70.4, distill 53.4 vs 83.1 ms/step on v5e (r2 sessions 1/9).
    resolve_stack_mode further drops mega_train -> XLA on CPU, where the
    Pallas interpreter would crawl.  Explicit flags pass through so "off"
    still forces pure XLA.  TP (model>1) shards params through GSPMD
    propagation, which cannot partition pallas_call — keep pure XLA there.
    """
    if flag != "auto":
        return flag
    return "off" if mesh.shape.get("model", 1) > 1 else "mega_train"


def build_dataset(cfg: Config, data_dir: Optional[str], split: str = "train"):
    """Wav-dir corpus if given, else the synthetic corpus (zero-egress env).

    split="train": per-host partitioned training files.
    split="val":   the held-out slice (corpus_split), REPLICATED across
    processes so every host evaluates the identical batch (the reference
    had no held-out eval at all [R]; SURVEY.md §5 metrics row).
    """
    from pwn_tpu.data.pipeline import corpus_split

    if data_dir:
        train_files, val_files = corpus_split(data_dir)
        if split == "val":
            return WavCropDataset(None, cfg.dsp.sample_rate,
                                  files=val_files)
        return WavCropDataset(
            None,
            cfg.dsp.sample_rate,
            process_index=jax.process_index(),
            process_count=jax.process_count(),
            files=train_files,
        )
    from pwn_tpu.data import SyntheticSpeech

    corpus_cls = (SyntheticSpeech
                  if cfg.train.synthetic_corpus == "speech"
                  else SyntheticTones)
    if split == "val":
        return corpus_cls(
            n_clips=8,
            n_samples=max(cfg.train.crop_samples, cfg.dsp.sample_rate),
            sample_rate=cfg.dsp.sample_rate,
            seed=7919,  # disjoint from every per-host train seed
        )
    return corpus_cls(
        n_clips=64,
        n_samples=max(cfg.train.crop_samples, cfg.dsp.sample_rate),
        sample_rate=cfg.dsp.sample_rate,
        seed=jax.process_index(),
    )


def make_val_batch(cfg: Config, data_dir: Optional[str], batch_size: int):
    """One fixed, deterministic held-out batch (identical on every host)."""
    ds = build_dataset(cfg, data_dir, split="val")
    it = make_train_iterator(ds, cfg, batch_size, seed=104729, start_step=0)
    return next(it)


def _student_sample_fn(cfg: Config, data_dir: Optional[str]):
    """Per-checkpoint student audio dump (the reference's TensorBoard
    audio-summary equivalent [R]), shared by the distillation and
    direct-training loops.  Conditions on a HELD-OUT corpus clip like
    the teacher loop's dump — real mel conditioning; a synthetic tone
    would hide speech-specific regressions when training on a corpus."""
    val_ds = build_dataset(cfg, data_dir, split="val")

    def sample_fn(state, step, samples_dir):
        from pwn_tpu.generate import generate_student, mel_from_wav
        from pwn_tpu.utils.audio_io import write_wav

        sr = cfg.dsp.sample_rate
        n = max(cfg.dsp.hop_length * 4,
                int(cfg.train.eval_sample_seconds * sr))
        clip = val_ds[0][:n]
        mel = mel_from_wav(cfg, clip.astype("float32"))
        wav = generate_student(
            cfg, jax.device_get(_serving(state)), mel,
            jax.random.PRNGKey(step),
        )
        write_wav(
            os.path.join(samples_dir, f"step_{step:08d}.wav"), wav, sr
        )
        return wav

    return sample_fn


def _run(
    cfg: Config,
    state,
    step_fn,
    step_args_fn,
    workdir: Optional[str],
    num_steps: Optional[int],
    data_dir: Optional[str],
    tag: str,
    sample_fn=None,
    eval_fn=None,
) -> RunResult:
    mesh = make_mesh(cfg.mesh)
    dataset = build_dataset(cfg, data_dir)
    num_steps = num_steps if num_steps is not None else cfg.train.total_steps

    ckpt = logger = None
    start_step = 0
    if workdir:
        ckpt = CheckpointManager(
            os.path.join(os.path.abspath(workdir), f"ckpt_{tag}"),
            max_to_keep=cfg.train.keep_checkpoints,
        )
        if ckpt.latest_step() is not None:
            state, start_step = ckpt.restore(state)
            print(f"[{tag}] resumed from step {start_step}")
        logger = MetricsLogger(
            os.path.join(workdir, f"metrics_{tag}.jsonl"),
            # native TB event files (utils/tensorboard.py, the
            # reference's TensorBoard scalars [R]); process 0 only
            tb_dir=(
                os.path.join(workdir, f"tb_{tag}")
                if cfg.train.tensorboard and jax.process_index() == 0
                else None
            ),
        )

    if mesh.shape.get("model", 1) > 1:
        # tensor-parallel configs (BASELINE config[4]): place the state
        # per the Megatron sharding rules; the step functions leave
        # placement to the caller in TP mode (see training/teacher.py)
        from pwn_tpu.parallel.tp import shard_state, validate_tp

        validate_tp(cfg.teacher.gate_channels, mesh)
        validate_tp(cfg.student.gate_channels, mesh)
        state = shard_state(state, mesh)

    lbs = local_batch_size(cfg.train.global_batch_size)
    it = None
    engine = cfg.train.data_engine
    want_native = engine == "native" or (
        engine == "auto" and data_dir and cfg.train.native_loader
    )
    if engine == "native" and not data_dir:
        raise RuntimeError(
            "data_engine=native requires a --data-dir (the C++ loader "
            "reads wav files); refusing to silently fall back to the "
            "synthetic Python pipeline"
        )
    if want_native and data_dir:
        from pwn_tpu.data.native_loader import (
            NativeWavCropLoader,
            native_available,
        )

        if native_available():
            from pwn_tpu.data.pipeline import corpus_split

            train_files, _ = corpus_split(data_dir)
            it = NativeWavCropLoader(
                None,
                cfg.train.crop_samples,
                lbs,
                seed=cfg.train.seed,
                start_step=start_step,
                process_index=jax.process_index(),
                process_count=jax.process_count(),
                files=train_files,
            )
        elif engine == "native":
            raise RuntimeError("data_engine=native but g++ unavailable")
    if it is None and engine == "grain":
        from pwn_tpu.data.grain_pipeline import make_grain_iterator

        it = make_grain_iterator(
            dataset, cfg, lbs, seed=cfg.train.seed, start_step=start_step
        )
    if it is None:
        it = make_train_iterator(
            dataset, cfg, lbs, seed=cfg.train.seed, start_step=start_step
        )
    device_it = prefetch(it, put=lambda b: shard_batch(mesh, b))

    apply_debug_flags()
    profiler = StepProfiler()
    metrics = {}
    step = start_step
    for step in range(start_step, num_steps):
        profiler.step(step)
        batch = next(device_it)
        state, metrics = step_fn(state, *step_args_fn(), batch)
        if logger and (
            step % cfg.train.log_every == 0 or step + 1 == num_steps
        ):
            logger.log(step, **{k: v for k, v in metrics.items()})
        at_ckpt = (step + 1) % cfg.train.checkpoint_every == 0 \
            or step + 1 == num_steps
        if eval_fn and at_ckpt:
            # held-out metrics at checkpoint cadence (SPMD: every process
            # runs the same replicated eval computation)
            val = {f"val_{k}": float(v) for k, v in eval_fn(state).items()}
            if logger:
                logger.log(step + 1, **val)
            metrics = {**metrics, **val}
        if ckpt and at_ckpt:
            ckpt.save(step + 1, jax.device_get(state))
            if sample_fn and workdir and jax.process_index() == 0:
                # audio progress artifact: wav dump + native TensorBoard
                # audio summary (the reference's TB audio mechanism [R],
                # SURVEY.md:300-304; VERDICT r4 item 7)
                wav = sample_fn(state, step + 1,
                                os.path.join(workdir, "samples"))
                if wav is not None and logger:
                    logger.add_audio(step + 1, "samples/audio", wav,
                                     cfg.dsp.sample_rate)
    profiler.close()
    if ckpt:
        ckpt.wait()
        ckpt.close()
    if logger:
        logger.close()
    return RunResult(
        state=state,
        final_metrics={k: float(v) for k, v in metrics.items()},
        steps_run=num_steps - start_step,
    )


def run_teacher_training(
    cfg: Config,
    workdir: Optional[str] = None,
    data_dir: Optional[str] = None,
    num_steps: Optional[int] = None,
) -> RunResult:
    mesh = make_mesh(cfg.mesh)
    # Stack mode for the TRAIN step: "auto" -> the fused-backward train
    # megakernel (18.2 vs 42.6 ms/step teacher_lj on v5e, r2 session 1;
    # resolves to unrolled XLA on CPU where Pallas would interpret).
    # Explicit flags pass through so "off" still forces pure XLA.
    from pwn_tpu.config import override as _ov

    train_cfg_model = _ov(
        cfg, "teacher.fused_layers",
        _train_stack_flag(cfg.teacher.fused_layers, mesh),
    )
    model, variables = init_teacher(
        train_cfg_model, jax.random.PRNGKey(cfg.train.seed),
        use_scan=False,
    )
    state = create_train_state(variables["params"], cfg.train)
    step_fn = make_teacher_train_step(model, cfg, mesh=mesh)

    # held-out observability (VERDICT r1 weak item 6): val NLL at
    # checkpoint cadence + AR sample dumps, parity with the distill loop
    from pwn_tpu.training.teacher import make_teacher_eval_step

    val_batch = make_val_batch(
        cfg, data_dir, local_batch_size(cfg.train.global_batch_size)
    )
    eval_step = make_teacher_eval_step(model, cfg, mesh=mesh)

    def eval_fn(state):
        return {"loss": eval_step(state.params, val_batch)}

    val_ds = build_dataset(cfg, data_dir, split="val")

    def sample_fn(state, step, samples_dir):
        from pwn_tpu.generate import generate_teacher, mel_from_wav
        from pwn_tpu.utils.audio_io import write_wav

        sr = cfg.dsp.sample_rate
        n = max(cfg.dsp.hop_length * 4,
                int(cfg.train.eval_sample_seconds * sr))
        clip = val_ds[0][:n]
        mel = mel_from_wav(cfg, clip.astype("float32"))
        wav = generate_teacher(
            cfg, jax.device_get(_serving(state)), mel,
            jax.random.PRNGKey(step), temperature=0.8,
        )
        write_wav(
            os.path.join(samples_dir, f"step_{step:08d}.wav"), wav, sr
        )
        return wav

    return _run(
        cfg, state, step_fn, tuple, workdir, num_steps, data_dir,
        "teacher", sample_fn=sample_fn, eval_fn=eval_fn,
    )


def run_distillation(
    cfg: Config,
    teacher_params: Any,
    workdir: Optional[str] = None,
    data_dir: Optional[str] = None,
    num_steps: Optional[int] = None,
) -> RunResult:
    mesh = make_mesh(cfg.mesh)
    # the frozen teacher is scored pathwise inside jax.grad: only its
    # INPUT gradient is needed, so "auto" -> mega_dx (train-forward +
    # dx/dcond-only fused Pallas backward; the XLA-recompute VJP was the
    # distill bottleneck: 53.9 -> 30.9 ms/step, r2 session 12); the
    # student trains with the full fused mega_train backward
    from pwn_tpu.config import override as _ov

    t_flag = cfg.teacher.fused_layers
    if t_flag == "auto" and mesh.shape.get("model", 1) == 1:
        t_flag = "mega_dx"
    # Commit the frozen teacher tree to the mesh ONCE (replicated).
    # It usually arrives as host numpy from the orbax restore
    # (StandardRestore into shape/dtype structs), and a host tree passed
    # as a per-step jit argument is re-uploaded EVERY step — measured
    # 395 ms/step wall vs the 31 ms device step through the axon tunnel
    # (~13 MB/step of teacher params), with host RSS growing ~2 GB/min
    # from the orphaned transfer buffers (r3 session 4).
    teacher_params = jax.device_put(
        teacher_params,
        jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec()),
    )
    # module object only — the frozen params come from the checkpoint,
    # so a real init_teacher here would pay the fused-kernel init
    # compile (~55 s over the tunnel) just to discard its variables
    teacher = make_teacher(
        _ov(cfg, "teacher.fused_layers", t_flag), use_scan=True,
    )
    student, s_vars = init_student(
        _ov(cfg, "student.fused_layers",
            _train_stack_flag(cfg.student.fused_layers, mesh)),
        jax.random.PRNGKey(cfg.train.seed + 1), use_scan=False,
    )
    state = create_train_state(
        s_vars["params"], cfg.train,
        rng=jax.random.PRNGKey(cfg.train.seed + 2),
    )
    step_fn = make_distill_train_step(student, teacher, cfg, mesh=mesh)

    sample_fn = _student_sample_fn(cfg, data_dir)

    from pwn_tpu.training.distill import make_distill_eval_step

    val_batch = make_val_batch(
        cfg, data_dir, local_batch_size(cfg.train.global_batch_size)
    )
    eval_step = make_distill_eval_step(student, teacher, cfg, mesh=mesh)

    def eval_fn(state):
        return eval_step(state.params, teacher_params, val_batch)

    return _run(
        cfg,
        state,
        step_fn,
        lambda: (teacher_params,),
        workdir,
        num_steps,
        data_dir,
        "student",
        sample_fn=sample_fn,
        eval_fn=eval_fn,
    )


def run_student_direct_training(
    cfg: Config,
    workdir: Optional[str] = None,
    data_dir: Optional[str] = None,
    num_steps: Optional[int] = None,
) -> RunResult:
    """Direct (teacher-free) student training: closed-form IAF likelihood +
    power loss (training/student_direct.py) — the reference's WIP mode
    (SURVEY.md §2a low-confidence flag; VERDICT r1 missing item 1).

    Writes the same `ckpt_student` layout as distillation, so `generate`
    and downstream tooling work unchanged."""
    from pwn_tpu.config import override as _ov
    from pwn_tpu.training.student_direct import (
        make_student_direct_eval_step,
        make_student_direct_train_step,
    )

    mesh = make_mesh(cfg.mesh)
    # "auto" -> fused mega_train backward (70.4 -> 19.6 ms/step direct
    # student training on v5e, r2 session 9)
    student, s_vars = init_student(
        _ov(cfg, "student.fused_layers",
            _train_stack_flag(cfg.student.fused_layers, mesh)),
        jax.random.PRNGKey(cfg.train.seed + 1), use_scan=False,
    )
    state = create_train_state(
        s_vars["params"], cfg.train,
        rng=jax.random.PRNGKey(cfg.train.seed + 2),
    )
    step_fn = make_student_direct_train_step(student, cfg, mesh=mesh)

    val_batch = make_val_batch(
        cfg, data_dir, local_batch_size(cfg.train.global_batch_size)
    )
    eval_step = make_student_direct_eval_step(student, cfg, mesh=mesh)

    def eval_fn(state):
        return eval_step(state.params, val_batch)

    sample_fn = _student_sample_fn(cfg, data_dir)

    return _run(
        cfg,
        state,
        step_fn,
        tuple,
        workdir,
        num_steps,
        data_dir,
        "student",
        sample_fn=sample_fn,
        eval_fn=eval_fn,
    )


def abstract_state_template(cfg: Config, kind: str):
    """Abstract (shape/dtype-only) TrainState for checkpoint restore.

    Real init traces AND compiles the model forward just to draw initial
    params that restore immediately overwrites — ~55 s on the axon TPU
    for student_iaf (the fused-kernel compile; r2 session 16).  Restore
    only needs tree structure + shapes, which `jax.eval_shape` builds
    with zero device compute (~2 s)."""
    init = init_teacher if kind == "teacher" else init_student

    def build(key):
        _, variables = init(cfg, key)
        return create_train_state(
            variables["params"], cfg.train, rng=jax.random.PRNGKey(0)
        )

    return jax.eval_shape(build, jax.random.PRNGKey(cfg.train.seed))


def load_teacher_params(cfg: Config, workdir: str,
                        step: Optional[int] = None,
                        prefer_ema: bool = True):
    """Restore teacher params from a training workdir (frozen distillation
    input artifact, BASELINE config[2]).  When the checkpoint carries EMA
    params (train.ema_decay > 0) and `prefer_ema`, those are returned —
    Parallel WaveNet distilled from the averaged teacher [PW];
    `prefer_ema=False` selects the live (non-averaged) params for A/Bs.
    `step` picks a specific retained checkpoint (default: latest)."""
    from pwn_tpu.models.teacher import make_teacher
    from pwn_tpu.training.common import serving_params

    model = make_teacher(cfg)
    state = abstract_state_template(cfg, "teacher")
    ckpt = CheckpointManager(
        os.path.join(os.path.abspath(workdir), "ckpt_teacher")
    )
    state, step = ckpt.restore(state, step=step)
    ckpt.close()
    params = serving_params(state) if prefer_ema else state.params
    return model, params, step


def teacher_checkpoint_steps(workdir: str):
    """Retained teacher checkpoint steps in a workdir, ascending."""
    ckpt = CheckpointManager(
        os.path.join(os.path.abspath(workdir), "ckpt_teacher")
    )
    steps = ckpt.all_steps()
    ckpt.close()
    return steps
