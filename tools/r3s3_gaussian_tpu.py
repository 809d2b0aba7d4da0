#!/usr/bin/env python
"""r3 session 3: Gaussian/ClariNet family on the real TPU, one process.

Back-to-back A/B (CLAUDE.md: chip-state noise across sessions is large;
compare alternatives IN ONE PROCESS):

1. Gaussian AR kernel TPU correctness — fast_sample_pallas vs the scan
   path on a SHARED pre-drawn normal stream, reported per batch row
   (the r3s2 bb=8 lesson: Mosaic miscompiles can corrupt specific rows
   while interpret mode stays bit-exact — always check rows on TPU).
2. Teacher AR sampling us/step: gaussian head vs MoL head (teacher_lj).
3. Teacher train step: gaussian vs MoL (mega_train both).
4. Distill step: clarinet_gaussian closed_form vs student_iaf sampled.
5. Student generate: gaussian base vs logistic base (regression watch).

Run: python tools/r3s3_gaussian_tpu.py   (no env overrides; axon TPU)
"""

import json
import sys

sys.path.insert(0, ".")

from bench import _tpu_tunnel_reachable  # noqa: E402

if not _tpu_tunnel_reachable():
    print("FATAL: axon tunnel unreachable; aborting before jax import")
    sys.exit(1)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from pwn_tpu.benchmarks import (  # noqa: E402
    measure_distill_train,
    measure_student_inference,
    measure_teacher_ar_sampling,
    measure_teacher_train,
)
from pwn_tpu.config import get_config, override  # noqa: E402
from pwn_tpu.models import sampling  # noqa: E402
from pwn_tpu.models.teacher import init_teacher  # noqa: E402
from pwn_tpu.utils.platform import (  # noqa: E402
    enable_persistent_compilation_cache,
)

enable_persistent_compilation_cache()
print("devices:", jax.devices(), flush=True)


def _gauss(cfg):
    cfg = override(cfg, "teacher.output", "gaussian")
    return override(cfg, "student.base", "gaussian")


# --- 1. gaussian AR kernel correctness on TPU (fp32 tiny config) -----------
cfg0 = _gauss(get_config("tiny_teacher"))
model, variables = init_teacher(cfg0, jax.random.PRNGKey(0))
B, F = 4, 4
mel = jnp.asarray(
    np.random.default_rng(0)
    .uniform(0, 1, (B, F, cfg0.dsp.n_mels))
    .astype(np.float32)
)
key = jax.random.PRNGKey(7)
T = F * cfg0.dsp.hop_length
noise = sampling.draw_noise(cfg0, key, T, B)
scan_wav = np.asarray(
    sampling.fast_sample(model, variables, key, mel, uniforms=noise)
)
pallas_wav = np.asarray(
    sampling.fast_sample_pallas(model, variables, key, mel)
)
row_err = np.abs(pallas_wav - scan_wav).max(axis=1)
print("gaussian AR TPU-vs-scan per-row max|err| (fp32 tiny, T=%d):" % T,
      np.array2string(row_err, precision=5), flush=True)
# Calibration (tools/r3s3_ar_precision.py): BOTH backends drift ~0.02
# from the exact CPU scan over 512 AR feedback steps — fp32 matmuls run
# as bf16 passes on the MXU by default and the sample-by-sample loop
# compounds the noise; the MoL control behaves identically (and its
# Gumbel argmax can flip a mixture -> O(1) row diffs even scan-vs-scan).
# A miscompile looks like SOME rows >> others (r3s2 bb=8: O(1) vs 0.017)
# — so the check is cross-row uniformity, not an absolute bound.
ok = bool(row_err.max() < max(10 * row_err.min(), 0.1))
print("gaussian AR rowcheck:", "OK" if ok else "** ROW CORRUPTION **",
      flush=True)

# --- 2. AR sampling: gaussian vs mol head (teacher_lj sizes) ---------------
lj_mol = get_config("teacher_lj")
lj_g = _gauss(get_config("teacher_lj"))
ar_mol = measure_teacher_ar_sampling(lj_mol)
ar_g = measure_teacher_ar_sampling(lj_g)
print("AR us/step  mol=%.1f  gaussian=%.1f" % (
    ar_mol["ar_us_per_step"], ar_g["ar_us_per_step"]), flush=True)

# --- 3. teacher train step: gaussian vs mol --------------------------------
tt_mol = measure_teacher_train(lj_mol)
tt_g = measure_teacher_train(lj_g)
print("teacher train ms/step  mol=%.1f  gaussian=%.1f" % (
    tt_mol["step_ms"], tt_g["step_ms"]), flush=True)

# --- 4. distill step: closed_form vs sampled --------------------------------
d_mol = measure_distill_train(get_config("student_iaf"))
d_g = measure_distill_train(get_config("clarinet_gaussian"))
print("distill ms/step  sampled(mol)=%.1f  closed_form(gaussian)=%.1f" % (
    d_mol["step_ms"], d_g["step_ms"]), flush=True)

# --- 5. student generate regression -----------------------------------------
g_mol = measure_student_inference(get_config("student_iaf"))
g_g = measure_student_inference(get_config("clarinet_gaussian"))
print("student gen x-realtime  logistic=%.0f  gaussian=%.0f" % (
    g_mol["audio_sec_per_s_per_chip"], g_g["audio_sec_per_s_per_chip"]),
    flush=True)

print(json.dumps({
    "ar_rowcheck_ok": ok,
    "ar_us_per_step": {"mol": ar_mol["ar_us_per_step"],
                       "gaussian": ar_g["ar_us_per_step"]},
    "teacher_train_ms": {"mol": tt_mol["step_ms"],
                         "gaussian": tt_g["step_ms"]},
    "distill_ms": {"sampled_mol": d_mol["step_ms"],
                   "closed_form_gaussian": d_g["step_ms"]},
    "student_gen_x_rt": {
        "logistic": g_mol["audio_sec_per_s_per_chip"],
        "gaussian": g_g["audio_sec_per_s_per_chip"]},
}))
