#!/bin/bash
# r5 session 1 (VERDICT r4 items 2 + 5): on the r2 best-recipe speech
# pipeline —
#   (a) A/B the Parallel WaveNet CONTRASTIVE distillation term
#       (distill.contrastive_weight=0.3) against the r2 baseline
#       (val KL 0.306 ceiling), identical teacher/schedules/levers;
#   (b) distillability-aware teacher selection: probe the full ladder
#       of retained teacher checkpoints (2k..20k) with 500-step
#       distills, and measure distill-from-EMA vs distill-from-live.
# ~60 min of TPU wall at the mega_train/mega_dx step times.
set -e
cd /root/repo
D=${1:-/tmp/r5a}
mkdir -p "$D"
echo "=== $(date -u +%H:%M:%S) session start ==="

python - "$D" <<'EOF'
import sys
import os; os.environ["JAX_PLATFORMS"]="cpu"
import jax; jax.config.update("jax_platforms", "cpu")
from pwn_tpu.data import SyntheticSpeech
from pwn_tpu.utils.audio_io import write_wav
d = sys.argv[1]
clip = SyntheticSpeech(1, 4 * 22050, 22050, seed=7919)[0]
write_wav(f"{d}/source.wav", clip, 22050)
print("wrote", f"{d}/source.wav")
EOF

LEVERS='train.synthetic_corpus=speech train.ema_decay=0.9995'
DLEVERS="$LEVERS distill.kl_warmup_steps=1000 distill.power_loss_resolutions=((512,128,512),(2048,512,2048))"

echo "=== $(date -u +%H:%M:%S) teacher 20k (keep full ckpt ladder) ==="
python -m pwn_tpu.cli train-teacher teacher_lj \
    --workdir "$D/teacher" --steps 20000 \
    $LEVERS train.keep_checkpoints=10 2>&1 | tail -3

echo "=== $(date -u +%H:%M:%S) distill baseline 10k ==="
python -m pwn_tpu.cli distill-student student_iaf \
    --teacher-workdir "$D/teacher" --teacher-case teacher_lj \
    --workdir "$D/student_base" --steps 10000 \
    $DLEVERS 2>&1 | tail -3

echo "=== $(date -u +%H:%M:%S) distill contrastive 10k (gamma=0.3) ==="
python -m pwn_tpu.cli distill-student student_iaf \
    --teacher-workdir "$D/teacher" --teacher-case teacher_lj \
    --workdir "$D/student_ctr" --steps 10000 \
    $DLEVERS distill.contrastive_weight=0.3 2>&1 | tail -3

for arm in student_base student_ctr; do
  for T in 1.0 0.8 0.6 0.4 0.2; do
    echo "=== $(date -u +%H:%M:%S) generate+eval $arm T=$T ==="
    python -m pwn_tpu.cli generate student_iaf \
        --workdir "$D/$arm" --source "$D/source.wav" \
        --output "$D/${arm}_T$T.wav" --temperature "$T" \
        $DLEVERS 2>/dev/null | tail -1
    python -m pwn_tpu.cli eval student_iaf \
        --ref "$D/source.wav" --gen "$D/${arm}_T$T.wav" \
        2>/dev/null | sed "s/^/$arm T=$T /"
  done
done

echo "=== $(date -u +%H:%M:%S) teacher ladder probe + EMA-vs-live ==="
python - "$D" <<'EOF'
import json
import sys

from pwn_tpu.utils.platform import enable_persistent_compilation_cache

enable_persistent_compilation_cache()
from pwn_tpu.config import get_config
from pwn_tpu.training.teacher_select import probe_teacher_checkpoints

d = sys.argv[1]
cfg = get_config(
    "student_iaf",
    **{
        "train.synthetic_corpus": "speech",
        "train.ema_decay": "0.9995",
        "distill.kl_warmup_steps": "500",
        "distill.power_loss_resolutions":
            "((512,128,512),(2048,512,2048))",
    },
)
tcfg = get_config("teacher_lj", **{"train.synthetic_corpus": "speech",
                                   "train.ema_decay": "0.9995"})
ladder = probe_teacher_checkpoints(
    cfg, f"{d}/teacher", teacher_cfg=tcfg, probe_steps=500,
)
print("LADDER " + json.dumps(ladder), flush=True)

ema_vs_live = []
for prefer_ema in (True, False):
    r = probe_teacher_checkpoints(
        cfg, f"{d}/teacher", teacher_cfg=tcfg, probe_steps=2000,
        candidates=[20000], prefer_ema=prefer_ema,
    )[0]
    r["teacher_params"] = "ema" if prefer_ema else "live"
    ema_vs_live.append(r)
print("EMA_VS_LIVE " + json.dumps(ema_vs_live), flush=True)
EOF
echo "=== $(date -u +%H:%M:%S) session done ==="
