#!/bin/bash
# r4 session 6: does MORE TRAINING keep buying quality?  The r2 best
# recipe (teacher 20k / distill 10k) at DOUBLE schedule — teacher 40k,
# distill 20k, same levers — with the r2 temperature sweep on the same
# held-out speech clip.  ~25 min of TPU at the mega_train/mega_dx step
# times.  Results go to BASELINE.md next to the r2 recipe rows.
set -e
cd /root/repo
D=${1:-/tmp/demo_ext}
mkdir -p "$D"

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

python -m pwn_tpu.cli train-teacher teacher_lj \
    --workdir "$D/teacher" --steps 40000 \
    $LEVERS 2>&1 | tail -3

python -m pwn_tpu.cli distill-student student_iaf \
    --teacher-workdir "$D/teacher" --teacher-case teacher_lj \
    --workdir "$D/student" --steps 20000 \
    $DLEVERS 2>&1 | tail -3

for T in 1.0 0.8 0.6 0.4 0.2; do
  python -m pwn_tpu.cli generate student_iaf \
      --workdir "$D/student" --source "$D/source.wav" \
      --output "$D/student_gen_T$T.wav" --temperature "$T" \
      $DLEVERS 2>/dev/null | tail -1
  python -m pwn_tpu.cli eval student_iaf \
      --ref "$D/source.wav" --gen "$D/student_gen_T$T.wav" \
      2>/dev/null | sed "s/^/T=$T /"
done
