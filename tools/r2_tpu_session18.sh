#!/bin/bash
# Round-2 TPU session 18 (after session 17): quality numbers for the
# DIRECT student-training mode (train-student CLI), which has step-time
# rows in BASELINE.md but no quality table.  Same speech corpus, EMA +
# multi-res-equivalent levers where applicable, 15k steps (~5 min at
# 19.6 ms/step), then copy-synthesis eval incl. the voiced metrics.
set -e
cd /root/repo
D=${1:-/tmp/demo_direct}
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
EOF

python -m pwn_tpu.cli train-student student_iaf \
    --workdir "$D/student" --steps 15000 \
    train.synthetic_corpus=speech train.ema_decay=0.9995 2>&1 | tail -2

for T in 1.0 0.6 0.2; do
  python -m pwn_tpu.cli generate student_iaf \
      --workdir "$D/student" --source "$D/source.wav" \
      --output "$D/gen_t$T.wav" --temperature $T \
      train.synthetic_corpus=speech train.ema_decay=0.9995 2>/dev/null | tail -1
  echo -n "T=$T  "
  python -m pwn_tpu.cli eval student_iaf \
      --ref "$D/source.wav" --gen "$D/gen_t$T.wav" 2>/dev/null
done
