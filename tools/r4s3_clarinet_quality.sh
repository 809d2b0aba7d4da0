#!/bin/bash
# r4 session 3: the ClariNet QUALITY table (VERDICT r3 item 2 — round 3
# proved the gaussian family costs nothing; this run shows whether it
# HELPS).  Same speech corpus, schedules and levers as the r2 MoL
# best-recipe demo (tools/r2_best_recipe_demo.sh: teacher 20k, distill
# 10k, multi-res power loss, KL warmup 1000, EMA 0.9995), plus the
# r2-style generation temperature sweep so every row of the BASELINE.md
# comparison is apples-to-apples.
set -eo pipefail
cd /root/repo
D=${1:-/tmp/demo_clarinet_r4}
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

# teacher_lj trains its MoL teacher at lr 1e-3; match it for the
# gaussian teacher (the preset's 5e-4 is the distill lr)
python -m pwn_tpu.cli train-teacher clarinet_gaussian \
    --workdir "$D/teacher" --steps 20000 \
    $LEVERS train.learning_rate=1e-3 2>&1 | tail -3

python -m pwn_tpu.cli distill-student clarinet_gaussian \
    --teacher-workdir "$D/teacher" \
    --workdir "$D/student" --steps 10000 \
    $DLEVERS 2>&1 | tail -3

for T in 1.0 0.8 0.6 0.4 0.2; do
    echo "=== temperature $T ==="
    python -m pwn_tpu.cli generate clarinet_gaussian \
        --workdir "$D/student" --source "$D/source.wav" \
        --output "$D/student_gen_T$T.wav" --temperature "$T" $DLEVERS
    python -m pwn_tpu.cli eval clarinet_gaussian \
        --ref "$D/source.wav" --gen "$D/student_gen_T$T.wav"
done
