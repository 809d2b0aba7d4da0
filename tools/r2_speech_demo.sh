#!/bin/bash
# Round-2 full-size pipeline demo on the SPEECH-LIKE synthetic corpus
# (VERDICT r1 missing item 4 follow-through: re-run the 22 kHz
# acceptance demo against the harder signal; quality table goes to
# BASELINE.md).  All through the CLI, one TPU process at a time.
set -e
cd /root/repo
D=${1:-/tmp/demo_speech}
mkdir -p "$D"

python - "$D" <<'EOF'
import sys
from pwn_tpu.utils.platform import respect_jax_platforms_env
import os; os.environ["JAX_PLATFORMS"]="cpu"
import jax; jax.config.update("jax_platforms", "cpu")
from pwn_tpu.data import SyntheticSpeech
from pwn_tpu.utils.audio_io import write_wav
d = sys.argv[1]
# held-out clip: the val corpus seed (disjoint from train seeds)
clip = SyntheticSpeech(1, 4 * 22050, 22050, seed=7919)[0]
write_wav(f"{d}/source.wav", clip, 22050)
print("wrote", f"{d}/source.wav")
EOF

python -m pwn_tpu.cli train-teacher teacher_lj \
    --workdir "$D/teacher" --steps 6000 \
    train.synthetic_corpus=speech 2>&1 | tail -3

python -m pwn_tpu.cli distill-student student_iaf \
    --teacher-workdir "$D/teacher" --teacher-case teacher_lj \
    --workdir "$D/student" --steps 3000 \
    train.synthetic_corpus=speech 2>&1 | tail -3

python -m pwn_tpu.cli generate student_iaf \
    --workdir "$D/student" --source "$D/source.wav" \
    --output "$D/student_gen.wav" train.synthetic_corpus=speech

python -m pwn_tpu.cli eval student_iaf \
    --ref "$D/source.wav" --gen "$D/student_gen.wav"
