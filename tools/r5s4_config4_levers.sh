#!/bin/bash
# r5 session 4: can the round's distillation levers fix config[4]'s
# measured silence-noise floor (-5.9 dBFS temperature-invariant at the
# plain r2 recipe — tools/r5s2)?  (a) teacher AR resynthesis for
# attribution (is the 24 kHz teacher itself clean?), (b) probe the
# retained teacher ladder, (c) re-distill with the probe-selected
# teacher + contrastive 0.3, (d) eval sweep vs the r5s2 rows.
# Requires /tmp/r5b from tools/r5s2_config4_quality.sh.
set -e
cd /root/repo
D=${1:-/tmp/r5b}
echo "=== $(date -u +%H:%M:%S) session start ==="

UNIT='train.global_batch_size=8 mesh.model=1'
LEVERS="$UNIT train.synthetic_corpus=speech train.ema_decay=0.9995"
DLEVERS="$LEVERS distill.kl_warmup_steps=1000 distill.power_loss_resolutions=((512,128,512),(2048,512,2048))"

echo "=== $(date -u +%H:%M:%S) teacher AR resynthesis (attribution) ==="
python -m pwn_tpu.cli generate large_student_sharded \
    --workdir "$D/teacher" --model teacher \
    --source "$D/source.wav" --output "$D/teacher_ar_T0.8.wav" \
    --temperature 0.8 $LEVERS 2>/dev/null | tail -1
python -m pwn_tpu.cli eval large_student_sharded \
    --ref "$D/source.wav" --gen "$D/teacher_ar_T0.8.wav" \
    2>/dev/null | sed "s/^/config4 teacherAR T=0.8 /"

echo "=== $(date -u +%H:%M:%S) ladder probe + distill (auto teacher, contrastive) ==="
python -m pwn_tpu.cli distill-student large_student_sharded \
    --teacher-workdir "$D/teacher" --teacher-step auto \
    --workdir "$D/student_lev" --steps 10000 \
    $DLEVERS distill.contrastive_weight=0.3 2>&1 | tail -4

for T in 0.8 0.4 0.2; do
  echo "=== $(date -u +%H:%M:%S) generate+eval levers T=$T ==="
  python -m pwn_tpu.cli generate large_student_sharded \
      --workdir "$D/student_lev" --source "$D/source.wav" \
      --output "$D/lev_T$T.wav" --temperature "$T" \
      $DLEVERS 2>/dev/null | tail -1
  python -m pwn_tpu.cli eval large_student_sharded \
      --ref "$D/source.wav" --gen "$D/lev_T$T.wav" \
      2>/dev/null | sed "s/^/config4-levers T=$T /"
done
echo "=== $(date -u +%H:%M:%S) session done ==="
