#!/bin/bash
# r5 session 6: execute the documented config[4] follow-up — the 24 kHz
# teacher was the measured quality bottleneck (AR floor -18.9 dBFS at
# 20k steps, val NLL still falling).  Resume it to 40k with a dense
# retained ladder, re-check its AR resynthesis, then distill with the
# round's best recipe (--teacher-step auto over the 22k..40k ladder +
# contrastive) and sweep.  Unlike the 22 kHz case (r4: 40k teacher
# distilled WORSE), the probe now guards the selection.
# Requires /tmp/r5b from tools/r5s2_config4_quality.sh.
set -e
cd /root/repo
D=${1:-/tmp/r5b}
echo "=== $(date -u +%H:%M:%S) session start ==="

UNIT='train.global_batch_size=8 mesh.model=1'
LEVERS="$UNIT train.synthetic_corpus=speech train.ema_decay=0.9995"
DLEVERS="$LEVERS distill.kl_warmup_steps=1000 distill.power_loss_resolutions=((512,128,512),(2048,512,2048))"

echo "=== $(date -u +%H:%M:%S) config[4] teacher resume 20k -> 40k (ladder kept) ==="
python -m pwn_tpu.cli train-teacher large_student_sharded \
    --workdir "$D/teacher" --steps 40000 \
    $LEVERS train.keep_checkpoints=10 2>&1 | tail -3

echo "=== $(date -u +%H:%M:%S) 40k teacher AR resynthesis (attribution) ==="
python -m pwn_tpu.cli generate large_student_sharded \
    --workdir "$D/teacher" --model teacher \
    --source "$D/source.wav" --output "$D/teacher40_ar_T0.8.wav" \
    --temperature 0.8 $LEVERS 2>/dev/null | tail -1
python -m pwn_tpu.cli eval large_student_sharded \
    --ref "$D/source.wav" --gen "$D/teacher40_ar_T0.8.wav" \
    2>/dev/null | sed "s/^/config4 teacher40AR T=0.8 /"

echo "=== $(date -u +%H:%M:%S) probe ladder + distill (auto, contrastive) ==="
# NOT piped through tail: the [teacher-probe] lines are the data
python -m pwn_tpu.cli distill-student large_student_sharded \
    --teacher-workdir "$D/teacher" --teacher-step auto \
    --workdir "$D/student_t40" --steps 10000 \
    $DLEVERS distill.contrastive_weight=0.3 2>&1 \
    | grep -E "teacher-probe|loaded teacher|student done|resumed"

for T in 0.8 0.4 0.2; do
  echo "=== $(date -u +%H:%M:%S) generate+eval t40 T=$T ==="
  python -m pwn_tpu.cli generate large_student_sharded \
      --workdir "$D/student_t40" --source "$D/source.wav" \
      --output "$D/t40_T$T.wav" --temperature "$T" \
      $DLEVERS 2>/dev/null | tail -1
  python -m pwn_tpu.cli eval large_student_sharded \
      --ref "$D/source.wav" --gen "$D/t40_T$T.wav" \
      2>/dev/null | sed "s/^/config4-t40 T=$T /"
done
echo "=== $(date -u +%H:%M:%S) session done ==="
