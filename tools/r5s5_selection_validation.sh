#!/bin/bash
# r5 session 5: validate the CORRECTED teacher-selection criterion
# end-to-end.  The r5s3 run proved KL-only selection is a trap (the 6k
# teacher probes best in KL but its student inherits a -6.4 dBFS noise
# floor); the probe's TOTAL val loss ranks 16k best.  Distill 10k from
# teacher step 16000 (+ contrastive 0.3, the measured-best lever) and
# sweep — against the latest-teacher baseline (val KL 0.306) and the
# r5s1 contrastive arm.  Requires /tmp/r5a.
set -e
cd /root/repo
D=${1:-/tmp/r5a}
echo "=== $(date -u +%H:%M:%S) session start ==="

LEVERS='train.synthetic_corpus=speech train.ema_decay=0.9995'
DLEVERS="$LEVERS distill.kl_warmup_steps=1000 distill.power_loss_resolutions=((512,128,512),(2048,512,2048))"

echo "=== $(date -u +%H:%M:%S) distill 10k from teacher 16000 + contrastive ==="
python -m pwn_tpu.cli distill-student student_iaf \
    --teacher-workdir "$D/teacher" --teacher-case teacher_lj \
    --teacher-step 16000 \
    --workdir "$D/student_sel16_ctr" --steps 10000 \
    $DLEVERS distill.contrastive_weight=0.3 2>&1 | tail -3

for T in 0.8 0.4 0.2; do
  echo "=== $(date -u +%H:%M:%S) generate+eval sel16+ctr T=$T ==="
  python -m pwn_tpu.cli generate student_iaf \
      --workdir "$D/student_sel16_ctr" --source "$D/source.wav" \
      --output "$D/sel16_ctr_T$T.wav" --temperature "$T" \
      $DLEVERS 2>/dev/null | tail -1
  python -m pwn_tpu.cli eval student_iaf \
      --ref "$D/source.wav" --gen "$D/sel16_ctr_T$T.wav" \
      2>/dev/null | sed "s/^/sel16+ctr T=$T /"
done
echo "=== $(date -u +%H:%M:%S) session done ==="
