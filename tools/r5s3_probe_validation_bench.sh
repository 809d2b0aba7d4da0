#!/bin/bash
# r5 session 3: (a) validate --teacher-step auto END-TO-END — full 10k
# distill from the probe-selected teacher (step 6000 of the r5s1
# ladder) vs the latest-checkpoint baseline (val KL 0.306); (b) stack
# the two r5 quality levers (probe-selected teacher + contrastive) for
# the best-known recipe; (c) run the driver bench to validate the new
# AR-row depth + config[4] generation row + MFU-by-channel-width.
# Requires /tmp/r5a from tools/r5s1_contrastive_teacher_select.sh.
set -e
cd /root/repo
D=${1:-/tmp/r5a}
echo "=== $(date -u +%H:%M:%S) session start ==="

LEVERS='train.synthetic_corpus=speech train.ema_decay=0.9995'
DLEVERS="$LEVERS distill.kl_warmup_steps=1000 distill.power_loss_resolutions=((512,128,512),(2048,512,2048))"

echo "=== $(date -u +%H:%M:%S) distill 10k from probe-selected teacher (6000) ==="
python -m pwn_tpu.cli distill-student student_iaf \
    --teacher-workdir "$D/teacher" --teacher-case teacher_lj \
    --teacher-step 6000 \
    --workdir "$D/student_sel" --steps 10000 \
    $DLEVERS 2>&1 | tail -3

echo "=== $(date -u +%H:%M:%S) distill 10k selected teacher + contrastive ==="
python -m pwn_tpu.cli distill-student student_iaf \
    --teacher-workdir "$D/teacher" --teacher-case teacher_lj \
    --teacher-step 6000 \
    --workdir "$D/student_sel_ctr" --steps 10000 \
    $DLEVERS distill.contrastive_weight=0.3 2>&1 | tail -3

for arm in student_sel student_sel_ctr; do
  for T in 0.8 0.2; do
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

echo "=== $(date -u +%H:%M:%S) driver bench (new AR depth + config4 row) ==="
python bench.py | tee "$D/bench_r5.json"
echo
echo "=== $(date -u +%H:%M:%S) session done ==="
