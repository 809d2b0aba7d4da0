#!/bin/bash
# r5 session 2 (VERDICT r4 item 1): config[4] `large_student_sharded`
# END-TO-END QUALITY — the one preset whose audio had never been
# measured.  The proven 20k/10k recipe (multi-res power, KL warmup,
# EMA) scaled to 6 flows / 128 ch / 24 kHz on the speech corpus at the
# single-chip DP unit of work (batch 8 x 24576/chip, mesh model=1 —
# the measured config[4] training layout, BASELINE.md r4), finishing
# with the full eval table + a serve exercise of the checkpoint.
# ~45 min of TPU at the measured 26.2/85.8 ms fused steps.
set -e
cd /root/repo
D=${1:-/tmp/r5b}
mkdir -p "$D"
echo "=== $(date -u +%H:%M:%S) session start ==="

python - "$D" <<'EOF'
import sys
import os; os.environ["JAX_PLATFORMS"]="cpu"
import jax; jax.config.update("jax_platforms", "cpu")
from pwn_tpu.data import SyntheticSpeech
from pwn_tpu.utils.audio_io import write_wav
d = sys.argv[1]
clip = SyntheticSpeech(1, 4 * 24000, 24000, seed=7919)[0]
write_wav(f"{d}/source.wav", clip, 24000)
print("wrote", f"{d}/source.wav")
EOF

# single-chip DP unit of work: per-chip batch 8 (global 64 over 8 chips
# in the deployed layout), crop 24576 @ 24 kHz
UNIT='train.global_batch_size=8 mesh.model=1'
LEVERS="$UNIT train.synthetic_corpus=speech train.ema_decay=0.9995"
DLEVERS="$LEVERS distill.kl_warmup_steps=1000 distill.power_loss_resolutions=((512,128,512),(2048,512,2048))"

echo "=== $(date -u +%H:%M:%S) config[4] teacher 20k ==="
python -m pwn_tpu.cli train-teacher large_student_sharded \
    --workdir "$D/teacher" --steps 20000 \
    $LEVERS 2>&1 | tail -3

echo "=== $(date -u +%H:%M:%S) config[4] distill 10k ==="
python -m pwn_tpu.cli distill-student large_student_sharded \
    --teacher-workdir "$D/teacher" \
    --workdir "$D/student" --steps 10000 \
    $DLEVERS 2>&1 | tail -3

for T in 1.0 0.8 0.6 0.4 0.2; do
  echo "=== $(date -u +%H:%M:%S) generate+eval T=$T ==="
  python -m pwn_tpu.cli generate large_student_sharded \
      --workdir "$D/student" --source "$D/source.wav" \
      --output "$D/gen_T$T.wav" --temperature "$T" \
      $DLEVERS 2>/dev/null | tail -1
  python -m pwn_tpu.cli eval large_student_sharded \
      --ref "$D/source.wav" --gen "$D/gen_T$T.wav" \
      2>/dev/null | sed "s/^/config4 T=$T /"
done

echo "=== $(date -u +%H:%M:%S) serve exercise (24 kHz checkpoint) ==="
python -m pwn_tpu.cli serve large_student_sharded \
    --workdir "$D/student" --port 8641 $DLEVERS \
    > "$D/serve.log" 2>&1 &
SRV=$!
# cold Mosaic compiles of the streaming windows + batch buckets can
# take several minutes over the tunnel on first run — wait generously
for i in $(seq 1 420); do
  sleep 2
  if curl -s -m 3 "localhost:8641/healthz" | grep -q '"ok"'; then
    break
  fi
done
curl -s -m 600 -X POST --data-binary "@$D/source.wav" \
    "localhost:8641/synthesize?temperature=0.6" -o "$D/served.pcm"
curl -s -m 5 "localhost:8641/healthz" | tee "$D/healthz.json"; echo
kill -TERM $SRV   # exact PID — graceful drain path
wait $SRV || true
grep -q "server stopped" "$D/serve.log" \
    && echo "graceful shutdown OK" || echo "graceful shutdown MISSING"
python - "$D" <<'EOF'
import sys
import numpy as np
d = sys.argv[1]
pcm = np.frombuffer(open(f"{d}/served.pcm", "rb").read(), "<i2")
print(f"served {len(pcm)/24000:.2f}s of PCM16 @24kHz, "
      f"peak {np.abs(pcm).max()/32767.0:.3f}")
from scipy.io import wavfile
wavfile.write(f"{d}/served.wav", 24000, pcm)
EOF
python -m pwn_tpu.cli eval large_student_sharded \
    --ref "$D/source.wav" --gen "$D/served.wav" \
    2>/dev/null | sed "s/^/config4 served T=0.6 /"
echo "=== $(date -u +%H:%M:%S) session done ==="
