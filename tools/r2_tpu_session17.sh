#!/bin/bash
# Round-2 TPU session 17 (run when the axon tunnel is back):
#  1. CLI generate cold/warm wall time with the persistent compile
#     cache (the e2e verification interrupted by the tunnel outage).
#  2. Serve-mode smoke on the real chip: healthz + one streamed
#     synthesis, time-to-first-byte.
#  3. Full bench.py run (records dp_analytic on-chip for BASELINE).
# One TPU process at a time throughout.
set -e
cd /root/repo
D=/tmp/demo_best
CACHE=/tmp/s17cache
rm -rf "$CACHE"

if [ ! -f "$D/source.wav" ]; then
  mkdir -p "$D"
  python - "$D" <<'EOF'
import sys
import os; os.environ["JAX_PLATFORMS"]="cpu"
import jax; jax.config.update("jax_platforms", "cpu")
from pwn_tpu.data import SyntheticSpeech
from pwn_tpu.utils.audio_io import write_wav
d = sys.argv[1]
write_wav(f"{d}/source.wav",
          SyntheticSpeech(1, 4 * 22050, 22050, seed=7919)[0], 22050)
EOF
fi
if [ ! -d "$D/student/ckpt_student" ]; then
  echo "no student checkpoint in $D — rerun tools/r2_best_recipe_demo.sh first"
  exit 1
fi

echo "== 1. CLI generate: cold (fresh cache) then warm =="
for run in cold warm; do
  s=$(date +%s)
  PWN_TPU_COMPILE_CACHE=$CACHE python -m pwn_tpu.cli generate student_iaf \
    --workdir $D/student --source $D/source.wav \
    --output $D/gen_s17_$run.wav --temperature 0.4 \
    train.ema_decay=0.9995 2>/dev/null | tail -1
  echo "$run wall: $(( $(date +%s) - s ))s"
done

echo "== 2. serve smoke =="
PWN_TPU_COMPILE_CACHE=$CACHE python -m pwn_tpu.cli serve student_iaf \
  --workdir $D/student --port 8614 --chunk-frames 64 \
  train.ema_decay=0.9995 > /tmp/s17_serve.log 2>&1 &
SRV=$!
for i in $(seq 1 240); do
  curl -s -m 2 localhost:8614/healthz >/dev/null 2>&1 && break
  sleep 2
done
curl -s localhost:8614/healthz; echo
python - <<'EOF'
import io, time, http.client
import numpy as np
from scipy.io import wavfile
wav, sr = wavfile.read("/tmp/demo_best/source.wav")
buf = io.BytesIO(); wavfile.write(buf, sr, wav)
for run in range(2):
    c = http.client.HTTPConnection("127.0.0.1", 8614, timeout=600)
    t0 = time.perf_counter()
    c.request("POST", "/synthesize?temperature=0.4", body=buf.getvalue())
    r = c.getresponse()
    first = r.read(1024)          # first streamed bytes
    ttfb = (time.perf_counter() - t0) * 1e3
    rest = r.read()
    total = (time.perf_counter() - t0) * 1e3
    n = (len(first) + len(rest)) // 2
    print(f"run{run}: status={r.status} ttfb={ttfb:.0f}ms "
          f"total={total:.0f}ms samples={n} "
          f"audio_s={n/int(r.getheader('X-Sample-Rate')):.2f}")
    c.close()
EOF
kill $SRV

echo "== 3. bench =="
python bench.py
