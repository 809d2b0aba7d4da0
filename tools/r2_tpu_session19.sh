#!/bin/bash
# Round-2 TPU session 19: the serve-smoke + compile-cache cold/warm
# verification from tools/r2_tpu_session17.sh, retargeted at the
# direct-student workdir produced by tools/r2_tpu_session18.sh
# (the /tmp/demo_best best-recipe checkpoint was lost to a VM reset;
# these checks only need *a* student checkpoint, not the best one).
# One TPU process at a time throughout.
set -e -o pipefail
cd /root/repo
D=${1:-/tmp/demo_direct}
CACHE=/tmp/s19cache
rm -rf "$CACHE"

if [ ! -d "$D/student" ]; then
  echo "no student workdir in $D — run tools/r2_tpu_session18.sh first"
  exit 1
fi

echo "== 1. CLI generate: cold (fresh cache) then warm =="
for run in cold warm; do
  s=$(date +%s)
  PWN_TPU_COMPILE_CACHE=$CACHE python -m pwn_tpu.cli generate student_iaf \
    --workdir "$D/student" --source "$D/source.wav" \
    --output "$D/gen_s19_$run.wav" --temperature 0.4 \
    train.synthetic_corpus=speech train.ema_decay=0.9995 2>/dev/null | tail -1
  echo "$run wall: $(( $(date +%s) - s ))s"
done

echo "== 2. serve smoke on the real chip =="
PWN_TPU_COMPILE_CACHE=$CACHE python -m pwn_tpu.cli serve student_iaf \
  --workdir "$D/student" --port 8614 --chunk-frames 64 \
  train.synthetic_corpus=speech train.ema_decay=0.9995 \
  > /tmp/s19_serve.log 2>&1 &
SRV=$!
# Never leave the serve process holding the chip claim, whatever kills
# this script (set -e, tunnel hang, ^C) — ADVICE r2.
trap 'kill $SRV 2>/dev/null; wait $SRV 2>/dev/null' EXIT
healthy=0
for i in $(seq 1 240); do
  curl -s -m 2 localhost:8614/healthz >/dev/null 2>&1 && { healthy=1; break; }
  sleep 2
done
if [ "$healthy" != 1 ]; then
  echo "serve never became healthy after 8 min — serve log tail:" >&2
  tail -20 /tmp/s19_serve.log >&2
  exit 1
fi
curl -s localhost:8614/healthz; echo
python - "$D" <<'EOF'
import io, sys, time, http.client
from scipy.io import wavfile
sr, wav = wavfile.read(f"{sys.argv[1]}/source.wav")
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
wait $SRV 2>/dev/null || true
trap - EXIT
echo "serve smoke done"
