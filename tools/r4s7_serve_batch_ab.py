#!/usr/bin/env python
"""r4 session 7: cross-request dynamic batching A/B on the real chip.

Drives N concurrent clients against ONE live `pwn_tpu.cli serve`
process (which owns the TPU), comparing the lock-serialized path
(`?batching=off`) against the batch engine (`?batching=on`, server
started with --batch-max >= N).  Both arms hit the same process in the
same chip-state, so the comparison is back-to-back per the CLAUDE.md
measurement rules.  Start the server first, e.g.:

  python -m pwn_tpu.cli serve student_iaf \
      --workdir /tmp/demo_ext_r4s6/student --port 8600 --batch-max 4 \
      train.synthetic_corpus=speech train.ema_decay=0.9995 \
      distill.kl_warmup_steps=1000

Usage: python tools/r4s7_serve_batch_ab.py <source.wav> [port] [N]
"""

import http.client
import json
import sys
import threading
import time


def stream_once(host, port, body, batching, label):
    conn = http.client.HTTPConnection(host, port, timeout=600)
    t0 = time.perf_counter()
    mode = "on" if batching else "off"
    conn.request(
        "POST", f"/synthesize?temperature=0.8&batching={mode}",
        body=body, headers={"Content-Type": "audio/wav"},
    )
    resp = conn.getresponse()
    if resp.status != 200:
        conn.close()
        return {"label": label, "status": resp.status}
    sr = int(resp.headers.get("X-Sample-Rate", 22050))
    ttfb = None
    nbytes = 0
    while True:
        # read1: return as soon as ONE transfer chunk arrives — read(N)
        # on a chunked response BLOCKS until N bytes or EOF, which turns
        # "TTFB" into completion time for sub-N responses (r4s7 CPU
        # drive measured exactly that)
        chunk = resp.read1(1 << 16)
        if not chunk:
            break
        if ttfb is None:
            ttfb = time.perf_counter() - t0
        nbytes += len(chunk)
    total = time.perf_counter() - t0
    conn.close()
    return {
        "label": label, "status": 200, "ttfb_ms": ttfb * 1e3,
        "total_s": total, "audio_sec": nbytes / 2 / sr,
    }


def run_arm(host, port, body, batching, n_clients, label):
    results = []
    lock = threading.Lock()

    def worker(i):
        r = stream_once(host, port, body, batching, f"{label}_{i}")
        with lock:
            results.append(r)

    ts = [threading.Thread(target=worker, args=(i,))
          for i in range(n_clients)]
    t0 = time.perf_counter()
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    wall = time.perf_counter() - t0
    ok = [r for r in results if r["status"] == 200]
    agg = sum(r["audio_sec"] for r in ok) / wall if ok else 0.0
    ttfbs = sorted(r["ttfb_ms"] for r in ok)
    out = {
        "arm": label, "clients": n_clients, "completed": len(ok),
        "wall_s": round(wall, 3),
        "aggregate_x_realtime": round(agg, 2),
        "ttfb_ms_min": round(ttfbs[0], 1) if ttfbs else None,
        "ttfb_ms_max": round(ttfbs[-1], 1) if ttfbs else None,
    }
    print(json.dumps(out), flush=True)
    return out


def healthz(host, port):
    conn = http.client.HTTPConnection(host, port, timeout=60)
    conn.request("GET", "/healthz")
    h = json.loads(conn.getresponse().read())
    conn.close()
    return h


def main():
    src = sys.argv[1]
    port = int(sys.argv[2]) if len(sys.argv) > 2 else 8600
    n = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    host = "127.0.0.1"
    body = open(src, "rb").read()
    print(f"source: {len(body)} bytes; healthz: "
          f"{json.dumps(healthz(host, port))}", flush=True)

    # warm both paths (compiles already done by server warmup, but get
    # a first-touch out of the way for each)
    for mode in (False, True):
        r = stream_once(host, port, body, mode, f"warm_{mode}")
        print(json.dumps(r), flush=True)

    # interleave arms x3 so chip-state drift averages out
    for rep in range(3):
        run_arm(host, port, body, False, n, f"serialized_rep{rep}")
        run_arm(host, port, body, True, n, f"batched_rep{rep}")
    # single-client sanity: batching on must not regress a lone stream
    for rep in range(2):
        run_arm(host, port, body, True, 1, f"single_on_rep{rep}")
        run_arm(host, port, body, False, 1, f"single_off_rep{rep}")
    print("final healthz: " + json.dumps(healthz(host, port)),
          flush=True)


if __name__ == "__main__":
    main()
