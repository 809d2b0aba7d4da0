#!/usr/bin/env python
"""r4 session 5: serving-path latency on the real chip.

Measures what a vocoder CLIENT experiences against `pwn_tpu.cli serve`
(streaming chunked PCM16 over HTTP): time-to-first-audio-chunk,
inter-chunk cadence vs the audio clock (is the stream realtime?), and
total wall; single client warm/cold, then 2 concurrent clients
(admission + serialization behavior).  The server process owns the one
TPU chip; this script only runs the HTTP client side — start the
server separately, e.g.:

  python -m pwn_tpu.cli serve clarinet_gaussian \
      --workdir /tmp/demo_clarinet_r4/student --port 8600 \
      train.synthetic_corpus=speech train.ema_decay=0.9995

Usage: python tools/r4s5_serve_latency.py <source.wav> [port]
"""

import http.client
import sys
import threading
import time


def stream_once(host, port, body, temperature=0.8, label="req"):
    conn = http.client.HTTPConnection(host, port, timeout=600)
    t0 = time.perf_counter()
    conn.request(
        "POST", f"/synthesize?temperature={temperature}", body=body,
        headers={"Content-Type": "audio/wav"},
    )
    resp = conn.getresponse()
    if resp.status != 200:
        conn.close()
        return {"label": label, "status": resp.status,
                "retry_after": resp.headers.get("Retry-After")}
    sr = int(resp.headers.get("X-Sample-Rate", 22050))
    arrivals = []
    nbytes = 0
    while True:
        chunk = resp.read(1 << 16)
        if not chunk:
            break
        nbytes += len(chunk)
        arrivals.append((time.perf_counter() - t0, nbytes))
    conn.close()
    audio_sec = nbytes / 2 / sr
    total = arrivals[-1][0]
    return {
        "label": label,
        "status": 200,
        "ttfb_ms": arrivals[0][0] * 1e3,
        "total_s": total,
        "audio_sec": audio_sec,
        "x_realtime": audio_sec / total,
        "n_reads": len(arrivals),
        "sr": sr,
    }


def main():
    src = sys.argv[1]
    port = int(sys.argv[2]) if len(sys.argv) > 2 else 8600
    host = "127.0.0.1"
    body = open(src, "rb").read()
    print(f"source: {len(body)} bytes")

    # cold (first server-side compile) + 3 warm singles
    for i in range(4):
        r = stream_once(host, port, body, label=f"single_{i}")
        print(r, flush=True)

    # 2 concurrent clients
    results = []
    lock = threading.Lock()

    def worker(i):
        r = stream_once(host, port, body, label=f"conc_{i}")
        with lock:
            results.append(r)

    ts = [threading.Thread(target=worker, args=(i,)) for i in range(2)]
    t0 = time.perf_counter()
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    wall = time.perf_counter() - t0
    for r in sorted(results, key=lambda r: r["label"]):
        print(r, flush=True)
    served = sum(r.get("audio_sec", 0) for r in results)
    print(f"2-client wall {wall:.2f}s, aggregate "
          f"{served / wall:.1f}x realtime", flush=True)


if __name__ == "__main__":
    main()
