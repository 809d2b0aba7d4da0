#!/usr/bin/env python
"""Driver benchmark entry: prints ONE JSON line.

{"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

metric: student IAF synthesis throughput in audio-seconds generated per
wall-second per chip (== x realtime @ 22.05 kHz).  vs_baseline is the
ratio against the north-star target of 100x realtime (the reference
published no numbers — BASELINE.md §"Performance baseline").

Runs on whatever jax.devices() provides (the real TPU chip under axon).
"""

import json
import os
import sys


def _tpu_tunnel_reachable() -> bool:
    """The axon relay (127.0.0.1:8082) must accept connections, or
    jax.devices() blocks FOREVER (observed: tunnel died mid-round-2 and
    stayed down for hours; a hung bench is worse than an honest error
    line).  Only consulted when the env pins the axon platform."""
    import socket

    if "axon" not in os.environ.get("JAX_PLATFORMS", "axon"):
        return True
    s = socket.socket()
    s.settimeout(5)
    try:
        s.connect(("127.0.0.1", 8082))
        return True
    except OSError:
        return False
    finally:
        s.close()


def main() -> int:
    if not _tpu_tunnel_reachable():
        print(json.dumps({
            "metric": "student_audio_sec_per_s_per_chip",
            "value": 0.0,
            "unit": "audio-sec/s/chip (= x realtime)",
            "vs_baseline": 0.0,
            "error": "axon TPU tunnel unreachable (port 8082 refused); "
                     "jax.devices() would hang — see BASELINE.md for "
                     "the last measured value (1366x)",
        }))
        return 0

    from pwn_tpu.benchmarks import run_bench

    result = run_bench("student_iaf")
    line = {
        "metric": result["metric"],
        "value": result["value"],
        "unit": result["unit"],
        "vs_baseline": result["vs_baseline"],
    }
    print(json.dumps(line))
    print(
        "detail: " + json.dumps(result["detail"], default=str),
        file=sys.stderr,
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
