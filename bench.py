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
    from pwn_tpu.utils.platform import enable_persistent_compilation_cache

    # Warm repeat runs: the axon remote compile honors JAX's persistent
    # cache (345 s -> 7 s measured, BASELINE.md).  Without this the bench
    # pays full Mosaic compiles every invocation after a cache wipe.
    enable_persistent_compilation_cache()

    result = run_bench("student_iaf")
    line = {
        "metric": result["metric"],
        "value": result["value"],
        "unit": result["unit"],
        "vs_baseline": result["vs_baseline"],
    }
    # self-validation verdicts ride along (VERDICT r3 item 1): a failed
    # plausibility bound or kernel canary must be visible in the one
    # line the driver records, not buried in the detail
    if "error" in result:
        line["error"] = result["error"]
    kc = result["detail"].get("kernel_check", {})
    if "pass" in kc:
        line["kernel_check"] = "pass" if kc["pass"] else "FAIL"

    def _compact(x):
        if isinstance(x, float):
            return round(x, 3)
        if isinstance(x, dict):
            return {k: _compact(v) for k, v in x.items()}
        if isinstance(x, (list, tuple)):
            return [_compact(v) for v in x]
        return x

    # The driver records only a bounded TAIL of combined output; round 2's
    # multi-KB detail line (printed after the metric) pushed the metric line
    # out of the capture window -> BENCH_r02.json parsed: null.  Emit detail
    # FIRST and the one parseable metric line LAST, both flushed.
    print(
        "detail: " + json.dumps(_compact(result["detail"]), default=str),
        file=sys.stderr,
        flush=True,
    )
    print(json.dumps(line), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
