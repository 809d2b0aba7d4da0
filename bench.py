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
import sys


def main() -> int:
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
