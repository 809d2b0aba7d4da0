#!/usr/bin/env python
"""r4 session 4: input-pipeline engine throughput (host CPU only).

Sizes the three interchangeable data engines (SURVEY T3) against the
training steps they must feed: an engine is 'fast enough' when its
batches/s exceeds the fused train step's 1/step_ms (teacher 17.3 ms ->
58 batches/s at batch 8x16384; config[4] distill 85.8 ms -> 12
batches/s at 8x24576).  Reference equivalent: tensorpack PrefetchDataZMQ
worker pool (SURVEY.md:133).

Measures steady-state batches/s of raw `next()` on each engine over a
PCM16 wav corpus, after a warmup; all engines yield byte-identical
(seed, step)-keyed streams at 0 or N workers, so this is pure
throughput, not a correctness A/B (that's tests/test_data.py /
tests/test_native_loader.py).
"""

import os
import sys
import tempfile
import time

sys.path.insert(0, ".")
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np  # noqa: E402
from scipy.io import wavfile  # noqa: E402

from pwn_tpu.config import get_config  # noqa: E402
from pwn_tpu.data.pipeline import (  # noqa: E402
    WavCropDataset,
    make_train_iterator,
)

N_CLIPS = 200
SR = 22050
STEPS = 150
WARMUP = 20


def bench(name, it, steps=STEPS, warmup=WARMUP):
    for _ in range(warmup):
        next(it)
    t0 = time.perf_counter()
    for _ in range(steps):
        b = next(it)
    dt = time.perf_counter() - t0
    mbps = b.nbytes * steps / dt / 1e6
    print(f"  {name:34s} {steps / dt:8.1f} batches/s"
          f"  ({mbps:7.0f} MB/s crops)", flush=True)
    return steps / dt


def main():
    tmp = tempfile.mkdtemp(prefix="loader_bench_")
    rng = np.random.default_rng(0)
    for i in range(N_CLIPS):
        n = int(SR * rng.uniform(2.0, 5.0))
        wav = (rng.uniform(-0.5, 0.5, n) * 32767).astype(np.int16)
        wavfile.write(os.path.join(tmp, f"clip_{i:04d}.wav"), SR, wav)
    print(f"corpus: {N_CLIPS} clips, "
          f"{sum(os.path.getsize(os.path.join(tmp, f)) for f in os.listdir(tmp)) / 1e6:.0f} MB")

    for preset, batch in (("teacher_lj", 8), ("large_student_sharded", 8)):
        cfg = get_config(preset)
        crop = cfg.train.crop_samples
        print(f"\n[{preset}] batch {batch} x {crop} crops:")

        ds = WavCropDataset(tmp, cfg.dsp.sample_rate)
        bench("thread pipeline (make_train_iterator)",
              make_train_iterator(ds, cfg, batch, seed=1))

        from pwn_tpu.data.native_loader import (
            NativeWavCropLoader,
            native_available,
        )
        if native_available():
            bench("C++ native loader (queue_depth=4)",
                  iter(NativeWavCropLoader(tmp, crop, batch, seed=1)))
        else:
            print("  C++ native loader: unavailable (no toolchain)")

        try:
            from pwn_tpu.data.grain_pipeline import make_grain_iterator
            bench("grain (0 workers)",
                  make_grain_iterator(ds, cfg, batch, seed=1,
                                      num_workers=0))
            bench("grain (2 workers)",
                  make_grain_iterator(ds, cfg, batch, seed=1,
                                      num_workers=2))
        except ImportError:
            print("  grain: not installed")

        step_ms = {"teacher_lj": 17.3, "large_student_sharded": 85.8}[
            preset]
        print(f"  (train step to outrun: {1000 / step_ms:.0f} steps/s "
              f"— fused {'teacher' if preset == 'teacher_lj' else 'distill'}"
              f" {step_ms} ms)")


if __name__ == "__main__":
    main()
