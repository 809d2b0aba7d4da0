"""grain-backed input pipeline (the SURVEY.md §1 T3 substrate).

Alternative engine to the built-in iterator (pipeline.py) and the C++
loader (native_loader.py), for deployments standardizing on grain:

* `grain.MapDataset` over the corpus, infinite-repeat + seeded shuffle,
  seeded `random_map` crops, batching;
* checkpointable: the `DatasetIterator`'s get_state/set_state gives
  exact stream resumption (wrapped below so the training loop's
  step-count resume also works);
* per-host sharding happens at the corpus level exactly like the other
  engines (`files[process_index::process_count]`), so hosts partition
  rather than duplicate the stream.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np

from pwn_tpu.config import Config


def make_grain_iterator(
    dataset,
    cfg: Config,
    local_batch_size: int,
    seed: int = 0,
    start_step: int = 0,
) -> Iterator[np.ndarray]:
    """Infinite deterministic (local_batch, crop_samples) float32 batches.

    `dataset` is any indexable corpus (WavCropDataset / SyntheticTones).
    The stream for (seed, step) is fixed; `start_step` fast-forwards via
    the grain iterator state (O(1), no replay).
    """
    import grain

    crop = cfg.train.crop_samples

    def crop_fn(wav: np.ndarray, rng: np.random.Generator) -> np.ndarray:
        if len(wav) <= crop:
            out = np.zeros(crop, np.float32)
            out[: len(wav)] = wav
            return out
        start = int(rng.integers(0, len(wav) - crop))
        return wav[start : start + crop].astype(np.float32)

    ds = (
        grain.MapDataset.source(dataset)
        .repeat()
        .shuffle(seed=seed)
        .random_map(crop_fn, seed=seed + 1)
        .batch(local_batch_size)
    )
    it = iter(ds.to_iter_dataset())
    if start_step:
        # element index is the only state; jump straight to the target
        state = it.get_state()
        state = dict(state)
        state["next_index"] = start_step * 1  # batch index
        it.set_state(state)
    return it
