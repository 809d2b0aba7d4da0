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
    num_workers: int | None = None,
) -> Iterator[np.ndarray]:
    """Infinite deterministic (local_batch, crop_samples) float32 batches.

    `dataset` is any indexable corpus (WavCropDataset / SyntheticTones).
    The stream for (seed, step) is fixed; `start_step` fast-forwards by
    SLICING the (random-access) batched MapDataset — `ds[start_step:]` —
    which is public grain API and O(1) (no replay, no private iterator
    state pokes).

    num_workers > 0 adds grain's multiprocess prefetch (the reference's
    PrefetchDataZMQ worker-pool equivalent); the batch stream is
    byte-identical with 0 or N workers because all randomness is
    index-keyed.  Defaults to cfg.train.grain_workers.
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
    if start_step:
        ds = ds[start_step:]
    it_ds = ds.to_iter_dataset()
    if num_workers is None:
        num_workers = cfg.train.grain_workers
    if num_workers > 0:
        from grain import multiprocessing as gmp

        it_ds = it_ds.mp_prefetch(
            gmp.MultiprocessingOptions(num_workers=num_workers)
        )
    return iter(it_ds)
