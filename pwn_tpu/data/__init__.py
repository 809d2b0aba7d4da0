from pwn_tpu.data.pipeline import (  # noqa: F401
    SyntheticTones,
    WavCropDataset,
    make_train_iterator,
    prefetch,
)
