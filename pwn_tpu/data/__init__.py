from pwn_tpu.data.pipeline import (  # noqa: F401
    SyntheticSpeech,
    SyntheticTones,
    WavCropDataset,
    make_train_iterator,
    prefetch,
)
