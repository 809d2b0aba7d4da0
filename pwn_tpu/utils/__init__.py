from pwn_tpu.utils import audio_io, dsp  # noqa: F401
