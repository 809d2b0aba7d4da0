from pwn_tpu.ops import conv, mol  # noqa: F401
