from pwn_tpu.ops.pallas.gated_layer import (  # noqa: F401
    TIME_TILE,
    fused_gated_residual,
)
