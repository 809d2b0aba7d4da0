from pwn_tpu.models.modules import (  # noqa: F401
    CausalConv1d,
    GatedLayerParams,
    UpsampleNet,
    WaveNetStack,
    gated_layer_xla,
)
from pwn_tpu.models.teacher import TeacherWaveNet  # noqa: F401
from pwn_tpu.models.student import StudentIAF  # noqa: F401
