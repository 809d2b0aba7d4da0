from pwn_tpu.models.modules import (  # noqa: F401
    CausalConv1d,
    GatedResidualLayer,
    UpsampleNet,
    WaveNetStack,
)
from pwn_tpu.models.teacher import TeacherWaveNet  # noqa: F401
from pwn_tpu.models.student import StudentIAF  # noqa: F401
