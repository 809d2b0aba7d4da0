from pwn_tpu.training.common import TrainState, make_optimizer  # noqa: F401
from pwn_tpu.training.teacher import make_teacher_train_step  # noqa: F401
from pwn_tpu.training.distill import (  # noqa: F401
    distillation_losses,
    make_distill_train_step,
)
