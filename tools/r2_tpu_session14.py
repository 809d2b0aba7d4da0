"""Round-2 TPU session 14: post-feature regression sweep in one process.

After the r2 feature batch (mega_dx default, clip cache, multi-res loss
plumbing, EMA, streaming): confirm the headline numbers are unchanged
and measure EMA's per-step overhead (one extra param-tree multiply-add).
"""

import json
import traceback

import jax

from pwn_tpu.config import get_config, override
from tools.r2_tpu_session1 import gen_ms, student_direct_step_ms, train_step_ms
from tools.r2_tpu_session12 import distill_step_ms


def emit(tag, **kw):
    print(json.dumps({"tag": tag, **kw}), flush=True)


def main():
    emit("device", kind=str(jax.devices()[0]))
    scfg = get_config("student_iaf")
    tcfg = get_config("teacher_lj")

    for name, fn in (
        ("teacher_train", lambda: train_step_ms(tcfg, "mega_train")),
        ("teacher_train_ema", lambda: train_step_ms(
            override(tcfg, "train.ema_decay", 0.9995), "mega_train")),
        ("student_direct", lambda: student_direct_step_ms(
            scfg, "mega_train")),
        ("distill_mega_dx", lambda: distill_step_ms("mega_dx")),
        ("student_gen", lambda: gen_ms(scfg, "auto", 8, 2.0)),
    ):
        try:
            r = fn()
            if isinstance(r, tuple):
                emit(name, call_ms=round(r[0], 2),
                     x_realtime=round(r[1], 1))
            else:
                emit(name, step_ms=round(r, 2))
        except Exception:
            emit(name, error="see traceback")
            traceback.print_exc()
    emit("done")


if __name__ == "__main__":
    main()
