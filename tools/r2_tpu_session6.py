"""Round-2 TPU session 6: after the bwd-kernel refactor (3-D bias
blocks → any chunk size legal; PWN_TPU_BWD_CHUNK override) and the
chain-kernel zhist layout fix:

  1. teacher mega_train regression (the refactor re-lowers its kernel —
     protect the 18.2 ms/step result)
  2. chain kernel retry at student_iaf
  3. bwd layout scan at L=10 until one compiles
  4. if found: student_direct + distill mega_train A/B under that layout
"""

import json
import os
import sys

import jax

from pwn_tpu.config import get_config
from tools.r2_tpu_session1 import (
    gen_ms,
    student_direct_step_ms,
    train_step_ms,
)
from tools.r2_tpu_session3 import chain_gen_ms
from tools.r2_tpu_session5 import grad_run


def emit(tag, **kw):
    print(json.dumps({"tag": tag, **kw}), flush=True)


def main():
    emit("device", kind=str(jax.devices()[0]))

    # ---- 1. teacher regression ----
    try:
        ms = train_step_ms(get_config("teacher_lj"), "mega_train")
        emit("teacher_train", mode="mega_train", step_ms=round(ms, 2))
    except Exception as e:
        emit("teacher_train", mode="mega_train", error=repr(e)[:400])

    # ---- 2. chain retry ----
    scfg = get_config("student_iaf")
    try:
        ms, xrt = chain_gen_ms(scfg, 8, 2.0)
        emit("student_gen", backend="chain", call_ms=round(ms, 2),
             x_realtime=round(xrt, 1))
    except Exception as e:
        emit("student_gen", backend="chain", error=repr(e)[:400])

    # ---- 3. bwd layout scan at L=10 ----
    good = None
    for lc, bb in ((5, 4), (5, 8), (2, 8), (10, 2), (1, 8)):
        os.environ["PWN_TPU_BWD_CHUNK"] = f"{lc},{bb}"
        try:
            v = grad_run(10)
            emit("bwd_layout", lc=lc, bb=bb, ok=True,
                 checksum=round(v, 3))
            if good is None:
                good = (lc, bb)
        except Exception as e:
            emit("bwd_layout", lc=lc, bb=bb, ok=False,
                 error=repr(e)[:200])
    os.environ.pop("PWN_TPU_BWD_CHUNK", None)

    # ---- 4. student step A/B under the winning layout ----
    if good is not None:
        os.environ["PWN_TPU_BWD_CHUNK"] = f"{good[0]},{good[1]}"
        for mode in ("off", "mega_train"):
            try:
                ms = student_direct_step_ms(scfg, mode)
                emit("student_direct", mode=mode, layout=good,
                     step_ms=round(ms, 2))
            except Exception as e:
                emit("student_direct", mode=mode, layout=good,
                     error=repr(e)[:200])
        os.environ.pop("PWN_TPU_BWD_CHUNK", None)

    # regression watch: default student generation unchanged
    try:
        ms, xrt = gen_ms(scfg, "auto", 8, 2.0)
        emit("student_gen", backend="mega_glue", call_ms=round(ms, 2),
             x_realtime=round(xrt, 1))
    except Exception as e:
        emit("student_gen", backend="mega_glue", error=repr(e)[:200])

    emit("done")
    return 0


if __name__ == "__main__":
    sys.exit(main())
