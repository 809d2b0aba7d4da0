"""Round-2 TPU session 11: config[4] generation A/B in ONE process —
mega_glue (megakernel flows + XLA heads) vs the fused chain kernel.
Session 10 only ran chain at config[4] (37.7 ms); the 34.8 ms megakernel
number is from an earlier session, and chip-state noise across sessions
is larger than the gap (CLAUDE.md).
"""

import json
import traceback

import jax

from pwn_tpu.config import get_config
from tools.r2_tpu_session1 import gen_ms
from tools.r2_tpu_session3 import chain_gen_ms


def emit(tag, **kw):
    print(json.dumps({"tag": tag, **kw}), flush=True)


def main():
    emit("device", kind=str(jax.devices()[0]))
    c4 = get_config("large_student_sharded")
    for name, fn in (
        ("mega_glue", lambda: gen_ms(c4, "auto", 8, 2.0)),
        ("chain", lambda: chain_gen_ms(c4, 8, 2.0)),
        ("mega_glue2", lambda: gen_ms(c4, "auto", 8, 2.0)),
        ("chain2", lambda: chain_gen_ms(c4, 8, 2.0)),
    ):
        try:
            ms, xrt = fn()
            emit("config4_gen", mode=name, call_ms=round(ms, 2),
                 x_realtime=round(xrt, 1))
        except Exception:
            emit("config4_gen", mode=name, error="see traceback")
            traceback.print_exc()
    emit("done")


if __name__ == "__main__":
    main()
