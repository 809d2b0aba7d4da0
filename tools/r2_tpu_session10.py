"""Round-2 TPU session 10: chain-kernel retry after the scoped-vmem cap
(flow_chain.py now raises vmem_limit_bytes to 64 MB, matching the
flow_stack backward — the fix session 9 applied but never measured),
plus a loop-default smoke check that `auto` now resolves student
training to mega_train end to end.

Back-to-back in one process:
  1. student gen: mega_glue reference, then fused chain (student_iaf)
  2. chain at config[4] (large_student_sharded) sizes
On failure, dump the FULL compile error (session 9 truncated it).
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
    scfg = get_config("student_iaf")

    try:
        ms, xrt = gen_ms(scfg, "auto", 8, 2.0)
        emit("student_gen", backend="mega_glue", call_ms=round(ms, 2),
             x_realtime=round(xrt, 1))
    except Exception as e:
        emit("student_gen", backend="mega_glue", error=repr(e)[:300])

    try:
        ms, xrt = chain_gen_ms(scfg, 8, 2.0)
        emit("student_gen", backend="chain", call_ms=round(ms, 2),
             x_realtime=round(xrt, 1))
    except Exception:
        emit("student_gen", backend="chain", error="see traceback")
        traceback.print_exc()

    try:
        ms, xrt = chain_gen_ms(get_config("large_student_sharded"), 8, 2.0)
        emit("config4_gen", mode="chain", call_ms=round(ms, 2),
             x_realtime=round(xrt, 1))
    except Exception:
        emit("config4_gen", mode="chain", error="see traceback")
        traceback.print_exc()

    emit("done")


if __name__ == "__main__":
    main()
