"""Round-2 TPU session 4: (a) fused flow-chain kernel A/B after the
(8,128) block-tiling fix; (b) isolate the student mega_train Mosaic
HTTP-500: the student stack's max dilation (512) equals the time tile —
the one structural difference from the teacher stack (max 128) that
compiles fine — by compiling the train fwd+bwd at both dilation sets on
otherwise-identical shapes; (c) retry the full student step if (b)
passes.
"""

import json
import sys

import jax
import jax.numpy as jnp
import numpy as np

from pwn_tpu.benchmarks import _time_chain, measure_round_trip_ms
from pwn_tpu.config import get_config
from pwn_tpu.ops.pallas.flow_stack import fused_flow_stack_train
from tools.r2_tpu_session1 import gen_ms, student_direct_step_ms
from tools.r2_tpu_session3 import chain_gen_ms


def emit(tag, **kw):
    print(json.dumps({"tag": tag, **kw}), flush=True)


def train_grad_compiles(dilations, B=8, T=16384, C=64, M=80, G=128,
                        S=64):
    L = len(dilations)
    rng = np.random.default_rng(0)
    dt = jnp.bfloat16
    args = (
        jnp.asarray(rng.standard_normal((B, T, C)), dt),
        jnp.asarray(rng.standard_normal((B, T, M)), dt),
        jnp.asarray(rng.standard_normal((L, 2 * C + M, G)) * 0.05, dt),
        jnp.zeros((L, G), jnp.float32),
        jnp.asarray(rng.standard_normal((L, G // 2, C + S)) * 0.05, dt),
        jnp.zeros((L, C + S), jnp.float32),
    )

    def loss(x0, cond, w_in, b_g, w_out, b_rs):
        s = fused_flow_stack_train(x0, cond, w_in, b_g, w_out, b_rs,
                                   dilations=tuple(dilations))
        return jnp.sum(s.astype(jnp.float32) ** 2)

    g = jax.jit(jax.grad(loss, argnums=(0, 2)))(*args)
    # force execution
    return float(np.asarray(g[0].astype(jnp.float32)).sum())


def main():
    emit("device", kind=str(jax.devices()[0]))

    # ---- (a) chain kernel A/B ----
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
    except Exception as e:
        emit("student_gen", backend="chain", error=repr(e)[:300])
    try:
        ms, xrt = chain_gen_ms(get_config("large_student_sharded"), 8,
                               2.0)
        emit("config4_gen", mode="chain", call_ms=round(ms, 2),
             x_realtime=round(xrt, 1))
    except Exception as e:
        emit("config4_gen", mode="chain", error=repr(e)[:300])

    # ---- (b) mega_train dilation isolation ----
    dsets = {
        "max128_L10": (1, 2, 4, 8, 16, 32, 64, 128, 128, 128),
        "max256_L10": (1, 2, 4, 8, 16, 32, 64, 128, 256, 256),
        "max512_L10": (1, 2, 4, 8, 16, 32, 64, 128, 256, 512),
    }
    for name, dils in dsets.items():
        try:
            v = train_grad_compiles(dils)
            emit("train_grad", dils=name, ok=True, checksum=round(v, 3))
        except Exception as e:
            emit("train_grad", dils=name, ok=False, error=repr(e)[:300])

    # ---- (c) full student step retry (only meaningful if (b) passed) ----
    for mode in ("off", "mega_train"):
        try:
            ms = student_direct_step_ms(scfg, mode)
            emit("student_direct", mode=mode, step_ms=round(ms, 2))
        except Exception as e:
            emit("student_direct", mode=mode, error=repr(e)[:300])

    emit("done")
    return 0


if __name__ == "__main__":
    sys.exit(main())
