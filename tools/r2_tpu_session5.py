"""Round-2 TPU session 5: fine-grained isolation of the Mosaic
remote-compile HTTP-500 on the student-stack train kernels + the chain
kernel (sessions 1/3/4).

Facts so far: teacher mega_train (L=24 -> chunk Lc=12, bb=2) compiles
and runs (18.2 ms/step); flow_stack forward at L=10 compiles (1362x
student gen); the train fwd+bwd at L=10 and the new flow_chain kernel
both 500.  Session 4 suggests the first failure may wedge the helper
for the remainder of a process, so ORDER matters: this session runs the
most informative single compile first and prints FULL error text.

Order:
  1. fused_flow_stack_train fwd-only, L=10 (isolates the fwd-save kernel)
  2. grad, L=12 (teacher-like chunk divisor at student depth)
  3. grad, L=10 (the failing case)
  4. grad, L=10 with forced (Lc=5, bb=2) chunk layout
  5. chain kernel, student_iaf
"""

import json
import sys

import jax
import jax.numpy as jnp
import numpy as np

import pwn_tpu.ops.pallas.flow_stack as fs
from pwn_tpu.config import get_config
from tools.r2_tpu_session3 import chain_gen_ms


def emit(tag, **kw):
    print(json.dumps({"tag": tag, **kw}), flush=True)


def mk_args(L, B=8, T=16384, C=64, M=80, G=128, S=64):
    rng = np.random.default_rng(0)
    dt = jnp.bfloat16
    return (
        jnp.asarray(rng.standard_normal((B, T, C)), dt),
        jnp.asarray(rng.standard_normal((B, T, M)), dt),
        jnp.asarray(rng.standard_normal((L, 2 * C + M, G)) * 0.05, dt),
        jnp.zeros((L, G), jnp.float32),
        jnp.asarray(rng.standard_normal((L, G // 2, C + S)) * 0.05, dt),
        jnp.zeros((L, C + S), jnp.float32),
    )


def dils_for(L, dmax=128):
    return tuple(min(2 ** i, dmax) for i in range(L))


def fwd_only(L):
    args = mk_args(L)

    @jax.jit
    def f(*a):
        return fs.fused_flow_stack_train(
            *a, dilations=dils_for(L)
        ).astype(jnp.float32).sum()

    return float(np.asarray(f(*args)))


def grad_run(L):
    args = mk_args(L)

    def loss(x0, cond, w_in, b_g, w_out, b_rs):
        s = fs.fused_flow_stack_train(x0, cond, w_in, b_g, w_out, b_rs,
                                      dilations=dils_for(L))
        return jnp.sum(s.astype(jnp.float32) ** 2)

    g = jax.jit(jax.grad(loss, argnums=(0, 2)))(*args)
    return float(np.asarray(g[0].astype(jnp.float32)).sum())


def main():
    emit("device", kind=str(jax.devices()[0]))

    steps = [
        ("fwd_only_L10", lambda: fwd_only(10)),
        ("grad_L12", lambda: grad_run(12)),
        ("grad_L10", lambda: grad_run(10)),
    ]
    for name, fn in steps:
        try:
            v = fn()
            emit("isolate", case=name, ok=True, checksum=round(v, 3))
        except Exception as e:
            emit("isolate", case=name, ok=False, error=repr(e)[:2000])

    # forced chunk layout for L=10
    orig = fs._bwd_chunk_layout
    fs._bwd_chunk_layout = lambda *a, **k: (5, 2)
    try:
        v = grad_run(10)
        emit("isolate", case="grad_L10_Lc5", ok=True,
             checksum=round(v, 3))
    except Exception as e:
        emit("isolate", case="grad_L10_Lc5", ok=False,
             error=repr(e)[:2000])
    finally:
        fs._bwd_chunk_layout = orig

    try:
        ms, xrt = chain_gen_ms(get_config("student_iaf"), 8, 2.0)
        emit("student_gen", backend="chain", call_ms=round(ms, 2),
             x_realtime=round(xrt, 1))
    except Exception as e:
        emit("student_gen", backend="chain", error=repr(e)[:2000])

    emit("done")
    return 0


if __name__ == "__main__":
    sys.exit(main())
