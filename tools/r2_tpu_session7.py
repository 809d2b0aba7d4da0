"""Round-2 TPU session 7: bisect the shallow-stack backward-kernel
Mosaic crash.  Known: L=24 block-cyclic dilations (teacher) compiles at
(Lc=12, bb=2); L=10/12 crashes at every (Lc, bb).  Probe L and the
dilation schedule independently, teacher-sanity first.
"""

import json
import sys

import jax

from tools.r2_tpu_session5 import mk_args
import numpy as np
import jax.numpy as jnp
import pwn_tpu.ops.pallas.flow_stack as fs


def emit(tag, **kw):
    print(json.dumps({"tag": tag, **kw}), flush=True)


def grad_probe(dilations):
    args = mk_args(len(dilations))

    def loss(x0, cond, w_in, b_g, w_out, b_rs):
        s = fs.fused_flow_stack_train(x0, cond, w_in, b_g, w_out, b_rs,
                                      dilations=tuple(dilations))
        return jnp.sum(s.astype(jnp.float32) ** 2)

    g = jax.jit(jax.grad(loss, argnums=(0, 2)))(*args)
    return float(np.asarray(g[0].astype(jnp.float32)).sum())


def block_dils(L):
    return tuple(2 ** (i % 8) for i in range(L))


def main():
    emit("device", kind=str(jax.devices()[0]))
    probes = [
        ("L24_block", block_dils(24)),
        ("L24_doubling_cap128",
         tuple(min(2 ** i, 128) for i in range(24))),
        ("L20_block", block_dils(20)),
        ("L16_block", block_dils(16)),
        ("L12_block", block_dils(12)),
        ("L10_block", block_dils(10)),
        ("L10_student", tuple(2 ** i for i in range(10))),
    ]
    for name, dils in probes:
        try:
            v = grad_probe(dils)
            emit("probe", case=name, ok=True, checksum=round(v, 3))
        except Exception as e:
            err = repr(e)
            short = ("HTTP 500" if "HTTP 500" in err else err[:200])
            emit("probe", case=name, ok=False, error=short)

    emit("done")
    return 0


if __name__ == "__main__":
    sys.exit(main())
