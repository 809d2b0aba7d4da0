"""Round-2 TPU session 8: one-compile-per-process isolation of the
student-stack backward Mosaic HTTP-500 (sessions 3-7).

Learned so far: the real teacher train path (C=128, G=256, S=128, L=24,
max d=128 -> 3 backward chunks) compiles; EVERY probe so far used
student widths (C=64, G=128, S=64) and failed at every (Lc, bb), while
the forward-save kernel at the same widths compiles.  This session
varies ONE dim at a time, each case in a fresh process (session-4
evidence suggests a failed compile can wedge the helper within a
process), and dumps the FULL error body (earlier probes truncated it).

Usage: python tools/r2_tpu_session8.py <case_name>
Cases print one JSON line; full failure text goes to
/tmp/s8_<case>.err.
"""

import json
import sys

import jax
import jax.numpy as jnp
import numpy as np

import pwn_tpu.ops.pallas.flow_stack as fs

B, T, M = 8, 4096, 80


def mk(L, C, G, S):
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


def grad_probe(dils, C, G, S, force_layout=None):
    if force_layout is not None:
        fs._bwd_chunk_layout = lambda *a, **k: force_layout
    args = mk(len(dils), C, G, S)

    def loss(x0, cond, w_in, b_g, w_out, b_rs):
        s = fs.fused_flow_stack_train(
            x0, cond, w_in, b_g, w_out, b_rs, dilations=tuple(dils)
        )
        return jnp.sum(s.astype(jnp.float32) ** 2)

    g = jax.jit(jax.grad(loss, argnums=(0, 2)))(*args)
    return float(np.asarray(g[0].astype(jnp.float32)).sum())


D512 = tuple(2 ** i for i in range(10))          # student schedule
D128 = tuple(min(2 ** i, 128) for i in range(10))  # capped at 128

CASES = {
    # name: (dils, C, G, S, force_layout)
    "student_exact":      (D512, 64, 128, 64, None),
    "student_d128":       (D128, 64, 128, 64, None),
    "teacher_dims_d128":  (D128, 128, 256, 128, None),
    "teacher_dims_d512":  (D512, 128, 256, 128, None),
    "student_G256":       (D512, 64, 256, 64, None),
    "student_S128":       (D512, 64, 128, 128, None),
    "student_C128":       (D512, 128, 128, 64, None),
    "student_Lc1":        (D512, 64, 128, 64, (1, 8)),
    "student_d128_Lc1":   (D128, 64, 128, 64, (1, 8)),
}


def main():
    name = sys.argv[1]
    dils, C, G, S, layout = CASES[name]
    dev = str(jax.devices()[0])
    try:
        v = grad_probe(dils, C, G, S, force_layout=layout)
        print(json.dumps({"case": name, "ok": True, "dev": dev,
                          "checksum": round(v, 3)}), flush=True)
    except Exception as e:
        full = f"{type(e).__name__}: {e}"
        with open(f"/tmp/s8_{name}.err", "w") as f:
            f.write(full)
        print(json.dumps({"case": name, "ok": False, "dev": dev,
                          "err_file": f"/tmp/s8_{name}.err",
                          "err_head": full[:120]}), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
