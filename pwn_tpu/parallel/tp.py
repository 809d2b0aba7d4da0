"""Tensor-parallel sharding of the dilated residual stack (layer T1,
BASELINE config[4] "stack sharded across chips"; SURVEY.md §2c TP row).

Strategy: shard the GATE channel dimension G of every gated residual
layer across the `model` mesh axis.

    w_dilated (2, C, G)  -> P(None, None, "model")   column-parallel
    w_cond    (M, G)     -> P(None, "model")         column-parallel
    b_dilated, b_cond    -> P("model")
    w_res     (G/2, C)   -> P("model", None)         row-parallel
    w_skip    (G/2, S)   -> P("model", None)         row-parallel

The gate computation is then column-parallel (each chip owns G/n gate
channels), and the res/skip projections are row-parallel: XLA inserts exactly one psum per layer
(for the z @ W_res/W_skip contraction) riding the ICI — the Megatron
pattern expressed purely through sharding annotations, per the
"pick a mesh, annotate, let XLA insert collectives" recipe.

Gate-split correctness: `z = tanh(g[:G/2]) * sigmoid(g[G/2:])` splits
G in half BEFORE any cross-chip movement, and GSPMD shards each half
over `model` independently — the gate stays elementwise-local as long
as (G/2) % model == 0, asserted by `validate_tp`.

Everything else (front/head 1x1s, upsampler, MoL head) is replicated
(the conditioning network stays replicated per the north star).

The fused Pallas path cannot be auto-partitioned by GSPMD, so TP configs
run the XLA layer path (`fused_layers="off"` — large_student_sharded
preset).
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_GATE_SPECS = {
    "w_dilated": P(None, None, "model"),
    "b_dilated": P("model"),
    "w_cond": P(None, "model"),
    "b_cond": P("model"),
    "w_res": P("model", None),
    "w_skip": P("model", None),
}


def param_spec(path) -> P:
    """PartitionSpec for one param leaf, keyed by its trailing name."""
    names = [getattr(k, "key", getattr(k, "name", str(k))) for k in path]
    leaf = names[-1] if names else ""
    if leaf in _GATE_SPECS and any(
        str(n).startswith("layer_") for n in names
    ):
        return _GATE_SPECS[leaf]
    return P()


def state_shardings(state: Any, mesh: Mesh):
    """NamedShardings for a full TrainState (params + optimizer mirrors).

    The optimizer state (adam mu/nu) mirrors the param tree structure, so
    the same trailing-name rule applies to it automatically.
    """

    def leaf_sharding(path, leaf):
        if hasattr(leaf, "shape") and getattr(leaf, "ndim", 0) > 0:
            return NamedSharding(mesh, param_spec(path))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(leaf_sharding, state)


def validate_tp(gate_channels: int, mesh: Mesh) -> None:
    n = mesh.shape["model"]
    if n > 1 and (gate_channels // 2) % n:
        raise ValueError(
            f"gate_channels/2 = {gate_channels // 2} must divide over "
            f"model axis {n}"
        )


def shard_state(state: Any, mesh: Mesh):
    """Place an (unsharded) TrainState onto the mesh per the TP rules."""
    return jax.device_put(state, state_shardings(state, mesh))
