"""Optimizer / train-state plumbing shared by teacher training and
distillation.

Reference parity: the reference's optimizer lived inside tensorpack's
`ModelDesc._get_optimizer` (Adam with fixed lr) [R].  Here: optax Adam with
exponential-decay schedule + global-norm clipping, wrapped in a flax
TrainState, with a threaded rng key for the stochastic losses.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import struct
from flax.training import train_state

from pwn_tpu.config import TrainConfig


class TrainState(train_state.TrainState):
    """flax TrainState + the per-step rng key (distillation sampling)."""

    rng: jax.Array = struct.field(pytree_node=True, default=None)


def make_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    schedule = optax.exponential_decay(
        init_value=cfg.learning_rate,
        transition_steps=cfg.lr_decay_steps,
        decay_rate=cfg.lr_decay_rate,
        staircase=False,
    )
    return optax.chain(
        optax.clip_by_global_norm(cfg.grad_clip_norm),
        optax.adam(schedule, b1=cfg.adam_b1, b2=cfg.adam_b2),
    )


def create_train_state(
    params: Any, cfg: TrainConfig, apply_fn=None, rng: jax.Array | None = None
) -> TrainState:
    return TrainState.create(
        apply_fn=apply_fn or (lambda *a, **k: None),
        params=params,
        tx=make_optimizer(cfg),
        rng=rng if rng is not None else jax.random.PRNGKey(cfg.seed),
    )


def global_norm(tree: Any) -> jax.Array:
    return jnp.sqrt(
        sum(jnp.sum(jnp.square(x.astype(jnp.float32)))
            for x in jax.tree.leaves(tree))
    )
