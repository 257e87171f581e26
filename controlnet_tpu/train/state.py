"""Train state: one pytree carrying params + optimizer state + step.

Donated through every jitted train step (in-place buffer reuse on TPU), and
checkpointed whole via io/checkpoint.py — restoring resumes the optimizer
exactly (the reference never restores optimizer state, SURVEY.md §5.4)."""

from __future__ import annotations

from typing import Any, NamedTuple

import jax.numpy as jnp
import optax


class TrainState(NamedTuple):
    step: jnp.ndarray  # scalar int32
    params: Any
    opt_state: Any


def create_train_state(params: Any, tx: optax.GradientTransformation) -> TrainState:
    return TrainState(step=jnp.zeros((), jnp.int32), params=params, opt_state=tx.init(params))
