"""Shared plumbing for the on-device sampling loops (ancestral / DDIM /
DPM-Solver++): batch sharding over the mesh's data axis, the x_T draw, and
the hint compute-dtype cast.  One implementation so the three samplers'
sharding/RNG contract is provably identical (they are pinned bit-identical
to single-device execution by the sharding tests)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def batch_sharding(mesh, shape: tuple[int, ...]):
    """Validate batch divisibility and return the data-axis NamedSharding
    (None when ``mesh`` is None — single-device sampling)."""
    if mesh is None:
        return None
    n_data = mesh.shape.get("data", 1)
    assert shape[0] % n_data == 0, (
        f"batch {shape[0]} not divisible by mesh data axis {n_data}; "
        f"pad the request (cli.put_batch pads training batches the same way)")
    from jax.sharding import NamedSharding, PartitionSpec

    return NamedSharding(mesh, PartitionSpec("data"))


def draw_x_start(key, shape: tuple[int, ...], batch_sh, hint):
    """Split the sampler key, draw x_T ~ N(0, 1), and constrain x_T plus
    every hint leaf to the batch sharding.  Returns (x_T, step_key, hint).

    The split discipline (x_T from the FIRST subkey) is shared by all
    samplers, so the same key yields the same x_T under every solver —
    the cross-solver equivalence tests rely on this."""
    k0, key = jax.random.split(key)
    xt = jax.random.normal(k0, shape, jnp.float32)
    if batch_sh is not None:
        xt = jax.lax.with_sharding_constraint(xt, batch_sh)
        if hint is not None:
            # hint may be a pytree (e.g. hoisted ControlNet hint feature
            # maps); every leaf is batch-leading
            hint = jax.tree.map(
                lambda h: jax.lax.with_sharding_constraint(h, batch_sh), hint)
    return xt, key, hint


def cast_hint(hint, compute_dtype):
    """Cast every hint leaf to the model compute dtype (no-op when either
    is None)."""
    if hint is None or compute_dtype is None:
        return hint
    return jax.tree.map(lambda h: h.astype(compute_dtype), hint)
