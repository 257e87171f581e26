"""Device mesh + sharding helpers.

The reference has no distributed code at all (SURVEY.md §2.9) — this is
additive TPU-native capability.  Strategy (sized for these O(100M)-param
UNets, per SURVEY.md §2.9/§5.7-5.8):

* a ``Mesh`` with a ``data`` axis (and an optional ``model`` axis kept for
  headroom — attention heads / channel sharding — but 1 by default);
* batch dims sharded over ``data`` (NamedSharding(P("data"))), parameters
  replicated; pjit inserts the gradient all-reduce over ICI automatically;
* multi-host: ``jax.distributed.initialize()`` + per-host data slices feed
  ``jax.make_array_from_process_local_data``.

Tensor parallelism lives in parallel/tp.py (Megatron-style param sharding
over the "model" axis, annotation-only — XLA inserts the psums); it is
off by default because these models fit on one chip with room to spare
(SURVEY.md §5.7) — data parallelism is the deployment answer, TP the
headroom for larger-than-chip variants and latency-bound serving.
PP/SP remain out-of-scope per SURVEY.md §5.7 (<=1024-token attention,
shallow model) rather than built as dead code.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    devices: Sequence[jax.Device] | None = None,
    model_parallel: int = 1,
) -> Mesh:
    """Mesh over all (or given) devices: ("data", "model").

    ``model_parallel`` devices on the model axis; the rest on data. The
    default (1) is pure data parallelism — correct for every model family
    in this framework.
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    assert n % model_parallel == 0, f"{n} devices not divisible by model_parallel={model_parallel}"
    arr = np.asarray(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(arr, ("data", "model"))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Batch-dim sharding: leading axis split over the data axis."""
    return NamedSharding(mesh, P("data"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Any, mesh: Mesh) -> Any:
    """Device-put a (tree of) host array(s) with the batch axis sharded over
    the data axis."""
    sh = data_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


def replicate(tree: Any, mesh: Mesh) -> Any:
    """Device-put a pytree fully replicated across the mesh."""
    sh = replicated_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)


def shard_host_local_batch(batch: Any, mesh: Mesh) -> Any:
    """Multi-host batch assembly: each process contributes its local shard
    of the global batch (leading axis), producing one global sharded array.

    Single-host this reduces to ``shard_batch``; multi-host it is the
    jax.distributed pattern — every host loads a disjoint slice and
    ``make_array_from_process_local_data`` stitches the global array without
    any cross-host copy of the full batch."""
    sh = data_sharding(mesh)
    if jax.process_count() == 1:
        return shard_batch(batch, mesh)
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(sh, np.asarray(x)), batch
    )
