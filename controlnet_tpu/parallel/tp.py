"""Tensor parallelism: Megatron-style param shardings for the UNet family.

The reference has no distributed code at all (SURVEY.md §2.9); data
parallelism over the mesh "data" axis (parallel/mesh.py) is the deployment
answer for these O(100M)-param models.  This module makes the mesh's
"model" axis *real* for the cases where it pays — memory headroom for
larger-than-chip variants and latency-bound batch-1 serving — without
touching any model code: TP here is pure sharding annotation, XLA/GSPMD
inserts the collectives.

The scheme is the textbook pairing (Megatron-LM, arXiv:1909.08053) mapped
onto this package's param grammar (nn/blocks.py):

* ResNet block: ``conv1`` column-parallel (out-channels sharded) →
  ``norm2``/``t_proj`` follow the sharded channel axis → ``conv2``
  row-parallel (in-channels sharded) → one psum, inserted by XLA, at the
  block boundary.  ``skip`` and ``norm1`` stay replicated (they consume the
  replicated block input).
* Attention: ``wq/wk/wv`` column-parallel (head dim sharded), ``wo``
  row-parallel → one psum after the output projection.  Efficient when
  ``num_heads % model_axis == 0``; still *correct* otherwise (GSPMD
  reshards around the head split).
* Everything else (conv_in/out, zero convs, hint encoder, time MLP,
  norms on replicated activations) stays replicated — sharding them would
  trade one HBM-cheap copy for extra collectives.

A block whose channel counts don't divide the model-axis size is left
fully replicated (specs stay consistent as a pair — never column without
its row half).
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_REPL = P()


def _replicate_tree(node: Any) -> Any:
    return jax.tree.map(lambda _: _REPL, node)


def _div(dim: int, n: int) -> bool:
    return n > 1 and dim % n == 0


def _resnet_specs(node: dict, n: int) -> dict:
    """Column-parallel conv1 / row-parallel conv2 iff the hidden channel
    count divides the model axis; replicated otherwise."""
    hidden = node["conv1"]["w"].shape[3]
    if not (_div(hidden, n) and node["conv2"]["w"].shape[2] == hidden):
        return _replicate_tree(node)
    specs = {
        "norm1": _replicate_tree(node["norm1"]),
        "conv1": {"w": P(None, None, None, "model"), "b": P("model")},
        "norm2": {"scale": P("model"), "bias": P("model")},
        "conv2": {"w": P(None, None, "model", None), "b": _REPL},
        "skip": _replicate_tree(node["skip"]),
    }
    if "t_proj" in node:  # output adds onto the sharded hidden channels
        specs["t_proj"] = {"w": P(None, "model"), "b": P("model")}
    for k in node:  # anything this grammar doesn't know stays replicated
        specs.setdefault(k, _replicate_tree(node[k]))
    return specs


def _attention_specs(node: dict, n: int) -> dict:
    d = node["wo"].shape[0]
    if not _div(d, n):
        return _replicate_tree(node)
    specs = {
        "wq": P(None, "model"), "wk": P(None, "model"), "wv": P(None, "model"),
        "bq": P("model"), "bk": P("model"), "bv": P("model"),
        "wo": P("model", None), "bo": _REPL,
    }
    for k in node:
        specs.setdefault(k, _replicate_tree(node[k]))
    return specs


# Leaves smaller than this stay replicated under remainder sharding — a
# weight all-gather per use isn't worth it for kilobyte norms/biases.
_REMAINDER_MIN_BYTES = 1 << 20


def _remainder_spec(leaf: Any, n: int) -> P:
    """FSDP-style weight sharding for leaves the Megatron grammar leaves
    replicated (strided down/up-sample convs, hint-encoder tail, zero convs):
    shard the trailing-most divisible dim.  The activation pattern is
    unchanged — GSPMD all-gathers the weight at use and reduce-scatters its
    gradient, so this is pure memory headroom at the cost of one weight
    collective per use (cheap next to activation traffic at these sizes)."""
    nbytes = int(np.prod(leaf.shape)) * np.dtype(leaf.dtype).itemsize
    if nbytes < _REMAINDER_MIN_BYTES:
        return _REPL
    for axis in range(len(leaf.shape) - 1, -1, -1):
        if leaf.shape[axis] % n == 0 and leaf.shape[axis] >= n:
            return P(*([None] * axis + ["model"]))
    return _REPL


def tp_param_specs(params: Any, model_axis_size: int,
                   shard_remainder: bool = True) -> Any:
    """PartitionSpec pytree (same structure as ``params``) sharding ResNet
    and attention interiors over the mesh "model" axis.

    ``model_axis_size`` is ``mesh.shape["model"]``; with size 1 everything
    is replicated (the specs degenerate to P()).  ``shard_remainder`` adds
    FSDP-style weight sharding for >=1MB leaves outside the Megatron
    grammar (see ``_remainder_spec``) — on the celebhq LDM ControlNet this
    lifts the sharded fraction from 72% to ~97% of param bytes.
    """
    n = model_axis_size

    def walk(node: Any) -> Any:
        if isinstance(node, dict):
            if {"conv1", "conv2", "norm1", "norm2", "skip"} <= node.keys():
                return _resnet_specs(node, n)
            if {"wq", "wk", "wv", "wo"} <= node.keys():
                return _attention_specs(node, n)
            return {k: walk(v) for k, v in node.items()}
        if isinstance(node, (list, tuple)):
            return type(node)(walk(v) for v in node)
        return _remainder_spec(node, n) if (shard_remainder and n > 1) else _REPL

    return walk(params)


def tp_shard_params(params: Any, mesh: Mesh) -> Any:
    """Device-put ``params`` with Megatron TP over the mesh "model" axis
    (and replication over "data").

    Also declares the model-axis size to ``ops.attention`` so attention
    dispatch stays on the XLA path (GSPMD-partitionable einsums) instead of
    an unpartitionable ``pallas_call`` — with TP active the kernel would be
    silently all-gathered and run replicated.

    The declaration is process-global: a NON-TP model used later in the
    same process keeps the XLA path unless ``set_tp_model_axis(1)`` is
    called (such dispatches are counted in
    ``ops.attention.fallback_count()["tp_disabled"]``)."""
    from controlnet_tpu.ops.attention import set_tp_model_axis

    set_tp_model_axis(mesh.shape["model"])
    specs = tp_param_specs(params, mesh.shape["model"])
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs)


def tp_memory_report(params: Any, model_axis_size: int) -> dict:
    """Quantify the TP memory-headroom claim: per-device parameter bytes at
    TP=n vs fully replicated (TP=1).

    Accepts concrete arrays OR ``jax.eval_shape`` ShapeDtypeStructs (so the
    O(100M)-param celebhq config can be measured without allocating it).
    ``sharded_fraction`` is the fraction of total param bytes carrying a
    "model"-axis spec; ``reduction_vs_replicated`` is the per-device byte
    saving (upper bound 1 - 1/n when everything shards).
    """
    specs = tp_param_specs(params, model_axis_size)
    n = model_axis_size
    total = 0
    sharded = 0

    def acc(x, s):
        nonlocal total, sharded
        nbytes = int(np.prod(x.shape)) * np.dtype(x.dtype).itemsize
        total += nbytes
        if s != _REPL:
            sharded += nbytes

    jax.tree.map(acc, params, specs)
    per_device = (total - sharded) + sharded // n
    return {
        "model_axis": n,
        "total_bytes": total,
        "sharded_bytes": sharded,
        "sharded_fraction": sharded / max(total, 1),
        "per_device_bytes": per_device,
        "reduction_vs_replicated": 1.0 - per_device / max(total, 1),
    }
