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


def tp_param_specs(params: Any, model_axis_size: int) -> Any:
    """PartitionSpec pytree (same structure as ``params``) sharding ResNet
    and attention interiors over the mesh "model" axis.

    ``model_axis_size`` is ``mesh.shape["model"]``; with size 1 everything
    is replicated (the specs degenerate to P()).
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
        return _REPL

    return walk(params)


def tp_shard_params(params: Any, mesh: Mesh) -> Any:
    """Device-put ``params`` with Megatron TP over the mesh "model" axis
    (and replication over "data")."""
    specs = tp_param_specs(params, mesh.shape["model"])
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs)
