"""Checkpointing: orbax-backed, step-numbered, full-train-state.

Upgrades over the reference's ad-hoc per-epoch ``torch.save`` overwrite with
no optimizer restore (SURVEY.md §5.4; e.g. tools/train_ddpm.py:96,62-65):

* step-numbered directories ``<ckpt_dir>/<name>/<step>`` with auto-resume
  from the latest step;
* the whole train state (params + optimizer state + step + EMA trees) saves
  and restores as one pytree;
* works on every backend (orbax uses Tensorstore/OCDBT under the hood).

Layout keeps the reference's output-tree convention: checkpoints live under
``<task_name>/`` with the YAML-configured ckpt name (minus ``.pth``).
"""

from __future__ import annotations

import atexit
import os
import re
from typing import Any

import jax
import orbax.checkpoint as ocp

# One persistent async checkpointer for the process.  StandardCheckpointer
# is an AsyncCheckpointer: ``save`` returns once the device→host snapshot is
# taken and streams to disk on a background thread.  The previous
# per-call ``with StandardCheckpointer() as c`` pattern joined that thread on
# context exit, so every save blocked the training loop for the full disk
# write (measured 73s/save for the 190M-param LDM ControlNet train state on
# this host — docs/artifacts/tpu_soak.json).
_CKPTR: ocp.StandardCheckpointer | None = None


def _checkpointer() -> ocp.StandardCheckpointer:
    global _CKPTR
    if _CKPTR is None:
        _CKPTR = ocp.StandardCheckpointer()
        atexit.register(_CKPTR.close)  # join in-flight writes at exit
    return _CKPTR


def wait_for_checkpoints() -> None:
    """Block until every in-flight async save has committed to disk."""
    if _CKPTR is not None:
        _CKPTR.wait_until_finished()


def _ckpt_root(ckpt_dir: str, name: str) -> str:
    name = name[:-4] if name.endswith(".pth") else name
    return os.path.abspath(os.path.join(ckpt_dir, name))


def save_checkpoint(ckpt_dir: str, name: str, step: int, tree: Any,
                    block: bool = True) -> str:
    """Save a pytree at <ckpt_dir>/<name>/<step>. Returns the path.

    ``block=False`` returns as soon as the host snapshot is taken and lets
    the serialize+write run on a background thread, so the device pipeline
    keeps training through the save (orbax serializes overlapping saves
    internally).  Call :func:`wait_for_checkpoints` (or let process exit do
    it) before reading the checkpoint back.
    """
    root = _ckpt_root(ckpt_dir, name)
    os.makedirs(root, exist_ok=True)
    path = os.path.join(root, str(step))
    ckptr = _checkpointer()
    ckptr.save(path, tree, force=True)
    if block:
        ckptr.wait_until_finished()
    return path


def latest_checkpoint(ckpt_dir: str, name: str) -> int | None:
    """Latest saved step, or None."""
    root = _ckpt_root(ckpt_dir, name)
    if not os.path.isdir(root):
        return None
    steps = [int(d) for d in os.listdir(root) if re.fullmatch(r"\d+", d)
             and os.path.isdir(os.path.join(root, d))]
    return max(steps) if steps else None


def restore_checkpoint(ckpt_dir: str, name: str, target: Any, step: int | None = None) -> tuple[Any, int] | None:
    """Restore the pytree (shaped like ``target``) from the given or latest
    step.  Returns (tree, step) or None if no checkpoint exists."""
    wait_for_checkpoints()  # a pending async save may target/create this step
    if step is None:
        step = latest_checkpoint(ckpt_dir, name)
        if step is None:
            return None
    path = os.path.join(_ckpt_root(ckpt_dir, name), str(step))
    abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, target)
    tree = _checkpointer().restore(path, abstract)
    return tree, step


def restore_checkpoint_raw(ckpt_dir: str, name: str, step: int | None = None) -> tuple[Any, int] | None:
    """Restore with the ON-DISK tree structure (dicts/lists of numpy arrays,
    NamedTuples materialized as dicts) — no template needed.

    Samplers use this to pull just the params subtree out of a train-state
    checkpoint without having to reconstruct the trainer's exact optimizer
    state structure."""
    wait_for_checkpoints()
    if step is None:
        step = latest_checkpoint(ckpt_dir, name)
        if step is None:
            return None
    path = os.path.join(_ckpt_root(ckpt_dir, name), str(step))
    tree = _checkpointer().restore(path)
    return tree, step
