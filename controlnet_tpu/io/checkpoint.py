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
import shutil
import sys
import threading
from typing import Any

import jax
import jax.numpy as jnp
import orbax.checkpoint as ocp

# Persistent async checkpointers, one per checkpoint root.  A
# StandardCheckpointer is an AsyncCheckpointer: ``save`` returns once the
# host snapshot is taken and streams to disk on a background thread.  The
# previous per-call ``with StandardCheckpointer() as c`` pattern joined that
# thread on context exit, so every save blocked the training loop for the
# full disk write (measured 73s/save for the 190M-param LDM ControlNet
# train state on this host — docs/artifacts/tpu_soak.json).  Keyed per root
# because orbax serializes saves *within* one checkpointer (`save` first
# waits for that instance's previous write): trainers that save two names
# back-to-back (train_vae's vae+disc, DMD's latest+best) would otherwise
# stall on the first write anyway.
_CKPTRS: dict[str, ocp.StandardCheckpointer] = {}


def _close_all() -> None:  # join in-flight writes at process exit
    for c in _CKPTRS.values():
        c.close()


def _checkpointer(root: str) -> ocp.StandardCheckpointer:
    if root not in _CKPTRS:
        if not _CKPTRS:
            atexit.register(_close_all)
        _CKPTRS[root] = ocp.StandardCheckpointer()
    return _CKPTRS[root]


# Background-save worker threads (save_checkpoint_background).  Bounded by
# construction: a new background save first joins the previous one for the
# same root, so at most one D2H+write per root is in flight.
_BG_THREADS: dict[str, threading.Thread] = {}
_BG_ERRORS: list[BaseException] = []


def _spawn_root_worker(root: str, fn, desc: str) -> threading.Thread:
    """Run ``fn`` on a worker thread serialized per checkpoint root: the
    worker first joins the previous worker for the same root, so background
    work (D2H+write, post-commit pruning) never interleaves within a root.
    Failures are logged immediately and re-raised by
    :func:`wait_for_checkpoints`."""
    prev = _BG_THREADS.get(root)

    def work():
        try:
            if prev is not None:
                prev.join()
            fn()
        except BaseException as e:
            # Log NOW (an abnormal exit may never reach the trainer's final
            # wait_for_checkpoints, and the error must not die with it),
            # then queue for wait_for_checkpoints to re-raise.
            print(f"[checkpoint] background {desc} FAILED: {e!r}",
                  file=sys.stderr, flush=True)
            _BG_ERRORS.append(e)

    t = threading.Thread(target=work, name=f"ckpt-bg-{os.path.basename(root)}",
                         daemon=False)
    _BG_THREADS[root] = t
    t.start()
    return t


def wait_for_checkpoints() -> None:
    """Block until every in-flight async save has committed to disk."""
    for t in list(_BG_THREADS.values()):
        t.join()
    for c in _CKPTRS.values():
        c.wait_until_finished()
    if _BG_ERRORS:
        errs = _BG_ERRORS[:]
        _BG_ERRORS.clear()
        raise RuntimeError(
            f"{len(errs)} background checkpoint save(s) failed: "
            + "; ".join(repr(e) for e in errs)) from errs[0]


def _ckpt_root(ckpt_dir: str, name: str) -> str:
    name = name[:-4] if name.endswith(".pth") else name
    return os.path.abspath(os.path.join(ckpt_dir, name))


def prune_checkpoints(ckpt_dir: str, name: str, max_to_keep: int | None) -> list[int]:
    """Delete all but the newest ``max_to_keep`` step directories under
    <ckpt_dir>/<name>.  Returns the pruned step numbers.

    Retention is per checkpoint NAME (= per root), so best-model
    checkpoints saved under their own name (e.g. the DMD trainer's
    ``dmd_best``) are never displaced by the rolling latest-step policy —
    that root keeps its own newest ``max_to_keep`` bests.

    ``max_to_keep`` of None or <= 0 keeps everything (pre-round-5
    behavior).  Callers must ensure no in-flight write targets the pruned
    steps; the save functions below only prune after their own write has
    committed, and orbax serializes writes within a root, so the surviving
    (newest) steps are always the complete ones.
    """
    root = _ckpt_root(ckpt_dir, name)
    if max_to_keep is None or max_to_keep <= 0 or not os.path.isdir(root):
        return []
    steps = sorted(int(d) for d in os.listdir(root) if re.fullmatch(r"\d+", d)
                   and os.path.isdir(os.path.join(root, d)))
    pruned = steps[:-max_to_keep]
    for s in pruned:
        shutil.rmtree(os.path.join(root, str(s)), ignore_errors=True)
    return pruned


def save_checkpoint(ckpt_dir: str, name: str, step: int, tree: Any,
                    block: bool = True, max_to_keep: int | None = None) -> str:
    """Save a pytree at <ckpt_dir>/<name>/<step>. Returns the path.

    ``block=False`` returns as soon as the host snapshot is taken and lets
    the serialize+write run on a background thread, so the device pipeline
    keeps training through the save (orbax serializes overlapping saves
    internally).  Call :func:`wait_for_checkpoints` (or let process exit do
    it) before reading the checkpoint back.

    ``max_to_keep`` bounds disk usage by pruning older steps of THIS name
    after the save commits (the reference overwrote a single file,
    tools/train_ddpm.py:96 — here retention is a policy instead).  With
    ``block=False`` pruning must still wait for the write, making the call
    blocking; prefer :func:`save_checkpoint_background`, which prunes on
    its worker thread.
    """
    root = _ckpt_root(ckpt_dir, name)
    os.makedirs(root, exist_ok=True)
    path = os.path.join(root, str(step))
    ckptr = _checkpointer(root)
    ckptr.save(path, tree, force=True)
    if block or max_to_keep:
        ckptr.wait_until_finished()
    if max_to_keep and jax.process_index() == 0:
        # An in-flight save_checkpoint_background for the same root may not
        # have issued its orbax write yet (it could still be mid device_get),
        # so wait_until_finished above can miss it: pruning now would keep
        # only the newest steps on disk and then the background step would
        # commit afterward, exceeding max_to_keep with a stale step.  Join
        # the root's worker first so retention holds even when the two save
        # APIs are mixed on one root.
        bg = _BG_THREADS.get(root)
        if bg is not None and bg is not threading.current_thread():
            bg.join()
            ckptr.wait_until_finished()
        prune_checkpoints(ckpt_dir, name, max_to_keep)
    return path


@jax.jit
def _snapshot_arrays(xs: list) -> list:
    """HBM->HBM copies of a list of arrays, as one compiled program (the
    copies free the originals for donation by subsequent train steps)."""
    return [jnp.copy(x) for x in xs]


def save_checkpoint_background(ckpt_dir: str, name: str, step: int, tree: Any,
                               max_to_keep: int | None = None) -> str:
    """Save with the device->host snapshot ALSO off the training thread.

    ``save_checkpoint(block=False)`` already overlaps the disk write, but
    orbax's ``save`` still performs the full D2H copy synchronously — for
    the 2.3GB LDM ControlNet train state through this host's tunnel that is
    a measured 28-44s training stall per save
    (docs/artifacts/tpu_soak_resume.json; VERDICT r3 weak #6).  Here the
    training thread only pays for an on-device (HBM->HBM) copy of the state
    — O(ms) — so the live buffers can keep being donated by subsequent
    steps; a worker thread then streams the copy device->host and hands it
    to orbax, all concurrent with training dispatch.

    Cost: one extra train-state copy in HBM until the D2H completes.
    Ordering: a second background save for the same root joins the previous
    one first (saves never interleave within a root).  Call
    :func:`wait_for_checkpoints` before restoring or at shutdown; worker
    failures surface there.
    """
    if jax.process_count() > 1:
        # Multi-host arrays are not fully addressable from one process, so
        # the worker's device_get would fail; use orbax's own multi-host
        # async path instead (D2H blocking, write overlapped).  Retention
        # must NOT ride save_checkpoint's max_to_keep here — that path
        # waits for the write before pruning, which would silently turn
        # every background save fully blocking.  Instead prune on a worker
        # thread that joins the async write first (same commit-then-prune
        # ordering, off the training thread).
        path = save_checkpoint(ckpt_dir, name, step, tree, block=False)
        if max_to_keep and jax.process_index() == 0:
            root = _ckpt_root(ckpt_dir, name)
            ckptr = _checkpointer(root)

            def prune_after_commit():
                ckptr.wait_until_finished()
                prune_checkpoints(ckpt_dir, name, max_to_keep)

            _spawn_root_worker(root, prune_after_commit,
                               desc=f"prune after {path}")
        return path
    root = _ckpt_root(ckpt_dir, name)
    os.makedirs(root, exist_ok=True)
    path = os.path.join(root, str(step))
    # On-device snapshot as ONE jitted program.  A per-leaf jnp.copy
    # compiles one remote executable per unique (shape, dtype) — measured
    # 22-24 s of tunnel compile round-trips on the FIRST save of the LDM /
    # VAE-GAN train states (docs/artifacts/tpu_soak{_vae,}_r4 logs); a
    # single program holding every copy op compiles once, in seconds.
    # Non-array leaves (python ints in train states) pass through.
    leaves, treedef = jax.tree.flatten(tree)
    idx = [i for i, x in enumerate(leaves) if isinstance(x, jax.Array)]
    if idx:
        try:
            copies = _snapshot_arrays([leaves[i] for i in idx])
        except ValueError:
            # Leaves committed to incompatible device sets (e.g. two states
            # on different meshes saved as one tree) cannot share one jitted
            # program — copy per leaf instead (each jnp.copy compile is
            # cached per (shape, dtype), so only the first such save pays).
            copies = [jnp.copy(leaves[i]) for i in idx]
        for i, c in zip(idx, copies):
            leaves[i] = c
    snap = jax.tree.unflatten(treedef, leaves)
    ckptr = _checkpointer(root)  # created on the main thread

    def save_then_prune():
        host = jax.device_get(snap)  # D2H streams while training runs
        ckptr.save(path, host, force=True)
        if max_to_keep:
            # prune only after THIS write committed (orbax serializes
            # writes within a root, so everything newer than the pruned
            # steps is on disk and complete) — the wait runs on this
            # worker thread, never stalling training
            ckptr.wait_until_finished()
            prune_checkpoints(ckpt_dir, name, max_to_keep)

    _spawn_root_worker(root, save_then_prune, desc=f"save of {path}")
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
    root = _ckpt_root(ckpt_dir, name)
    abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, target)
    tree = _checkpointer(root).restore(os.path.join(root, str(step)), abstract)
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
    root = _ckpt_root(ckpt_dir, name)
    tree = _checkpointer(root).restore(os.path.join(root, str(step)))
    return tree, step
