"""Sharded checkpoint save/restore via orbax.

Strict superset of the reference's checkpointing: the reference only ever
*writes* ``epoch-NNN.pt`` files (train.py:208-217) and has no resume path
(SURVEY §5).  Here every save is a restorable orbax PyTree checkpoint that
round-trips sharded train state across any mesh shape.
"""

from __future__ import annotations

import atexit
import os
from typing import Any, Optional

__all__ = ["save_checkpoint", "restore_checkpoint", "latest_checkpoint",
           "find_resume_checkpoint", "wait_for_checkpoints"]

_CKPTR = None


def _checkpointer():
    """Process-wide AsyncCheckpointer singleton.

    ``StandardCheckpointer`` is an ``AsyncCheckpointer``: ``save`` returns
    once the device arrays are snapshotted to host and commits to disk in a
    background thread, so the next training epoch hides the write.  One
    instance per process keeps the background machinery (and its multihost
    coordination) alive across epochs."""
    global _CKPTR
    if _CKPTR is None:
        import orbax.checkpoint as ocp

        _CKPTR = ocp.StandardCheckpointer()
        atexit.register(wait_for_checkpoints)
    return _CKPTR


def wait_for_checkpoints() -> None:
    """Block until any in-flight async checkpoint write has committed.

    Errors from a failed background write surface here (and on the next
    ``save_checkpoint``/``restore_checkpoint`` call)."""
    if _CKPTR is not None:
        _CKPTR.wait_until_finished()


def save_checkpoint(path: str, tree: Any, block: bool = False) -> str:
    """Save a pytree (params, opt state, step, ...) to ``path`` (a directory).

    Async by default: returns once the arrays are snapshotted to host; the
    disk commit runs in the background (epoch N+1's training hides epoch
    N's write — the reference's torch.save blocks the loop instead,
    train.py:208-217).  At most one save is in flight: a previous pending
    write is finished first.  ``block=True`` waits for this save's commit.

    Overwrite is delegated to orbax's ``force=True``, which removes an
    existing checkpoint with proper cross-process synchronization — a bare
    process-0 rmtree would race other processes entering ``save``.
    """
    path = os.path.abspath(path)
    ckptr = _checkpointer()
    ckptr.wait_until_finished()
    ckptr.save(path, tree, force=True)
    if block:
        ckptr.wait_until_finished()
    return path


def restore_checkpoint(path: str, target: Optional[Any] = None) -> Any:
    """Restore a checkpoint; ``target`` (abstract or concrete pytree) fixes
    structure/sharding/dtypes of the restored tree."""
    import jax

    wait_for_checkpoints()  # a just-written checkpoint may still be in flight
    path = os.path.abspath(path)
    ckptr = _checkpointer()
    if target is None:
        return ckptr.restore(path)
    abstract = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=getattr(x, "sharding", None))
        if hasattr(x, "shape")
        else x,
        target,
    )
    return ckptr.restore(path, abstract)


def _is_tmp_checkpoint(name: str) -> bool:
    """True for orbax's uncommitted temporaries
    (``<name>.orbax-checkpoint-tmp-<ts>``) — left behind when a process is
    killed mid-commit (e.g. the preemption grace window expiring on an
    async write).  Resuming from one would crash-loop every relaunch."""
    return ".orbax-checkpoint-tmp" in name


def find_resume_checkpoint(directory: str) -> Optional[str]:
    """Newest restorable checkpoint for ``resume=auto``: the highest-numbered
    ``epoch-NNN`` or ``preempt-NNN`` dir.  On a number tie ``epoch-`` wins —
    a completed epoch strictly supersedes a mid-epoch preemption save of the
    same epoch."""
    if not os.path.isdir(directory):
        return None
    best, best_key = None, (-1, -1)
    for name in os.listdir(directory):
        if _is_tmp_checkpoint(name):
            continue
        for prefix, priority in (("epoch-", 1), ("preempt-", 0)):
            if not name.startswith(prefix):
                continue
            try:
                n = int(name[len(prefix):].split(".")[0])
            except ValueError:
                continue
            if (n, priority) > best_key:
                best_key, best = (n, priority), os.path.join(directory, name)
    return best


def latest_checkpoint(directory: str, prefix: str = "epoch-") -> Optional[str]:
    """Newest ``{prefix}NNN`` checkpoint dir under ``directory``, or None."""
    if not os.path.isdir(directory):
        return None
    best = None
    best_n = -1
    for name in os.listdir(directory):
        if not name.startswith(prefix) or _is_tmp_checkpoint(name):
            continue
        tail = name[len(prefix):].split(".")[0]
        try:
            n = int(tail)
        except ValueError:
            continue
        if n > best_n:
            best_n, best = n, os.path.join(directory, name)
    return best
