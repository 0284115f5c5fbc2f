"""Sharded checkpoint save/restore via orbax.

Strict superset of the reference's checkpointing: the reference only ever
*writes* ``epoch-NNN.pt`` files (train.py:208-217) and has no resume path
(SURVEY §5).  Here every save is a restorable orbax PyTree checkpoint that
round-trips sharded train state across any mesh shape.
"""

from __future__ import annotations

import os
from typing import Any, Optional

__all__ = ["save_checkpoint", "restore_checkpoint", "latest_checkpoint"]


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.StandardCheckpointer()


def save_checkpoint(path: str, tree: Any) -> str:
    """Save a pytree (params, opt state, step, ...) to ``path`` (a directory).

    Overwrite is delegated to orbax's ``force=True``, which removes an
    existing checkpoint with proper cross-process synchronization — a bare
    process-0 rmtree would race other processes entering ``save``.
    """
    path = os.path.abspath(path)
    ckptr = _checkpointer()
    ckptr.save(path, tree, force=True)
    ckptr.wait_until_finished()
    return path


def restore_checkpoint(path: str, target: Optional[Any] = None) -> Any:
    """Restore a checkpoint; ``target`` (abstract or concrete pytree) fixes
    structure/sharding/dtypes of the restored tree."""
    import jax

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


def latest_checkpoint(directory: str, prefix: str = "epoch-") -> Optional[str]:
    """Newest ``{prefix}NNN`` checkpoint dir under ``directory``, or None."""
    if not os.path.isdir(directory):
        return None
    best = None
    best_n = -1
    for name in os.listdir(directory):
        if not name.startswith(prefix):
            continue
        tail = name[len(prefix):].split(".")[0]
        try:
            n = int(tail)
        except ValueError:
            continue
        if n > best_n:
            best_n, best = n, os.path.join(directory, name)
    return best
