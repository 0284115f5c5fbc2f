"""Preemption-tolerant training: SIGTERM → checkpoint → clean exit.

TPU pods (and most cluster schedulers) deliver SIGTERM with a grace window
before killing the job.  The reference has no failure-detection or resume
path at all (SURVEY §5: checkpoint write wrapped in a bare try/except,
training always restarts from scratch, reference train.py:207-219); here the
trainers poll :func:`requested_global` at step boundaries and, when a
shutdown was requested, write a blocking ``preempt-NNN`` checkpoint that
``resume=auto`` picks up on the next launch.

The handler is installed by the CLI entry points (``train.py`` /
``train_dino.py``), never by library code — tests and notebook users keep
default signal behavior unless they opt in.
"""

from __future__ import annotations

import signal
import threading
from typing import Iterable

__all__ = ["install", "requested", "requested_global", "reset"]

_EVENT = threading.Event()


def _handler(signum, frame):  # noqa: ANN001 - signal signature
    _EVENT.set()


def install(signals: Iterable[int] = (signal.SIGTERM,)) -> None:
    """Route ``signals`` to a 'finish the step, checkpoint, exit' request.

    Must run on the main thread (CPython restriction on ``signal.signal``).
    """
    for s in signals:
        signal.signal(s, _handler)


def requested() -> bool:
    """True once a shutdown signal has arrived at THIS process."""
    return _EVENT.is_set()


def reset() -> None:
    """Clear the request flag (tests)."""
    _EVENT.clear()


def requested_global() -> bool:
    """True once a shutdown signal has arrived at ANY process.

    A collective (all processes must call it the same number of times —
    the trainers poll at fixed step boundaries, which are globally
    synchronous).  The scheduler may TERM only a subset of hosts first;
    orbax saves are collective, so every process must agree to enter the
    preemption save together.  Single-process: a plain flag read.
    """
    import jax

    if jax.process_count() == 1:
        return requested()

    import numpy as np
    from jax.experimental import multihost_utils

    flags = multihost_utils.process_allgather(np.asarray(requested()))
    return bool(np.asarray(flags).any())
