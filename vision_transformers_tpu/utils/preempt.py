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

__all__ = ["install", "requested", "requested_global", "make_global_poller",
           "reset"]

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

    A blocking collective (all processes must call it the same number of
    times — the trainers call it at epoch boundaries, which are globally
    synchronous and already host-synced).  The scheduler may TERM only a
    subset of hosts first; orbax saves are collective, so every process
    must agree to enter the preemption save together.  Single-process: a
    plain flag read.  For in-epoch step-boundary polling use
    :func:`make_global_poller` — this function drains the dispatch
    pipeline (the allgather completes only after every enqueued step).
    """
    import jax

    if jax.process_count() == 1:
        return requested()

    import numpy as np
    from jax.experimental import multihost_utils

    flags = multihost_utils.process_allgather(np.asarray(requested()))
    return bool(np.asarray(flags).any())


def make_global_poller():
    """Build a ``poll() -> bool`` for in-epoch step-boundary checks.

    Multi-process: each call dispatches a tiny cross-process ``max`` of the
    local flags and returns the result of the PREVIOUS call — the device
    collective rides the execution stream, so the host never blocks on
    work behind the enqueued train steps (no pipeline drain, unlike
    :func:`requested_global`).  Every process reads the same lagging value
    at the same poll index, which keeps the subsequent collective
    checkpoint save aligned (acting on a locally-fresher view would
    deadlock: one process stops stepping while the others' jitted steps
    wait for it).  Detection latency is therefore two poll intervals.

    Single-process: returns :func:`requested` itself (zero cost).
    """
    import jax

    if jax.process_count() == 1:
        return requested

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec

    devices = np.asarray(jax.devices()).reshape(
        jax.process_count(), jax.local_device_count())
    mesh = Mesh(devices, ("proc", "local"))
    sharding = NamedSharding(mesh, PartitionSpec("proc"))
    reduce_any = jax.jit(jnp.max)  # replicated scalar out
    pending = None

    def poll() -> bool:
        nonlocal pending
        local = np.full((1,), float(requested()), np.float32)
        flags = jax.make_array_from_process_local_data(sharding, local)
        previous, pending = pending, reduce_any(flags)
        # blocks only on the op dispatched a poll ago — long since done
        return previous is not None and bool(previous)

    return poll
