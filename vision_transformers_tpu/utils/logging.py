"""Rank-aware console logger (reference: tensorfn.get_logger, train.py:94).

In the JAX runtime there is one process per *host*, not per device, so
"primary" means jax.process_index() == 0.  Non-primary processes get a logger
whose handlers are suppressed, mirroring the reference's rank-0 gating
(train.py:321-330).
"""

from __future__ import annotations

import logging
import sys
import time

__all__ = ["get_logger", "is_primary"]

_LOGGERS: dict[str, logging.Logger] = {}


def is_primary() -> bool:
    try:
        import jax

        return jax.process_index() == 0
    except Exception:
        return True


class _ElapsedFormatter(logging.Formatter):
    def __init__(self):
        super().__init__()
        self.start = time.time()

    def format(self, record: logging.LogRecord) -> str:
        elapsed = time.time() - self.start
        h, rem = divmod(int(elapsed), 3600)
        m, s = divmod(rem, 60)
        return f"[{h:02d}:{m:02d}:{s:02d}] {record.getMessage()}"


class _StdoutHandler(logging.StreamHandler):
    """StreamHandler that resolves ``sys.stdout`` at EMIT time — the logger
    is a cached singleton, so binding the stream at creation would keep
    writing to a stale stream after stdout is redirected (pytest capsys,
    nohup re-exec, tee wrappers)."""

    def __init__(self):
        super().__init__(sys.stdout)

    @property
    def stream(self):
        return sys.stdout

    @stream.setter
    def stream(self, value):  # base __init__/setStream assign it; ignore
        pass


def get_logger(name: str = "vtx", mode: str = "rich") -> logging.Logger:
    if name in _LOGGERS:
        return _LOGGERS[name]
    logger = logging.getLogger(name)
    logger.setLevel(logging.INFO)
    logger.propagate = False
    if is_primary():
        handler = _StdoutHandler()
        handler.setFormatter(_ElapsedFormatter())
        logger.addHandler(handler)
    else:
        logger.addHandler(logging.NullHandler())
    _LOGGERS[name] = logger
    return logger
