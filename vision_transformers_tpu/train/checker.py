"""Checker: metric reporting + checkpoint storage.

TPU-native rebuild of tensorfn's ``Checker`` (reference call sites:
train.py:171,200-217, train_dino.py:146,173-181; conf blocks at
config/swin-transformer-s.conf:61-74).  Storages receive checkpoints;
reporters receive scalar metrics.  Only the ``local`` storage and ``logger``
reporter types appear in reference configs; both are implemented, and the
registry makes new ones pluggable.

Checkpoints are saved with orbax (sharded, restore-capable) — a strict
superset of the reference's torch.save-only behavior (SURVEY §5: the
reference has no resume path at all).
"""

from __future__ import annotations

import json
import os
from typing import Any, List, Optional

from ..config.registry import TypedConfig, register
from ..utils.logging import get_logger, is_primary

__all__ = ["Checker", "CheckerConfig", "LocalStorage", "LoggerReporter"]


@register("storage", "local")
class LocalStorage(TypedConfig):
    path: str = "experiment"

    def make(self) -> "_LocalStorage":
        return _LocalStorage(self.path)


class _LocalStorage:
    def __init__(self, path: str):
        self.path = path

    def save(self, obj: Any, name: str) -> str:
        from . import checkpoint as ckpt

        target = os.path.join(self.path, name)
        ckpt.save_checkpoint(target, obj)
        return target


@register("reporter", "logger")
class LoggerReporter(TypedConfig):
    def make(self) -> "_LoggerReporter":
        return _LoggerReporter()


class _LoggerReporter:
    def __init__(self):
        self.logger = get_logger()

    def report(self, step: Optional[int] = None, **scalars: Any) -> None:
        parts = [] if step is None else [f"step {step}"]
        for k, v in scalars.items():
            parts.append(f"{k}: {v:.5f}" if isinstance(v, float) else f"{k}: {v}")
        self.logger.info("; ".join(parts))


@register("reporter", "jsonl")
class JsonlReporter(TypedConfig):
    """Append-only metrics file — the observability upgrade over the reference."""

    path: str = "metrics.jsonl"

    def make(self) -> "_JsonlReporter":
        return _JsonlReporter(self.path)


class _JsonlReporter:
    def __init__(self, path: str):
        self.path = path

    def report(self, step: Optional[int] = None, **scalars: Any) -> None:
        if not is_primary():
            return
        os.makedirs(os.path.dirname(self.path) or ".", exist_ok=True)
        with open(self.path, "a") as f:
            f.write(json.dumps({"step": step, **scalars}) + "\n")


@register("reporter", "tensorboard")
class TensorboardReporter(TypedConfig):
    """TensorBoard scalars (torch's SummaryWriter — event files readable by
    any TensorBoard).  Conf: ``reporter: [{type: tensorboard, path: runs/x}]``.
    Another observability upgrade over the reference (which logs to console
    only, train.py:321-330)."""

    path: str = "runs"

    def make(self) -> "_TensorboardReporter":
        return _TensorboardReporter(self.path)


class _TensorboardReporter:
    def __init__(self, path: str):
        self.path = path
        self._writer = None

    def report(self, step: Optional[int] = None, **scalars: Any) -> None:
        if not is_primary():
            return
        if self._writer is None:  # lazy: only rank 0 ever creates the file
            from torch.utils.tensorboard import SummaryWriter

            self._writer = SummaryWriter(self.path)
        for key, value in scalars.items():
            if isinstance(value, (int, float)):
                self._writer.add_scalar(key, value, global_step=step)
        self._writer.flush()


@register("checker", "checker")
class CheckerConfig(TypedConfig):
    storage: List[Any] = []
    reporter: List[Any] = []

    def make(self) -> "Checker":
        from ..config import registry

        storages = [registry.build("storage", s).make() for s in self.storage]
        reporters = [registry.build("reporter", r).make() for r in self.reporter]
        return Checker(storages, reporters)


class Checker:
    """(reference usage: checker.log train.py:200-206; checker.checkpoint :208-217)"""

    def __init__(self, storages: list, reporters: list):
        self.storages = storages
        self.reporters = reporters or [_LoggerReporter()]

    def log(self, step: Optional[int] = None, **scalars: Any) -> None:
        for reporter in self.reporters:
            reporter.report(step=step, **scalars)

    def checkpoint(self, obj: Any, name: str, raise_on_error: bool = False) -> None:
        """``raise_on_error``: propagate save failures instead of the
        reference's log-and-continue (train.py:207-219) — used by the
        preemption handoff, which must not report success without a
        committed checkpoint."""
        for storage in self.storages:
            try:
                storage.save(obj, name)
            except Exception as e:
                if raise_on_error:
                    raise
                get_logger().info(f"checkpoint save failed: {e!r}")
