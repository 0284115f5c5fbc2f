"""Type-tagged config registry.

The reference resolves ``arch: {type: swin_transformer, ...}`` conf blocks to
model constructors through ``tensorfn.config.config_model`` /
``get_models("model")`` (reference: config.py:3-24,
models/swin_transformer.py:236).  This module provides the TPU-native
equivalent: a namespace → name → pydantic-config map.  Registered configs are
pydantic models carrying a ``make(...)`` method that builds the actual object
(a flax module, an optax transform, a schedule, ...).
"""

from __future__ import annotations

from typing import Any, Callable, Type

from pydantic import BaseModel, ConfigDict

__all__ = ["TypedConfig", "register", "build", "get", "names"]

_REGISTRY: dict[str, dict[str, Type["TypedConfig"]]] = {}


class TypedConfig(BaseModel):
    """Base for all ``type:``-tagged config blocks."""

    model_config = ConfigDict(extra="forbid", validate_assignment=True)

    type: str

    def make(self, *args: Any, **kwargs: Any) -> Any:  # pragma: no cover - abstract
        raise NotImplementedError(f"{type(self).__name__} does not define make()")


def register(namespace: str, name: str) -> Callable[[Type[TypedConfig]], Type[TypedConfig]]:
    """Class decorator registering a TypedConfig under ``namespace``/``name``."""

    def deco(cls: Type[TypedConfig]) -> Type[TypedConfig]:
        space = _REGISTRY.setdefault(namespace, {})
        if name in space and space[name] is not cls:
            raise ValueError(f"duplicate registration: {namespace}/{name}")
        space[name] = cls
        cls.model_fields["type"].default = name
        cls.model_rebuild(force=True)
        return cls

    return deco


def get(namespace: str, name: str) -> Type[TypedConfig]:
    try:
        return _REGISTRY[namespace][name]
    except KeyError:
        known = ", ".join(sorted(_REGISTRY.get(namespace, {}))) or "<none>"
        raise KeyError(f"unknown {namespace} type {name!r}; registered: {known}") from None


def names(namespace: str) -> list[str]:
    return sorted(_REGISTRY.get(namespace, {}))


def build(namespace: str, conf: Any) -> TypedConfig:
    """Validate a raw dict (with a ``type`` tag) into its registered config."""
    if isinstance(conf, TypedConfig):
        return conf
    if not isinstance(conf, dict):
        raise TypeError(f"{namespace} config must be a dict, got {type(conf).__name__}")
    if "type" not in conf:
        raise ValueError(f"{namespace} config requires a 'type' tag: {conf!r}")
    cls = get(namespace, conf["type"])
    return cls.model_validate(conf)
