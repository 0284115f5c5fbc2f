"""TPU kernels (Pallas) and the dispatch switch.

``fused_attention_enabled()`` decides whether attention modules route through
the Pallas fused kernel (ops/fused_attention.py) or the XLA einsum path:

- env ``VTX_FUSED_ATTENTION=1|0`` forces it on/off
- otherwise: on for TPU backends, off elsewhere (the einsum path is faster
  than interpret-mode Pallas on CPU, and keeps CPU CI fast)
"""

from __future__ import annotations

import os
from typing import Optional

from . import fused_attention as fused_attention_mod  # noqa: F401

_FORCED: Optional[bool] = None
_INTERPRET: bool = False


def set_fused_attention(enabled: Optional[bool], interpret: bool = False) -> None:
    """Force the fused-attention path on/off (None = auto).  ``interpret``
    runs the kernel in Pallas interpret mode (CPU testing)."""
    global _FORCED, _INTERPRET
    _FORCED = enabled
    _INTERPRET = interpret


def fused_attention(q, k, v, extra=None, scale=None):
    """Model-facing entry: dispatches to the Pallas kernel, honoring the
    interpret-mode test switch."""
    return fused_attention_mod.fused_attention(q, k, v, extra, scale, _INTERPRET)


def fused_attention_enabled() -> bool:
    if _FORCED is not None:
        return _FORCED
    env = os.environ.get("VTX_FUSED_ATTENTION")
    if env is not None:
        return env not in ("0", "false", "off")
    try:
        import jax

        return jax.default_backend() in ("tpu", "axon")
    except Exception:
        return False
