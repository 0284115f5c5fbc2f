"""TPU kernels (Pallas) and the dispatch switch.

``fused_attention_enabled()`` decides whether attention modules route through
the Pallas fused kernel (ops/fused_attention.py) or the XLA einsum path:

- env ``VTX_FUSED_ATTENTION=1|0`` forces it on/off
- default: OFF — measurement-driven (see PERF.md).  The kernel beats the
  einsum path in isolation on v5e (ViT shapes: 1.1 ms vs 2.5 ms fwd,
  2.1 ms vs 3.7 ms grad per layer-batch), but inside the full jitted train
  step XLA's fusion of the einsum chain with the surrounding projections
  still wins (ViT-S 2128 vs 1846 img/s; Swin-S 686 vs 534 img/s).  The
  integration gap is the forced [b, h, n, d] materialization around the
  custom call — round-2 work.
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
    return False
