"""TPU kernels (Pallas) and the dispatch switch.

``fused_attention_enabled()`` decides whether attention modules route through
the Pallas fused kernel (ops/fused_attention.py) or the XLA einsum path:

- env ``VTX_FUSED_ATTENTION=1|0`` forces it on/off
- default: measurement-driven AUTO (PERF.md round 2).  The round-2
  ``fused_attention_qkv`` entry reads the qkv projection output in its
  native [B, N, 3·H·D] layout (no relayout on either side of the custom
  call) and beats the einsum path in the full ViT-S train step on v5e
  (3552 vs 2500 img/s/chip at 256/chip; 3558 vs 3519 at 64/chip).  At tiny
  per-chip batches (<32) the einsum path's activations stay VMEM-resident
  and still win by ~3%, so AUTO dispatches on the batch size the caller
  passes.
"""

from __future__ import annotations

import os
from typing import Optional

from . import fused_attention as fused_attention_mod  # noqa: F401

_FORCED: Optional[bool] = None
_INTERPRET: bool = False

# below this per-call batch the einsum path stays VMEM-resident and wins
# (measured on v5e, PERF.md)
_AUTO_MIN_BATCH = 32
# below this sequence length the kernel's per-problem dots are too small for
# the MXU and einsum wins (measured: 197-token ViT wins fused, 37-token DINO
# local crops and 49/98-token Swin windows win einsum)
_AUTO_MIN_SEQ = 128


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


def fused_attention_qkv(qkv, n_head, extra=None, scale=None):
    """Packed-qkv self-attention ([B,N,3·H·D] → [B,N,H·D]) — the
    zero-relayout entry used by ViT (see ops/fused_attention.py)."""
    return fused_attention_mod.fused_attention_qkv(qkv, n_head, extra, scale,
                                                   _INTERPRET)


def fused_attention_enabled(batch: Optional[int] = None,
                            default: bool = True,
                            seq: Optional[int] = None) -> bool:
    """Dispatch decision for one attention call site.

    ``batch``/``seq``: the call's leading batch dim and token count (static
    at trace time) — AUTO keeps einsum below ``_AUTO_MIN_BATCH`` /
    ``_AUTO_MIN_SEQ``.  ``default``: the call site's measured default when no
    override is active (ViT: True; sites without a measured win pass False).
    """
    if _FORCED is not None:
        return _FORCED
    env = os.environ.get("VTX_FUSED_ATTENTION")
    if env is not None:
        return env not in ("0", "false", "off")
    import jax

    if jax.default_backend() != "tpu":
        # Mosaic kernels only compile for TPU; CPU/GPU take the einsum path
        # (tests opt into the kernel via set_fused_attention(interpret=True))
        return False
    if batch is not None and batch < _AUTO_MIN_BATCH:
        return False
    if seq is not None and seq < _AUTO_MIN_SEQ:
        return False
    return default
