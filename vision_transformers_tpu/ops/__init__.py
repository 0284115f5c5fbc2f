"""TPU kernels (Pallas) and the dispatch switch.

Four attention implementations (PERF.md rounds 1-2):

- ``einsum``: XLA batched einsums — wins at tiny per-chip batches (<32,
  activations stay VMEM-resident) and very short sequences
- ``fused``: ops/fused_attention.py ``fused_attention_qkv`` — reads the qkv
  projection output in its native [B, N, 3·H·D] layout (no relayout on
  either side of the custom call)
- ``block``: ops/fused_block.py — the whole attention block (qkv projection
  + MHSA + out projection) as ONE kernel with VMEM-resident weights
- ``layer``: ops/fused_layer.py — the whole pre-LN attention residual
  branch (LN + qkv + MHSA + out projection + DropPath row scale +
  residual) as one kernel; THE measured winner and the AUTO default for
  Swin (all stages) and ViT (seq ≥ 128): Swin-S 913 vs 889 einsum
  img/s/chip at 128/chip, ViT-S 3684 vs 3534 (v5e).  The FF residual
  branch has a matching kernel, off by default (``ff_kernel_enabled``).

Dispatch: env ``VTX_ATTN_IMPL=einsum|fused|block|layer`` forces globally
(legacy ``VTX_FUSED_ATTENTION=1|0`` maps to fused/einsum); otherwise
measurement-driven AUTO keyed on the call's batch/sequence, with per-site
measured defaults passed by the model code.
"""

from __future__ import annotations

import contextlib
import os
import threading
from typing import Optional

from . import fused_attention as fused_attention_mod  # noqa: F401
from . import fused_block as fused_block_mod  # noqa: F401
from . import fused_halo as fused_halo_mod  # noqa: F401
from . import fused_halo_layer as fused_halo_layer_mod  # noqa: F401
from . import fused_layer as fused_layer_mod  # noqa: F401
from . import fused_layer1 as fused_layer1_mod  # noqa: F401
from . import fused_swin as fused_swin_mod  # noqa: F401
from .fused_swin import swin_token_perm  # noqa: F401

_FORCED: Optional[str] = None
_INTERPRET: bool = False
# thread-local so a concurrent trace on another thread (e.g. warming the
# eval step while a train step compiles) never observes eval's mode
_TLS = threading.local()


@contextlib.contextmanager
def forward_only():
    """Trace-time marker: the wrapped model apply is never differentiated
    (DINO teacher forward, eval/predict).  Upgrades the 'layer' attention
    default to 'layer1' — with no backward, the one-call-per-layer kernel
    just removes the per-layer dependent-custom-call boundary from the
    forward chain: measured 1.18× on the fwd-only 12-layer ViT-S stack
    (scripts/exp_fwdonly_layer1.py, PERF.md round 4; the train-step loss
    that keeps layer1 off for ViT lives entirely in the FF backward's
    per-row weight grads).  Explicit forces (env / set_attention_impl)
    still win."""
    prev = getattr(_TLS, "forward_only", False)
    _TLS.forward_only = True
    try:
        yield
    finally:
        _TLS.forward_only = prev

# below this per-call batch the einsum path stays VMEM-resident and wins
# (measured on v5e, PERF.md)
_AUTO_MIN_BATCH = 32
# below this sequence length per-problem dots are too small for the MXU and
# einsum wins for the standalone fused kernel (197-token ViT wins fused,
# 37-token DINO local crops win einsum); the block kernel has its own
# measured defaults passed per call site
_AUTO_MIN_SEQ = 128
# forward-only (no backward) row-count gate for the layer→layer1 upgrade:
# ViT-S eval measured 13289 vs 12544 img/s/chip at 256 rows/chip (+5.9%
# for layer1) but 13199 vs 13822 at 64 (-4.5%) — small forwards are too
# short to pay layer1's per-call setup; the DINO teacher (256 rows at
# 128/chip) measured neutral either way (PERF.md round 4)
_FWDONLY_L1_MIN_BATCH = 128


def set_fused_attention(enabled: Optional[bool], interpret: bool = False) -> None:
    """Legacy test/bench switch: force the fused-attention path on/off
    (None = auto).  ``interpret`` runs kernels in Pallas interpret mode."""
    set_attention_impl(None if enabled is None else
                       ("fused" if enabled else "einsum"), interpret)


def set_attention_impl(impl: Optional[str], interpret: bool = False) -> None:
    """Force the attention implementation: "einsum" | "fused" | "block";
    None = measurement-driven auto.  ``interpret`` runs the Pallas kernels
    in interpret mode (CPU testing)."""
    global _FORCED, _INTERPRET
    assert impl in (None, "einsum", "fused", "block", "layer", "layer1",
                    "swin"), impl
    _FORCED = impl
    _INTERPRET = interpret


def fused_attention(q, k, v, extra=None, scale=None):
    """Grouped-layout Pallas kernel ([B,G,M,D]), honoring the interpret-mode
    test switch."""
    return fused_attention_mod.fused_attention(q, k, v, extra, scale, _INTERPRET)


def fused_attention_qkv(qkv, n_head, extra=None, scale=None):
    """Packed-qkv self-attention ([B,N,3·H·D] → [B,N,H·D]) — the
    zero-relayout entry (see ops/fused_attention.py)."""
    return fused_attention_mod.fused_attention_qkv(qkv, n_head, extra, scale,
                                                   _INTERPRET)


def fused_attention_block(x, wqkv, bqkv, wout, bout, n_head, extra=None,
                          scale=None):
    """Whole-block kernel: qkv projection + MHSA + out projection
    (see ops/fused_block.py)."""
    return fused_block_mod.fused_attention_block(
        x, wqkv, bqkv, wout, bout, n_head, extra, scale, _INTERPRET)


def fused_attention_layer(x, ln_scale, ln_bias, wqkv, bqkv, wout, bout,
                          n_head, extra=None, row_scale=None, scale=None,
                          eps=1e-6):
    """Whole pre-LN attention residual branch:
    ``x + row_scale ⊙ AttnBlock(LN(x))`` (see ops/fused_layer.py)."""
    return fused_layer_mod.fused_attention_layer(
        x, ln_scale, ln_bias, wqkv, bqkv, wout, bout, n_head, extra,
        row_scale, scale, eps, _INTERPRET)


def fused_transformer_layer(x, ln1_scale, ln1_bias, wqkv, bqkv, wout, bout,
                            ln2_scale, ln2_bias, w1, b1, w2, b2, n_head,
                            extra=None, rs_attn=None, rs_ff=None,
                            activation="silu", scale=None, eps=1e-6):
    """Whole pre-LN transformer layer (attention + FF residual branches) as
    ONE custom call (see ops/fused_layer1.py)."""
    return fused_layer1_mod.fused_transformer_layer(
        x, ln1_scale, ln1_bias, wqkv, bqkv, wout, bout, ln2_scale, ln2_bias,
        w1, b1, w2, b2, n_head, extra, rs_attn, rs_ff, activation, scale,
        eps, _INTERPRET)


def fused_swin_layer(x, ln1_scale, ln1_bias, wqkv, bqkv, wout, bout,
                     ln2_scale, ln2_bias, w1, b1, w2, b2, n_head, extra,
                     rs_attn=None, rs_ff=None, activation="silu", *,
                     window, shift, pack=1, scale=None, eps=1e-6):
    """Whole Swin layer — shift + window partition + both residual branches
    + unpartition — as ONE map-resident custom call (see ops/fused_swin.py)."""
    return fused_swin_mod.fused_swin_layer(
        x, ln1_scale, ln1_bias, wqkv, bqkv, wout, bout, ln2_scale, ln2_bias,
        w1, b1, w2, b2, n_head, extra, rs_attn, rs_ff, activation,
        window=window, shift=shift, pack=pack, scale=scale, eps=eps,
        interpret=_INTERPRET)


def fused_ff_layer(x, ln_scale, ln_bias, w1, b1, w2, b2, activation="silu",
                   row_scale=None, eps=1e-6):
    """Whole pre-LN feed-forward residual branch:
    ``x + row_scale ⊙ FF(LN(x))`` (see ops/fused_layer.py)."""
    return fused_layer_mod.fused_ff_layer(
        x, ln_scale, ln_bias, w1, b1, w2, b2, activation, row_scale, eps,
        _INTERPRET)


def halo_attention(q, kv, bias, n_head, scale=None):
    """Rectangular Halo window attention in gather-native layout
    ([B·win, w², C] × [B·win, k², 2C] → [B·win, w², C]); see
    ops/fused_halo.py."""
    return fused_halo_mod.halo_attention(q, kv, bias, n_head, scale,
                                         _INTERPRET)


def halo_attention_direct(q, kv, bias, window, halo, n_head, scale=None):
    """Halo attention straight off the [b, H, W, ·] feature map — no
    neighborhood gather at all (see ops/fused_halo.py)."""
    return fused_halo_mod.halo_attention_direct(q, kv, bias, window, halo,
                                                n_head, scale, _INTERPRET)


def fused_halo_layer(x, ln1_scale, ln1_bias, wqkv, wout, bout, ln2_scale,
                     ln2_bias, w1, b1, w2, b2, bias, n_head, rs_attn=None,
                     rs_ff=None, activation="silu", *, window, halo,
                     scale=None, eps=1e-6):
    """Whole Halo layer — LN₁ + qkv proj + halo attention + out proj +
    residual + LN₂ + FF + residual — as ONE map-resident custom call
    (see ops/fused_halo_layer.py)."""
    return fused_halo_layer_mod.fused_halo_layer(
        x, ln1_scale, ln1_bias, wqkv, wout, bout, ln2_scale, ln2_bias,
        w1, b1, w2, b2, bias, n_head, rs_attn, rs_ff, activation,
        window=window, halo=halo, scale=scale, eps=eps,
        interpret=_INTERPRET)


def halo_impl(window: int = 8, halo: int = 1) -> str:
    """Implementation decision for HaloAttention: "layer" (whole-layer
    map-resident kernel) | "direct" (map-resident attention kernel) |
    "gather" (gather + rectangular kernel) | "einsum".  Honors the global
    impl force and ``VTX_HALO_IMPL``."""
    env = os.environ.get("VTX_HALO_IMPL")
    if env in ("layer", "direct", "gather", "einsum"):
        if env == "layer" and not (2 * halo <= window
                                   and (window % 8 == 0 or _INTERPRET)):
            return "gather"  # layer kernel has direct's fold/alignment needs
        return env
    if _FORCED == "einsum":
        return "einsum"
    if _FORCED is None:
        # honor the documented GLOBAL env forces too
        env = os.environ.get("VTX_ATTN_IMPL")
        if env == "einsum":
            return "einsum"
        if env is None and \
                os.environ.get("VTX_FUSED_ATTENTION") in ("0", "false", "off"):
            return "einsum"
        import jax

        if jax.default_backend() != "tpu":
            return "einsum"  # Mosaic kernels only compile for TPU
    # the layer/direct kernels need halo ≤ w/2 (band fold) and, on real
    # TPUs, 8 | window for aligned col slices; interpret mode (tests) has
    # no tiling constraint.  Measured default (PERF.md round 5): the
    # whole-layer kernel — Halo-S full step 806.4 vs direct's 591.7
    # img/s/chip at 64/chip (the chain-tax removal layer1 delivered for
    # Swin, plus zero XLA segments between custom calls)
    if 2 * halo <= window and (window % 8 == 0 or _INTERPRET):
        return "layer"
    return "gather"


def tp_kernel_guard(model_parallel: int, logger=None) -> None:
    """Disable the Pallas kernel paths when the mesh has a real tensor-
    parallel axis.  The kernels are plain ``pallas_call``s inside the
    sharded jit — XLA's SPMD partitioner has no partitioning rule for them,
    so with ``mesh.model > 1`` the einsum paths (which the partitioner
    shards and inserts ICI collectives for, parallel/tp.py) are the
    supported route.  A user force (env or set_attention_impl) wins."""
    if model_parallel <= 1 or _FORCED is not None:
        return
    if os.environ.get("VTX_ATTN_IMPL") or os.environ.get("VTX_FUSED_ATTENTION"):
        return
    set_attention_impl("einsum")
    if logger is not None:
        logger.info(
            f"mesh.model={model_parallel}: Pallas kernels off (einsum paths"
            " shard under the XLA partitioner; custom calls do not)")


_FF_KERNEL_FORCED: Optional[bool] = None


def set_ff_kernel(enabled: Optional[bool]) -> None:
    """Force the fused FF layer-half kernel on/off under the 'layer' impl
    (None = measured default)."""
    global _FF_KERNEL_FORCED
    _FF_KERNEL_FORCED = enabled


def ff_kernel_enabled(default: bool = False) -> bool:
    """Whether the 'layer' impl also fuses the FF half.  Measured default:
    OFF — the FF backward kernel trails XLA (PERF.md round 2); the
    attention half is where the fused win lives."""
    if _FF_KERNEL_FORCED is not None:
        return _FF_KERNEL_FORCED
    env = os.environ.get("VTX_FF_KERNEL")
    if env is not None:
        return env not in ("0", "false", "off")
    return default


def attention_impl(batch: Optional[int] = None, seq: Optional[int] = None,
                   default: str = "einsum") -> str:
    """Implementation decision for one attention call site.

    ``batch``/``seq``: the call's leading batch dim and token count (static
    at trace time).  ``default``: the site's measured winner on TPU when no
    override is active.  Returns "einsum" | "fused" | "block".
    """
    if _FORCED is not None:
        return _FORCED
    env = os.environ.get("VTX_ATTN_IMPL")
    if env in ("einsum", "fused", "block", "layer", "layer1", "swin"):
        return env
    env = os.environ.get("VTX_FUSED_ATTENTION")
    if env is not None:
        return "einsum" if env in ("0", "false", "off") else "fused"
    import jax

    if jax.default_backend() != "tpu":
        # Mosaic kernels only compile for TPU; CPU/GPU take the einsum path
        # (tests opt into kernels via set_attention_impl(..., interpret=True))
        return "einsum"
    if default != "einsum" and batch is not None and batch < _AUTO_MIN_BATCH:
        return "einsum"  # tiny batches stay VMEM-resident under einsum
    if default == "fused" and seq is not None and seq < _AUTO_MIN_SEQ:
        return "einsum"  # short-seq standalone kernel loses (DINO locals)
    if default == "layer" and getattr(_TLS, "forward_only", False) and \
            (batch is None or batch >= _FWDONLY_L1_MIN_BATCH) and \
            os.environ.get("VTX_FWDONLY_L1") not in ("0", "false", "off"):
        return "layer1"  # no backward → one call per layer wins (fwd-only
        #                  stack A/B, PERF.md round 4)
    return default


def interpret_mode() -> bool:
    """Whether kernels run in Pallas interpret mode (CPU tests)."""
    return _INTERPRET


def sra_attention_impl(default: str = "einsum", n_kv: Optional[int] = None) -> str:
    """Reduced-kv (rectangular-score) attention sites — PVT SRA and Twins
    GSA (reference models/pvt.py:26-69, models/twins.py:39-93): q over the
    full token grid, k/v over the conv-reduced grid.  ``fused`` routes the
    post-projection softmax(q·kᵀ)·v through ops/fused_attention.py (which
    supports M≠N); ``einsum`` keeps the XLA path.  ``VTX_SRA_IMPL``
    overrides; a global einsum/fused force (VTX_ATTN_IMPL or
    set_attention_impl) also applies so the interpret-mode tests can opt
    in; the per-site ``default`` is the measured winner (PERF.md).

    ``n_kv``: the call's reduced k/v token count.  Below 8 tokens the
    kernel path is disabled on hardware regardless of any force: the
    near-matvec q·kᵀ dot (Twins stage 4 reduces to ONE k token) trips a
    Mosaic lowering bug (mixed-dtype vector.broadcast verification
    failure), and a <8-sublane contraction has nothing to win on the MXU
    anyway.  Interpret mode (CPU tests) doesn't lower through Mosaic and
    stays exact."""
    if n_kv is not None and n_kv < 8 and not _INTERPRET:
        return "einsum"
    env = os.environ.get("VTX_SRA_IMPL")
    if env in ("einsum", "fused"):
        return env
    if _FORCED in ("einsum", "fused"):
        return _FORCED
    if os.environ.get("VTX_ATTN_IMPL") in ("einsum", "fused"):
        return os.environ["VTX_ATTN_IMPL"]
    import jax

    if jax.default_backend() != "tpu":
        return "einsum"
    return default


def fused_attention_enabled(batch: Optional[int] = None,
                            default: bool = True,
                            seq: Optional[int] = None) -> bool:
    """Legacy boolean view of :func:`attention_impl` (fused vs einsum)."""
    return attention_impl(batch, seq,
                          "fused" if default else "einsum") == "fused"
