"""Optimizers, adaptive gradient clipping, and weight-decay partitioning.

TPU-native equivalents of the reference's optimizer stack:

- ``adamw`` / ``rmsprop_tf`` optimizer factories (reference: tensorfn
  ``Optimizer.make``, factory.py:42-45; rmsprop_tf settings at
  config/efficientnetv2-s.conf:38-43)
- adaptive gradient clipping from NFNet (reference: optimizer.py:12-26),
  applied to every parameter except the final classifier ``linear``
  (reference: train.py:256-262,289-294)
- weight-decay skip predicates (reference: factory.py:25-39) and the two-group
  decay split (reference: train_util.py:87-111)

Instead of torch param-groups, everything is an ``optax`` gradient
transformation over the flax param pytree, masked by path predicates — the
whole chain runs inside the jitted train step with no host sync.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ..config.registry import TypedConfig, register

__all__ = [
    "AdamW",
    "RMSpropTF",
    "SGD",
    "adaptive_grad_clip",
    "add_scheduled_decayed_weights",
    "wd_skip_fn",
    "wd_mask",
    "agc_mask",
    "make_optimizer",
]


# ---------------------------------------------------------------------------
# Unit-wise adaptive gradient clipping (reference: optimizer.py:4-26)
# ---------------------------------------------------------------------------

# Leaves whose flax layout is the TRANSPOSE of the torch layout (output axis
# last): Dense/Conv kernels, and the DINO head's weight-norm direction.
# Everything else (cls_token, pos_embed, bias tables, scales, biases) has the
# identical layout in both frameworks, so the reference's dim-0 unit applies
# unchanged.
_OUT_LAST_LEAVES = ("kernel", "last_v")


def _unitwise_norm(x: jax.Array, out_last: bool = True,
                   lead_axis: bool = False) -> jax.Array:
    """``lead_axis``: the leaf carries a stacked [depth] scan axis
    (scan_layers) — each layer's units norm independently, exactly as the
    per-layer leaves would."""
    lead = 1 if lead_axis else 0
    if x.ndim - lead <= 1:
        if lead:
            return jnp.sqrt(jnp.sum(jnp.square(x),
                                    axis=tuple(range(1, x.ndim)),
                                    keepdims=True))
        return jnp.linalg.norm(x)
    # The reference (optimizer.py:4-9) norms over ``dim=range(1, ndim)`` —
    # the unit is dim 0, the output neuron of torch (out, in) / (O,I,H,W)
    # weights.  For flax kernels ((in, out) / HWIO) that same unit is the
    # LAST axis; for identically-laid-out leaves it stays the first.
    axes = tuple(range(lead, x.ndim - 1)) if out_last \
        else tuple(range(1 + lead, x.ndim))
    return jnp.sqrt(jnp.sum(jnp.square(x), axis=axes, keepdims=True))


def adaptive_grad_clip(clipping: float = 0.01, eps: float = 1e-3) -> optax.GradientTransformation:
    """AGC: clip grads whose unit-wise norm exceeds ``clipping *`` param norm.

    Faithful to reference optimizer.py:12-26; the per-output-neuron unit
    grouping is mapped per leaf kind (see ``_unitwise_norm`` /
    ``_OUT_LAST_LEAVES``) so it selects the same units as the torch code.
    """

    def init_fn(params):
        del params
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        if params is None:
            raise ValueError("adaptive_grad_clip requires params")

        def clip(path, g, p):
            if g is None:
                return g
            leaf = str(getattr(path[-1], "key", path[-1])) if path else ""
            out_last = leaf in _OUT_LAST_LEAVES
            lead = _is_scan_path(path)
            max_norm = jnp.maximum(_unitwise_norm(p, out_last, lead),
                                   eps) * clipping
            g_norm = _unitwise_norm(g, out_last, lead)
            clipped = g * (max_norm / jnp.maximum(g_norm, 1e-6))
            return jnp.where(g_norm < max_norm, g, clipped)

        return jax.tree_util.tree_map_with_path(clip, updates, params), state

    return optax.GradientTransformation(init_fn, update_fn)


# ---------------------------------------------------------------------------
# Weight-decay skip predicates (reference: factory.py:25-39)
# ---------------------------------------------------------------------------

def _path_names(path: Tuple[Any, ...]) -> str:
    return "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in path).lower()


def _is_scan_path(path: Tuple[Any, ...]) -> bool:
    """True for leaves under the scan_layers stacked axis
    (…/layers/layer/… — models/vit.py::_LayerScanBody): their leading dim
    is the [depth] stack, not a unit/feature axis."""
    names = [str(getattr(k, "key", getattr(k, "idx", k))) for k in path]
    return any(a == "layers" and b == "layer"
               for a, b in zip(names, names[1:]))


def wd_skip_fn(skip_type: str) -> Callable[[Tuple[Any, ...], jax.Array], bool]:
    """Return ``(path, param) -> skip?`` mirroring reference factory.py:25-39.

    The reference matches torch parameter-name substrings; flax param paths
    carry the same information (module names + leaf name ``bias`` /
    ``scale`` / ``gain`` / ``cls_token``).
    """

    def check(path: Tuple[Any, ...], param: jax.Array) -> bool:
        name = _path_names(path)
        if skip_type == "nfnet":
            return "bias" in name or "gain" in name
        if skip_type == "resnet":
            return "bias" in name or "bn" in name or param.ndim == 1
        if skip_type == "vit":
            return (
                "bias" in name
                or "cls" in name
                or "norm" in name
                or param.ndim - (1 if _is_scan_path(path) else 0) == 1
            )
        if skip_type == "dino":
            # torch weight_norm stores the gain as (out, 1) — ndim 2 — so the
            # reference's ndim==1 rule puts head.last.weight_g in the DECAY
            # group (factory.py:36-37); our flax gain is (out,) and must not
            # fall through to the ndim==1 skip.
            if "last_g" in name:
                return False
            nd = param.ndim - (1 if _is_scan_path(path) else 0)
            return "bias" in name or nd == 1
        raise ValueError(f"unknown wd_skip type: {skip_type!r}")

    return check


def wd_mask(params, skip_type: str):
    """Pytree of bools: True where weight decay applies (decay group)."""
    skip = wd_skip_fn(skip_type)
    return jax.tree_util.tree_map_with_path(lambda p, x: not skip(p, x), params)


def agc_mask(params):
    """AGC applies to every parameter whose name does NOT contain "linear".

    This is the reference's exact string rule (train.py:260,
    train_dino.py:212: ``if "linear" not in p[0]``): it excludes attention
    out-projections, patch-embedding/merge linears, PVT's linear_q/linear_kv
    and NFNet's ``linear`` classifier — while classifiers named otherwise
    (swin ``classifier``, efficientnet ``logit``) ARE clipped, exactly as in
    the reference.  Flax module names mirror the reference's torch attribute
    names so the rule selects the same tensors.
    """

    def is_clipped(path, x):
        return "linear" not in _path_names(path)

    return jax.tree_util.tree_map_with_path(is_clipped, params)


# ---------------------------------------------------------------------------
# Weight decay: static or per-step scheduled (DINO's cosine wd,
# reference train_dino.py:135-139,235-237)
# ---------------------------------------------------------------------------

class ScheduledWDState(NamedTuple):
    count: jax.Array


def add_scheduled_decayed_weights(
    wd_fn: Callable[[jax.Array], jax.Array], mask
) -> optax.GradientTransformation:
    """Like ``optax.add_decayed_weights`` but the decay is ``wd_fn(count)``
    evaluated at each optimizer step — the TPU-native form of the reference's
    per-step ``param_group["weight_decay"] = wd_schedule[step]`` override
    (train_dino.py:235-237): the whole schedule stays inside the jitted step
    instead of a host write per batch."""

    def init_fn(params):
        del params
        return ScheduledWDState(count=jnp.zeros((), jnp.int32))

    def update_fn(updates, state, params=None):
        if params is None:
            raise ValueError("add_scheduled_decayed_weights requires params")
        wd = wd_fn(state.count)

        def leaf(u, p, m):
            return u + wd * p.astype(u.dtype) if m else u

        if mask is not None:
            updates = jax.tree.map(leaf, updates, params, mask)
        else:
            updates = jax.tree.map(lambda u, p: u + wd * p.astype(u.dtype),
                                   updates, params)
        return updates, ScheduledWDState(count=state.count + 1)

    return optax.GradientTransformation(init_fn, update_fn)


def _wd_transform(weight_decay, mask) -> optax.GradientTransformation:
    """Static float → add_decayed_weights; callable(count) → scheduled."""
    if callable(weight_decay):
        return add_scheduled_decayed_weights(weight_decay, mask)
    return optax.add_decayed_weights(weight_decay, mask=mask)


# ---------------------------------------------------------------------------
# TF-style RMSprop (timm's RMSpropTF; reference config uses type rmsprop_tf)
# ---------------------------------------------------------------------------

class RMSpropTFState(NamedTuple):
    """State for TF1-style RMSprop: eps inside sqrt, rms initialized to 1.

    Matches timm's ``RMSpropTF`` which the reference selects via
    ``optimizer.type: rmsprop_tf`` (config/efficientnetv2-s.conf:38-43):

        rms_t = rho * rms_{t-1} + (1-rho) * g^2
        mom_t = mu * mom_{t-1} + lr_t * g / sqrt(rms_t + eps)
        p_t   = p_{t-1} - mom_t

    The LEARNING RATE is folded into the momentum buffer (timm's default
    ``lr_in_momentum=True``) — under a ramping schedule each buffered past
    gradient keeps the lr it was accumulated with, which diverges from
    applying the current lr outside the buffer.  ``count`` indexes the lr
    schedule at each update.
    """

    nu: optax.Updates
    momentum: optax.Updates
    count: jax.Array


def _scale_by_learning_rate(learning_rate, flip_sign=True):
    m = -1 if flip_sign else 1
    if callable(learning_rate):
        return optax.scale_by_schedule(lambda count: m * learning_rate(count))
    return optax.scale(m * learning_rate)


# ---------------------------------------------------------------------------
# Optimizer configs (registry namespace "optimizer")
# ---------------------------------------------------------------------------


@register("optimizer", "adamw")
class AdamW(TypedConfig):
    lr: float
    betas: Tuple[float, float] = (0.9, 0.999)
    eps: float = 1e-8
    weight_decay: float = 0.0  # applied via masked add_decayed_weights outside

    def make(self, learning_rate, weight_decay: float, mask) -> optax.GradientTransformation:
        return optax.chain(
            optax.scale_by_adam(b1=self.betas[0], b2=self.betas[1], eps=self.eps),
            _wd_transform(weight_decay, mask),
            _scale_by_learning_rate(learning_rate),
        )


@register("optimizer", "rmsprop_tf")
class RMSpropTF(TypedConfig):
    lr: float
    alpha: float = 0.9
    eps: float = 1e-3
    momentum: float = 0.9
    weight_decay: float = 0.0

    def make(self, learning_rate, weight_decay: float, mask) -> optax.GradientTransformation:
        # timm RMSpropTF couples weight decay into the gradient (L2 style)
        # before the rms update — mirror that ordering.
        lr_fn = learning_rate if callable(learning_rate) else (lambda c: learning_rate)

        def init_fn(params):
            nu = jax.tree.map(jnp.ones_like, params)
            mom = jax.tree.map(jnp.zeros_like, params)
            return RMSpropTFState(nu=nu, momentum=mom,
                                  count=jnp.zeros((), jnp.int32))

        def update_fn(updates, state, params=None):
            lr = lr_fn(state.count)
            nu = jax.tree.map(
                lambda n, g: self.alpha * n + (1 - self.alpha) * jnp.square(g),
                state.nu,
                updates,
            )
            scaled = jax.tree.map(
                lambda g, n: g * jax.lax.rsqrt(n + self.eps), updates, nu
            )
            # buf = mu*buf + lr*g/sqrt(nu+eps); p -= buf  (lr INSIDE the buffer)
            mom = jax.tree.map(lambda m, s: self.momentum * m + lr * s,
                               state.momentum, scaled)
            out = jax.tree.map(lambda m: -m, mom)
            return out, RMSpropTFState(nu=nu, momentum=mom,
                                       count=state.count + 1)

        return optax.chain(
            _wd_transform(weight_decay, mask),  # L2 into grad
            optax.GradientTransformation(init_fn, update_fn),
        )


@register("optimizer", "sgd")
class SGD(TypedConfig):
    lr: float
    momentum: float = 0.9
    nesterov: bool = False
    weight_decay: float = 0.0

    def make(self, learning_rate, weight_decay: float, mask) -> optax.GradientTransformation:
        return optax.chain(
            _wd_transform(weight_decay, mask),
            optax.trace(decay=self.momentum, nesterov=self.nesterov),
            _scale_by_learning_rate(learning_rate),
        )


@register("optimizer", "lamb")
class LAMB(TypedConfig):
    lr: float
    betas: Tuple[float, float] = (0.9, 0.999)
    eps: float = 1e-6
    weight_decay: float = 0.0

    def make(self, learning_rate, weight_decay: float, mask) -> optax.GradientTransformation:
        return optax.chain(
            optax.scale_by_adam(b1=self.betas[0], b2=self.betas[1], eps=self.eps),
            _wd_transform(weight_decay, mask),
            optax.scale_by_trust_ratio(),
            _scale_by_learning_rate(learning_rate),
        )


# ---------------------------------------------------------------------------
# Full training transform: AGC → clip-by-norm → optimizer(+wd)
# ---------------------------------------------------------------------------

def make_optimizer(
    train_conf,
    params,
    schedule,
    weight_decay: Optional[float] = None,
) -> optax.GradientTransformation:
    """Compose the full gradient pipeline from a Training config.

    Order mirrors the reference hot loop (train.py:285-299): AGC on non-head
    params (train.py:289-291) → global grad-norm clip (train.py:293-294) →
    optimizer step with decoupled/L2 weight decay on the decay group
    (train_util.py:87-111, factory.py:25-39).

    ``weight_decay`` may be a float or a ``callable(count) -> scalar`` — the
    latter reproduces DINO's per-step cosine weight-decay override
    (reference train_dino.py:135-139,235-237) inside the jitted step.
    """
    chain = []
    if train_conf.agc > 0:
        chain.append(optax.masked(adaptive_grad_clip(train_conf.agc), agc_mask(params)))
    if train_conf.clip_grad_norm > 0:
        chain.append(optax.clip_by_global_norm(train_conf.clip_grad_norm))

    wd = train_conf.weight_decay if weight_decay is None else weight_decay
    mask = wd_mask(params, train_conf.wd_skip)
    chain.append(train_conf.optimizer.make(schedule, wd, mask))
    return optax.chain(*chain)
