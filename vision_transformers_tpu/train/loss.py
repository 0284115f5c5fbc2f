"""Losses: label smoothing, mixup/cutmix, DINO self-distillation.

Faithful ports of the reference's ``loss.py``, restructured as pure functions
so they trace into a single jitted train step:

- ``label_smoothing_loss`` (reference: loss.py:6-50)
- ``mix_loss`` — smoothed KL against an interpolated two-hot target
  (reference: loss.py:53-86; instantiated with eps=0.1 at train.py:154)
- ``dino_loss`` — teacher centering + temperature schedule + cross-entropy
  over crop pairs, skipping identical views (reference: loss.py:89-151).
  The center's cross-rank ``all_reduce`` (loss.py:147) disappears: with the
  batch sharded over the ``data`` mesh axis, ``jnp.mean`` over axis 0 inside
  the sharded jit *is* the global reduction — XLA inserts the collective.

The reference computes true KL divergence (``F.kl_div``), which differs from
cross-entropy by the target entropy (a constant w.r.t. params).  We reproduce
the KL value exactly so logged losses are comparable.
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp

__all__ = [
    "label_smoothing_loss",
    "mix_loss",
    "cross_entropy_loss",
    "dino_loss",
    "teacher_temperature_schedule",
    "update_center",
]


def _smooth_targets(labels: jax.Array, n_class: int, eps: float) -> jax.Array:
    """Two-term smoothed one-hot: eps/n_class everywhere, 1-eps+eps/n_class at label."""
    off = eps / n_class
    on = 1.0 - eps + off
    return jax.nn.one_hot(labels, n_class, dtype=jnp.float32) * (on - off) + off


def _kl_div(log_probs: jax.Array, targets: jax.Array) -> jax.Array:
    """sum_i t_i * (log t_i - log p_i), with 0*log(0) = 0. Per-sample."""
    t = targets
    tlogt = jnp.where(t > 0, t * jnp.log(jnp.maximum(t, 1e-20)), 0.0)
    return jnp.sum(tlogt - t * log_probs, axis=-1)


def label_smoothing_loss(logits: jax.Array, labels: jax.Array, eps: float = 0.1,
                         reduction: str = "mean") -> jax.Array:
    """Label-smoothed KL loss (reference: loss.py:6-50, ignore_index unused path)."""
    n_class = logits.shape[-1]
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    loss = _kl_div(logp, _smooth_targets(labels, n_class, eps))
    if reduction == "mean":
        return jnp.mean(loss)
    if reduction == "sum":
        return jnp.sum(loss)
    return loss


def cross_entropy_loss(logits: jax.Array, labels: jax.Array,
                       reduction: str = "mean") -> jax.Array:
    """Plain CE (reference valid loop criterion, train.py:155,352)."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    loss = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
    if reduction == "mean":
        return jnp.mean(loss)
    if reduction == "sum":
        return jnp.sum(loss)
    return loss


def mix_loss(logits: jax.Array, target1: jax.Array, target2: jax.Array,
             ratio: jax.Array, eps: float = 0.0, reduction: str = "mean") -> jax.Array:
    """Mixup/CutMix loss (reference: loss.py:53-86).

    ``target_dist = ratio * smooth(target1) + (1 - ratio) * smooth(target2)``,
    then KL against log-softmax outputs.
    """
    n_class = logits.shape[-1]
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    t1 = _smooth_targets(target1, n_class, eps)
    t2 = _smooth_targets(target2, n_class, eps)
    r = jnp.asarray(ratio, jnp.float32)[..., None]
    target = r * t1 + (1.0 - r) * t2
    loss = _kl_div(logp, target)
    if reduction == "mean":
        return jnp.mean(loss)
    if reduction == "sum":
        return jnp.sum(loss)
    return loss


# ---------------------------------------------------------------------------
# DINO (reference: loss.py:89-151)
# ---------------------------------------------------------------------------

def teacher_temperature_schedule(warmup_temp: float, temp: float,
                                 warmup_epochs: int, n_epoch: int) -> list[float]:
    """Per-epoch teacher temperature (reference: loss.py:113-122)."""
    if warmup_epochs <= 1:
        warm = [warmup_temp] * warmup_epochs
    else:
        warm = [
            warmup_temp + (temp - warmup_temp) * i / (warmup_epochs - 1)
            for i in range(warmup_epochs)
        ]
    return warm + [temp] * (n_epoch - warmup_epochs)


def dino_loss(
    student_out: jax.Array,  # [n_crop * B, out_dim]
    teacher_out: jax.Array,  # [2 * B, out_dim]
    center: jax.Array,       # [1, out_dim]
    teacher_temp: jax.Array,
    n_crop: int,
    student_temp: float = 0.1,
) -> jax.Array:
    """DINO cross-entropy over (teacher global, student crop) pairs.

    Reference loss.py:124-142: teacher probs are centered + sharpened; every
    (i_q, v) pair with v != i_q contributes -sum(q * log_softmax(student_v)).
    """
    student_out = student_out.astype(jnp.float32) / student_temp
    student_chunks = jnp.split(student_out, n_crop, axis=0)

    teacher_logits = (teacher_out.astype(jnp.float32) - center) / teacher_temp
    q = jax.lax.stop_gradient(jax.nn.softmax(teacher_logits, axis=-1))
    teacher_chunks = jnp.split(q, 2, axis=0)

    # one log_softmax per student chunk (each participates in up to 2 pairs)
    logps = [jax.nn.log_softmax(sv, axis=-1) for sv in student_chunks]
    total = 0.0
    n_terms = 0
    for i_q, tq in enumerate(teacher_chunks):
        for v, logp in enumerate(logps):
            if v == i_q:
                continue
            total = total + jnp.mean(jnp.sum(-tq * logp, axis=-1))
            n_terms += 1
    return total / n_terms


def update_center(center: jax.Array, teacher_out: jax.Array,
                  momentum: float = 0.9) -> jax.Array:
    """EMA update of the teacher center (reference: loss.py:144-151).

    Under a data-sharded jit, the mean over axis 0 reduces across all chips —
    the explicit ``dist.all_reduce`` of the reference is subsumed by XLA.
    """
    batch_center = jnp.mean(teacher_out.astype(jnp.float32), axis=0, keepdims=True)
    return center * momentum + batch_center * (1.0 - momentum)
