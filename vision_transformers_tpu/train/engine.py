"""The training engine: sharded-jit train/eval steps.

TPU-native rebuild of the reference hot loop (reference train.py:236-386):
one jitted function per optimizer step containing forward, backward, gradient
accumulation, AGC/clipping, the optimizer update, EMA accumulation and metric
reduction — no host round-trips inside an epoch except logging.

Mapping from the reference:
- DDP + NCCL all-reduce (train.py:102-107,283)  → sharded jit over the mesh;
  XLA emits the gradient reduction over ICI
- grad accumulation python loop (train.py:285)  → ``lax.scan`` over
  microbatches inside the step
- amp.autocast + GradScaler (train.py:169,273)  → bf16 compute dtype; no loss
  scaling needed (bf16 has fp32 range)
- EMA ``accumulate`` with warmup decay
  ``min(ema, (1+t)/(10+t))`` (train.py:304-316, train_util.py:70-84)
  → pytree lerp inside the step, incl. batch_stats when ``ema_bn``
- Meter/accuracy (train_util.py:34-67)          → metrics pytree averaged in
  the step; ``dist.reduce_dict`` (train.py:364) is subsumed by the sharded
  reduction
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

from .. import ops as _ops
from . import loss as L

__all__ = [
    "TrainState",
    "create_train_state",
    "make_train_step",
    "make_eval_step",
    "accuracy",
    "ema_decay_schedule",
]


class TrainState(struct.PyTreeNode):
    """All mutable training state, as one donated pytree."""

    step: jax.Array  # optimizer steps taken
    params: Any
    opt_state: Any
    batch_stats: Any = None  # BN running stats (EfficientNet family)
    ema_params: Any = None
    ema_batch_stats: Any = None


def accuracy(logits: jax.Array, labels: jax.Array, topk=(1, 5)) -> tuple:
    """Top-k accuracy in percent (reference: train_util.py:53-67)."""
    ranks = jnp.argsort(-logits, axis=-1)[:, : max(topk)]
    hit = ranks == labels[:, None]
    return tuple(100.0 * jnp.mean(jnp.any(hit[:, :k], axis=-1)) for k in topk)


def ema_decay_schedule(ema: float, step: jax.Array) -> jax.Array:
    """Warmup-aware EMA decay (reference: train.py:313-314)."""
    return jnp.minimum(ema, (1.0 + step) / (10.0 + step))


def create_train_state(
    rng: jax.Array,
    model,
    input_shape,
    tx: optax.GradientTransformation,
    ema: float = 0.0,
    ema_bn: bool = False,
) -> TrainState:
    variables = model.init(rng, jnp.zeros(input_shape, jnp.float32))
    params = variables["params"]
    batch_stats = variables.get("batch_stats")
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=tx.init(params),
        batch_stats=batch_stats,
        ema_params=jax.tree.map(jnp.copy, params) if ema > 0 else None,
        ema_batch_stats=(
            jax.tree.map(jnp.copy, batch_stats) if (ema > 0 and ema_bn and batch_stats) else None
        ),
    )


def _apply(model, params, batch_stats, x, train: bool, rng: Optional[jax.Array]):
    """Forward through a model that may or may not carry batch_stats."""
    variables = {"params": params}
    if batch_stats is not None:
        variables["batch_stats"] = batch_stats
    kwargs = {}
    if rng is not None:
        kwargs["rngs"] = {"dropout": rng}
    if train and batch_stats is not None:
        logits, updates = model.apply(
            variables, x, deterministic=not train, mutable=["batch_stats"], **kwargs
        )
        return logits, updates["batch_stats"]
    logits = model.apply(variables, x, deterministic=not train, **kwargs)
    return logits, batch_stats


def make_train_step(
    model,
    tx: optax.GradientTransformation,
    grad_accumulation: int = 1,
    label_smoothing: float = 0.1,
    ema: float = 0.0,
    n_class: int = 1000,
) -> Callable:
    """Build the per-optimizer-step function.

    ``batch`` is a dict with ``image`` [B,H,W,C] (float, already augmented and
    normalized), ``label1``/``label2`` [B] int32, ``ratio`` [B] float — the
    MixDataset tuple of the reference (mix_dataset.py:90).  With gradient
    accumulation the leading dim is split into ``grad_accumulation``
    microbatches scanned inside the step (reference accumulates across
    loader iterations, train.py:285 — same math: mean over the full batch).

    EMA under accumulation mirrors the reference, which lerps the EMA model
    once per LOADER batch, not per optimizer step (train.py:301-316): with
    ``A = grad_accumulation``, the first A-1 lerps pull toward the unchanged
    pre-step params (a closed-form scalar decay product — params are constant
    across microbatches) while BN buffers lerp against each microbatch's
    intermediate running stats inside the scan; the final lerp (after the
    boundary ``optimizer.step()``) pulls toward the updated params and final
    stats.  The warmup decay ``min(ema, (1+t)/(10+t))`` counts t in loader
    batches, ``t = step·A + k``, monotonically — the reference's per-epoch
    ``step += epoch_len`` bookkeeping (train.py:190) makes its own t jump
    BACKWARD at each epoch boundary whenever A > 1 (``t = step + i`` at
    train.py:302 with i a raw loader index), a bookkeeping bug we do not
    replicate (it only perturbs the first warmup epochs).
    """

    def microbatch_loss(params, batch_stats, mb, rng):
        logits, new_stats = _apply(model, params, batch_stats, mb["image"], True, rng)
        loss = L.mix_loss(
            logits, mb["label1"], mb["label2"], mb["ratio"], eps=label_smoothing
        )
        prec1, prec5 = accuracy(logits, mb["label1"])
        return loss, (new_stats, {"loss": loss, "prec1": prec1, "prec5": prec5})

    grad_fn = jax.value_and_grad(microbatch_loss, has_aux=True)

    def train_step(state: TrainState, batch: dict, rng: jax.Array):
        rng = jax.random.fold_in(rng, state.step)
        has_ema = state.ema_params is not None
        pre_ema = state.ema_params
        pre_ema_bn = state.ema_batch_stats
        # t in LOADER batches (reference applies EMA once per loader batch,
        # train.py:301-316); t0 = batches consumed before this step
        t0 = state.step * grad_accumulation

        def lerp_with(decay):
            return lambda e, p: e * decay + p.astype(e.dtype) * (1.0 - decay)

        if grad_accumulation > 1:
            split = lambda x: x.reshape((grad_accumulation, -1) + x.shape[1:])
            microbatches = jax.tree.map(split, batch)
            track_bn = has_ema and state.ema_batch_stats is not None

            def scan_body(carry, mb):
                grads_acc, stats, ema_bn, i = carry
                (loss, (new_stats, metrics)), grads = grad_fn(
                    state.params, stats, mb, jax.random.fold_in(rng, i)
                )
                grads_acc = jax.tree.map(jnp.add, grads_acc, grads)
                if track_bn:
                    # pre-boundary microbatches lerp the EMA-BN against the
                    # INTERMEDIATE running stats (reference train.py:301-316:
                    # accumulate() runs every loader batch, and BN stats have
                    # already advanced in that batch's forward); the boundary
                    # microbatch (i == A-1) defers to the post-step lerp below
                    d = jnp.where(i < grad_accumulation - 1,
                                  ema_decay_schedule(ema, t0 + i), 1.0)
                    ema_bn = jax.tree.map(lerp_with(d), ema_bn, new_stats)
                return (grads_acc, new_stats, ema_bn, i + 1), metrics

            zero_grads = jax.tree.map(jnp.zeros_like, state.params)
            (grads, new_stats, pre_ema_bn, _), metrics = jax.lax.scan(
                scan_body,
                (zero_grads, state.batch_stats, pre_ema_bn, 0),
                microbatches,
            )
            grads = jax.tree.map(lambda g: g / grad_accumulation, grads)
            metrics = jax.tree.map(jnp.mean, metrics)
            if has_ema:
                # params are constant across the A-1 pre-boundary lerps, so
                # their composition is one lerp with the scalar decay product
                ks = jnp.arange(grad_accumulation - 1)
                d_pre = jnp.prod(ema_decay_schedule(ema, t0 + ks))
                pre_ema = jax.tree.map(lerp_with(d_pre), pre_ema, state.params)
        else:
            (loss, (new_stats, metrics)), grads = grad_fn(
                state.params, state.batch_stats, batch, rng
            )

        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)

        new_ema = pre_ema
        new_ema_bn = pre_ema_bn
        if has_ema:
            # the boundary lerp runs AFTER optimizer.step() in the reference
            # loop (train.py:296-316): toward the UPDATED params
            decay = ema_decay_schedule(ema, t0 + grad_accumulation - 1)
            lerp = lerp_with(decay)
            new_ema = jax.tree.map(lerp, pre_ema, new_params)
            if pre_ema_bn is not None:
                # reference EMA-lerps running_mean/running_var with the same
                # warmup-aware decay (train_util.py:78-84:
                # buf1.mul_(decay).add_(buf2, alpha=1-decay)); flax batch_stats
                # leaves are exactly the mean/var buffers
                new_ema_bn = jax.tree.map(lerp, pre_ema_bn, new_stats)

        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            opt_state=new_opt_state,
            batch_stats=new_stats,
            ema_params=new_ema,
            ema_batch_stats=new_ema_bn,
        )
        metrics = dict(metrics)
        metrics["grad_norm"] = optax.global_norm(grads)
        return new_state, metrics

    return train_step


def make_eval_step(model, use_ema: bool = False) -> Callable:
    """Validation step (reference: train.py:335-386): CE loss + top-1/5.

    Returns per-batch sums and the count so the caller can aggregate exactly
    like the reference's cross-rank reduce_dict + Meter normalization.
    ``batch["weight"]`` (optional, [B] of 0/1) zero-weights wrap-padding
    rows the loader appends to the final ragged batch.
    """

    def eval_step(state: TrainState, batch: dict):
        params = state.ema_params if use_ema else state.params
        stats = state.ema_batch_stats if (use_ema and state.ema_batch_stats is not None) \
            else state.batch_stats
        # eval is never differentiated → layer1 (one custom call per layer)
        # replaces the layer kernel for the transformer families (PERF.md
        # round 4, fwd-only stack A/B)
        with _ops.forward_only():
            logits, _ = _apply(model, params, stats, batch["image"], False,
                               None)
        b = batch["image"].shape[0]
        w = batch.get("weight")
        if w is None:
            w = jnp.ones((b,), jnp.float32)
        losses = L.cross_entropy_loss(logits, batch["label1"], reduction="none")
        ranks = jnp.argsort(-logits, axis=-1)[:, :5]
        hit = ranks == batch["label1"][:, None]
        hit1 = jnp.any(hit[:, :1], axis=-1).astype(jnp.float32)
        hit5 = jnp.any(hit, axis=-1).astype(jnp.float32)
        return {
            "loss": jnp.sum(losses * w),
            "prec1": 100.0 * jnp.sum(hit1 * w),
            "prec5": 100.0 * jnp.sum(hit5 * w),
            "n": jnp.sum(w),
        }

    return eval_step
