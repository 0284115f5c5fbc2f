"""Learning-rate schedules as pure ``step -> lr`` functions.

The reference drives LR through tensorfn's PhaseScheduler, whose semantics are
mirrored by the (dead but spec-defining) ``lr_scheduler.py`` in the reference
repo: ``cycle_scheduler`` = warmup anneal + cosine decay
(reference: lr_scheduler.py:146-166) and ``step_scheduler``
(reference: lr_scheduler.py:169-192).  ``exp_epoch`` decays by ``gamma`` every
``epoch`` epochs after a linear warmup (reference: config/efficientnetv2-s.conf:45-53,
factory.py:52-56).

On TPU the scheduler must be a jit-traceable function of the step counter (a
stateful ``.step()`` object would force host round-trips every step), so every
schedule here is an ``optax``-style callable ``f(count) -> lr`` built from
``jnp`` ops.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ..config.registry import TypedConfig, register

__all__ = [
    "CycleScheduler",
    "ExpEpochScheduler",
    "StepScheduler",
    "ConstantScheduler",
    "make_schedule",
    "cosine_schedule",
]


def _anneal_cos(start, end, proportion):
    return end + (start - end) / 2 * (jnp.cos(jnp.pi * proportion) + 1)


def _anneal_linear(start, end, proportion):
    return start + proportion * (end - start)


@register("scheduler", "cycle")
class CycleScheduler(TypedConfig):
    """Warmup → (plateau) → cosine decay (reference: lr_scheduler.py:146-166)."""

    lr: float
    warmup: int = 0  # epochs; converted to steps by make_schedule via epoch_len
    plateau: int = 0
    initial_multiplier: float = 4e-2
    final_multiplier: float = 1e-5
    decay: Tuple[str, str] = ("cos", "cos")

    def make(self, lr: float, n_iter: int, warmup: int):
        plateau = self.plateau
        decay_iter = max(n_iter - warmup - plateau, 1)
        init_lr = lr * self.initial_multiplier
        final_lr = lr * self.final_multiplier
        anneal = {"cos": _anneal_cos, "linear": _anneal_linear}
        warm_fn = anneal[self.decay[0]]
        decay_fn = anneal[self.decay[1]]

        # Exact PhaseScheduler semantics (lr_scheduler.py:114-131): step()
        # increments phase_step BEFORE evaluating, and a phase only advances
        # once phase_step EXCEEDS phase_iter — so each phase emits
        # phase_iter + 1 values, the last at proportion (iter+1)/iter
        # (slightly past the endpoint), and later phases start that many
        # calls later.  After every phase is exhausted, step() returns
        # without touching the lr, freezing it at the last emitted value.
        warm_calls = warmup + 1 if warmup > 0 else 0
        plat_calls = plateau + 1 if plateau > 0 else 0

        def schedule(count):
            # count is the optax update index (0-based); the reference calls
            # scheduler.step() immediately before optimizer.step()
            # (train.py:296-297), so optimizer step t sees call number t+1
            n = jnp.asarray(count, jnp.float32) + 1.0
            in_warm = warm_fn(init_lr, lr, n / max(warmup, 1))
            t = jnp.clip((n - warm_calls - plat_calls) / decay_iter,
                         0, (decay_iter + 1) / decay_iter)
            in_decay = decay_fn(lr, final_lr, t)
            out = jnp.where(n <= warm_calls, in_warm, in_decay)
            if plateau > 0:
                out = jnp.where(
                    (n > warm_calls) & (n <= warm_calls + plat_calls), lr, out
                )
            return out

        return schedule


@register("scheduler", "exp_epoch")
class ExpEpochScheduler(TypedConfig):
    """Exponential decay every ``epoch`` epochs with linear warmup.

    Matches the EfficientNet recipe the reference configures at
    config/efficientnetv2-s.conf:45-53 (gamma 0.97 every 2.4 epochs, 5 warmup
    epochs from ``lr * warmup_multiplier``).
    """

    lr: float
    epoch: float = 2.4  # decay interval, in epochs
    max_iter: int = 0  # total epochs (bookkeeping only)
    gamma: float = 0.97
    warmup: int = 0  # epochs
    warmup_multiplier: float = 1e-8

    def make(self, lr: float, epoch_len: int, warmup: int):
        interval = max(self.epoch * epoch_len, 1.0)

        def schedule(count):
            count = jnp.asarray(count, jnp.float32)
            warm = _anneal_linear(
                lr * self.warmup_multiplier, lr, jnp.clip((count + 1) / max(warmup, 1), 0, 1)
            )
            decayed = lr * self.gamma ** jnp.floor((count - warmup) / interval)
            return jnp.where(count < warmup, warm, decayed)

        return schedule


@register("scheduler", "step")
class StepScheduler(TypedConfig):
    """Piecewise-constant decay at milestones (reference: lr_scheduler.py:169-192).

    Matches the reference phase construction exactly: a linear warmup phase,
    then one constant phase per zip pair — lengths ``m0-warmup, m1-m0, ...,
    1`` at values ``lr·γ^0 .. lr·γ^k`` — each run through PhaseScheduler,
    whose per-phase +1 call (see CycleScheduler) shifts every later milestone
    boundary by one more step; after the final 2-call phase the lr freezes at
    ``lr·γ^k``."""

    lr: float
    milestones: list[int]
    gamma: float = 0.1
    warmup: int = 0
    warmup_multiplier: float = 4e-2

    def make(self, lr: float, n_iter: int, warmup: int):
        # phase call-boundaries, precomputed statically
        ms = list(self.milestones)
        if not ms:  # degenerate conf: constant lr after the warmup
            ms = [max(n_iter, warmup + 1)]
        if any(b <= a for a, b in zip([warmup] + ms, ms)):
            # the reference's phase construction silently produces
            # negative-length phases here (lr_scheduler.py:180-189) — a
            # loud error beats a silently-garbage schedule.  Note warmup is
            # in STEPS (make_schedule already scaled epochs by epoch_len);
            # milestones must be in steps too, and increasing.
            raise ValueError(
                f"step scheduler milestones {ms} must be strictly "
                f"increasing and all beyond the warmup ({warmup} steps)")
        lengths = []
        if warmup > 0:
            lengths.append(warmup)
        for current, forward in zip([warmup] + ms, ms + [ms[-1] + 1]):
            lengths.append(forward - current)
        # cumulative last-call number of each phase (+1 call per phase)
        bounds = np.cumsum([l + 1 for l in lengths]).astype(np.float32)
        has_warmup = warmup > 0
        # constant value of each phase (warmup handled separately)
        n_const = len(lengths) - (1 if has_warmup else 0)
        values = np.asarray([lr * self.gamma ** j for j in range(n_const)],
                            np.float32)
        const_bounds = jnp.asarray(bounds[1:] if has_warmup else bounds)
        values = jnp.asarray(values)

        def schedule(count):
            n = jnp.asarray(count, jnp.float32) + 1.0
            idx = jnp.minimum(jnp.sum(n > const_bounds), n_const - 1)
            out = values[idx]
            if has_warmup:
                warm = _anneal_linear(lr * self.warmup_multiplier, lr,
                                      n / max(warmup, 1))
                out = jnp.where(n <= bounds[0], warm, out)
            return out

        return schedule


@register("scheduler", "constant")
class ConstantScheduler(TypedConfig):
    lr: float

    def make(self, lr: float, **_):
        return lambda count: jnp.full((), lr, jnp.float32)


def make_schedule(train_conf, epoch_len: int):
    """Build the LR schedule from a Training config (reference: factory.py:48-59).

    LR follows the linear-scaling rule ``base_lr * batch / 256``
    (reference: factory.py:42-45).
    """
    sched = train_conf.scheduler
    warmup = int(getattr(sched, "warmup", 0) * epoch_len)
    n_iter = epoch_len * train_conf.epoch
    lr = train_conf.base_lr * train_conf.dataloader.batch_size / 256

    if sched.type == "exp_epoch":
        return sched.make(lr=lr, epoch_len=epoch_len, warmup=warmup)
    if sched.type == "constant":
        return sched.make(lr=lr)
    return sched.make(lr=lr, n_iter=n_iter, warmup=warmup)


def cosine_schedule(base: float, final: float, step: int, warmup: int = 0,
                    warmup_start: float = 0.0) -> list[float]:
    """Precomputed cosine schedule list (reference: train_util.py:6-22).

    Used for DINO weight-decay / teacher-momentum schedules
    (reference: train_dino.py:135-142).
    """
    out = []
    if warmup > 0:
        if warmup == 1:
            out.append(warmup_start)
        else:
            out.extend(
                warmup_start + (base - warmup_start) * i / (warmup - 1)
                for i in range(warmup)
            )
    n = step - warmup
    out.extend(final + 0.5 * (base - final) * (1 + math.cos(math.pi * i / n)) for i in range(n))
    return out
