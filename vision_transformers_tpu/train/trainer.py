"""Classification training driver (reference: train.py:89-386).

One process per *host* (JAX runtime model), sharded jit over the device mesh
instead of one process per GPU + DDP.  The epoch loop mirrors the reference:
train epoch → validation (EMA model if enabled) → checker.log → checkpoint →
progressive-stage advance (re-jit at the new image size, reference
train.py:221-233).

Data backends:
- ``records``  — packed .rec/.idx files (preprocess.py), host decode/crop
  threads + jitted on-device augmentation (data/pipeline.py)
- ``synthetic`` — fake batches for smoke tests and benchmarks
- ``auto``      — records when ``<dataset_path>/train.rec`` exists, else
  synthetic
"""

from __future__ import annotations

import os
import time
from types import SimpleNamespace
from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config.schema import ImageNetConfig
from ..data.factory import stage_settings
from ..parallel import mesh as meshlib
from ..utils import preempt
from ..utils.logging import get_logger, is_primary
from . import engine
from .optim import make_optimizer
from .schedule import make_schedule

__all__ = ["train_classification", "Meter"]


class Meter:
    """Running average (reference: train_util.py:34-50)."""

    def __init__(self):
        self.sum = 0.0
        self.count = 0.0
        self.value = 0.0

    def update(self, value: float, n: float = 1.0):
        self.value = value
        self.sum += value * n
        self.count += n

    @property
    def avg(self) -> float:
        return self.sum / max(self.count, 1e-12)


def _compute_dtype(conf: ImageNetConfig):
    if conf.precision == "bf16" or conf.fp16:
        return jnp.bfloat16
    return jnp.float32


def _resolve_backend(conf: ImageNetConfig, valid_only: bool = False) -> str:
    if conf.data_backend != "auto":
        return conf.data_backend
    names = ("valid.rec", "val.rec") if valid_only else ("train.rec",)
    if any(os.path.exists(os.path.join(conf.dataset_path, n)) for n in names):
        return "records"
    return "synthetic"


def _make_stage_loaders(conf: ImageNetConfig, settings,
                        valid_only: bool = False) -> Tuple[Callable, Callable, int]:
    """(train_iter(epoch), valid_iter(), epoch_len) for one progressive stage.

    ``valid_only`` (evaluate.py) skips every train-side construction — the
    train split need not even exist — and returns ``(None, valid_iter, 0)``.
    """
    training = conf.training
    batch = training.dataloader.batch_size
    n_class = getattr(conf.arch, "n_class", 1000)
    backend = _resolve_backend(conf, valid_only)

    if backend == "synthetic":
        from ..data.synthetic import SyntheticDataset

        valid_ds = SyntheticDataset(batch * 2, settings.valid_size, n_class,
                                    seed=conf.seed + 1, normalized=True)
        valid_iter = lambda: valid_ds.batches(batch)
        if valid_only:
            return None, valid_iter, 0
        n_train = max(batch * 4, 64)
        train_ds = SyntheticDataset(n_train, settings.train_size, n_class,
                                    seed=conf.seed, normalized=True)
        epoch_len = max(n_train // batch, 1)
        def synthetic_iter(epoch: int, skip: int = 0):
            for i, b in enumerate(train_ds.batches(batch, seed=epoch)):
                if i >= skip:
                    yield b

        return synthetic_iter, valid_iter, epoch_len

    if backend == "records":
        from ..data.pipeline import (HostLoader, make_device_augment,
                                     make_host_batch_prep, make_valid_prep)
        from ..data.records import RecordDataset

        valid_name = "valid" if os.path.exists(
            os.path.join(conf.dataset_path, "valid.rec")) else "val"
        valid_ds = RecordDataset(os.path.join(conf.dataset_path, valid_name))
        valid_prep_only = make_valid_prep()
        valid_loader_only = HostLoader(
            valid_ds, batch, settings.valid_size, train=False,
            num_workers=training.dataloader.num_workers, drop_last=False)

        def valid_iter():
            for hb in valid_loader_only.epoch(0):
                yield valid_prep_only(jnp.asarray(hb["image"]),
                                      jnp.asarray(hb["label"]),
                                      jnp.asarray(hb["n_valid"]))

        if valid_only:
            return None, valid_iter, 0

        train_ds = RecordDataset(os.path.join(conf.dataset_path, "train"))

        workers = training.dataloader.num_workers
        host_backend = training.augment_backend == "host"
        host_augment = None
        if host_backend:
            host_augment = {"hflip": True}
            if training.mix_before_aug and (settings.mixup > 0 or settings.cutmix > 0):
                host_augment["mix"] = {"mixup": settings.mixup,
                                       "cutmix": settings.cutmix}
            if settings.randaug_layer > 0:
                host_augment["randaug"] = {
                    "n_augment": settings.randaug_layer,
                    "magnitude": settings.randaug_magnitude,
                    "increasing": training.randaug_increasing,
                    "magnitude_std": training.randaug_magnitude_std,
                    "cutout": training.randaug_cutout,
                }
        train_loader = HostLoader(train_ds, batch, settings.train_size, train=True,
                                  num_workers=workers, seed=conf.seed,
                                  host_augment=host_augment)

        if host_backend:
            augment = make_host_batch_prep(
                erasing=training.erasing, mixup=settings.mixup,
                cutmix=settings.cutmix, mix_before_aug=training.mix_before_aug)
        else:
            augment = make_device_augment(
                settings.train_size,
                randaug_layer=settings.randaug_layer,
                randaug_magnitude=settings.randaug_magnitude,
                randaug_increasing=training.randaug_increasing,
                randaug_magnitude_std=training.randaug_magnitude_std,
                randaug_cutout=training.randaug_cutout,
                erasing=training.erasing,
                mixup=settings.mixup,
                cutmix=settings.cutmix,
                mix_before_aug=training.mix_before_aug,
            )
        aug_key = jax.random.PRNGKey(conf.seed + 17)

        def train_iter(epoch: int, skip: int = 0):
            # exact mid-epoch resume: the loader fast-forwards past consumed
            # batches without decoding them; ``start=skip`` keeps the augment
            # key indices absolute so the remaining batches are identical to
            # an unskipped epoch's
            for i, hb in enumerate(train_loader.epoch(epoch, skip),
                                   start=skip):
                key = jax.random.fold_in(jax.random.fold_in(aug_key, epoch), i)
                if host_backend:
                    labels = jnp.asarray(hb["label"])
                    label2 = jnp.asarray(hb.get("label2", hb["label"]))
                    ratio = jnp.asarray(hb.get("ratio",
                                               np.ones(batch, np.float32)))
                    yield augment(key, jnp.asarray(hb["image"]), labels,
                                  label2, ratio)
                else:
                    yield augment(key, jnp.asarray(hb["image"]),
                                  jnp.asarray(hb["label"]))

        return train_iter, valid_iter, max(len(train_loader), 1)

    raise ValueError(f"unknown data_backend {conf.data_backend!r}")


def _resolve_resume(resume: Optional[str], checker, logger) -> Optional[str]:
    """``resume=auto`` → newest epoch-/preempt- checkpoint in the checker's
    local storage (None when empty: fresh start); any other value is a
    checkpoint path used verbatim."""
    if resume != "auto":
        return resume
    from . import checkpoint as ckpt

    for storage in checker.storages:
        directory = getattr(storage, "path", None)
        if directory is None:
            continue
        found = ckpt.find_resume_checkpoint(directory)
        if found:
            return found
    logger.info("resume=auto: no checkpoint found, starting fresh")
    return None


def _restore_resume(resume_path: str, state, logger):
    """Restore ``{state, epoch[, step_in_epoch]}`` → (state, start_epoch,
    skip_steps).

    ``step_in_epoch`` (written by mid-epoch preemption saves) is how many
    leading batches of the interrupted epoch the restored state has already
    consumed.  The loaders are deterministic per (seed, epoch), so skipping
    exactly those batches makes the resume EXACT — no batch is trained
    twice, and the resumed run's final state matches an uninterrupted run's
    bit-for-bit (pinned by tests/test_preempt.py).  Checkpoints written
    before this key existed restore with skip 0 (the old replay-the-epoch
    behavior)."""
    from . import checkpoint as ckpt

    try:
        restored = ckpt.restore_checkpoint(
            resume_path, {"state": state, "epoch": 0, "step_in_epoch": 0})
        skip = int(restored["step_in_epoch"])
    except ValueError as e:
        # ONLY the precise structure mismatch of a pre-step_in_epoch
        # checkpoint falls back — anything else (transient FS failure, wrong
        # arch) must propagate: a silent skip=0 would retrain consumed
        # batches and, in multi-process runs, desynchronize the preempt-poll
        # collective on whichever process fell back
        if "step_in_epoch" not in str(e):
            raise
        logger.info(
            "checkpoint predates step_in_epoch — resuming at the epoch "
            "start (the interrupted epoch replays)")
        restored = ckpt.restore_checkpoint(resume_path,
                                           {"state": state, "epoch": 0})
        skip = 0
    start_epoch = int(restored["epoch"]) + 1
    logger.info(
        f"resumed from {resume_path} at epoch {start_epoch}"
        + (f" step {skip} (exact mid-epoch resume)" if skip else ""))
    return restored["state"], start_epoch, skip


# poll cadence for cooperative preemption (utils/preempt.py).  A collective
# in multi-process runs — every process calls it at the same global step.
# Epoch boundaries also poll, so short epochs stay responsive.
PREEMPT_CHECK_STEPS = int(os.environ.get("VTX_PREEMPT_CHECK_STEPS", "32"))


def train_classification(conf: ImageNetConfig) -> dict:
    """Run the full classification recipe; returns final metrics."""
    logger = get_logger()
    mesh = meshlib.make_mesh(conf.n_device, conf.mesh.model)
    from .. import ops as _ops

    _ops.tp_kernel_guard(conf.mesh.model, logger)
    dtype = _compute_dtype(conf)
    n_data = mesh.shape[meshlib.DATA_AXIS]
    logger.info(
        f"mesh: {dict(mesh.shape)}; devices: {len(mesh.devices.flat)}; dtype: {dtype.__name__}"
    )

    training = conf.training
    batch = training.dataloader.batch_size
    n_class = getattr(conf.arch, "n_class", 1000)
    prog = training.progressive
    checker = conf.checker.make()
    rng = jax.random.PRNGKey(conf.seed)

    def check_divisible(grad_accum: int):
        if batch % (n_data * grad_accum) != 0:
            raise ValueError(
                f"batch_size {batch} must be divisible by data-parallel devices "
                f"({n_data}) x grad_accumulation ({grad_accum})"
            )

    settings = stage_settings(training, 0)
    check_divisible(settings.grad_accumulation)

    with mesh:
        # --- initial state (params independent of dropout overrides) ---
        model = conf.arch.make(dtype=dtype, drop_path=settings.drop_path,
                               dropout=settings.dropout) \
            if settings.dropout is not None or settings.drop_path is not None \
            else conf.arch.make(dtype=dtype)
        init_shape = (2, settings.train_size, settings.train_size, 3)
        params_shape = jax.eval_shape(
            lambda: model.init(rng, jnp.zeros(init_shape, jnp.float32))
        )["params"]

        train_iter, valid_iter, epoch_len = _make_stage_loaders(conf, settings)
        schedule = make_schedule(training, epoch_len)
        tx = make_optimizer(training, params_shape, schedule)

        state = engine.create_train_state(
            rng, model, init_shape, tx, ema=training.ema, ema_bn=training.ema_bn
        )
        if conf.finetune:
            from ..utils.torch_convert import load_pretrained_variables

            pre = load_pretrained_variables(conf.finetune, conf.arch)
            params = jax.tree.map(jnp.asarray, pre["params"])
            stats = pre.get("batch_stats")
            stats = jax.tree.map(jnp.asarray, stats) if stats else state.batch_stats
            state = state.replace(
                params=params,
                batch_stats=stats,
                ema_params=jax.tree.map(jnp.copy, params)
                if state.ema_params is not None else None,
                ema_batch_stats=jax.tree.map(jnp.copy, stats)
                if state.ema_batch_stats is not None else None,
            )
            logger.info(f"loaded pretrained weights from {conf.finetune}")
        state = jax.device_put(state, meshlib.replicated(mesh))

        def build_step_fns(model, grad_accum):
            step_fn = engine.make_train_step(
                model, tx, grad_accumulation=grad_accum,
                label_smoothing=0.1, ema=training.ema, n_class=n_class,
            )
            train_step = jax.jit(step_fn, donate_argnums=(0,))
            eval_step = jax.jit(engine.make_eval_step(model, use_ema=training.ema > 0))
            return train_step, eval_step

        train_step, eval_step = build_step_fns(model, settings.grad_accumulation)

        from . import checkpoint as ckpt

        start_epoch = 0
        resume_skip = 0
        resume_path = _resolve_resume(conf.resume, checker, logger)
        if resume_path:
            state, start_epoch, resume_skip = _restore_resume(
                resume_path, state, logger)

        current_stage = 0 if prog.step <= 0 else min(
            start_epoch // prog.step, max(training.epoch // prog.step, 1) - 1)
        if prog.step > 0 and current_stage > 0:
            settings = stage_settings(training, current_stage)
            check_divisible(settings.grad_accumulation)
            model = conf.arch.make(dtype=dtype, drop_path=settings.drop_path,
                                   dropout=settings.dropout)
            train_iter, valid_iter, epoch_len = _make_stage_loaders(conf, settings)
            train_step, eval_step = build_step_fns(model, settings.grad_accumulation)

        final_metrics: dict = {}
        poll_preempt = preempt.make_global_poller()
        for epoch in range(start_epoch, training.epoch):
            # ---- train ----
            # per-step wall/data meters (reference train.py:251-252,264,271)
            t0 = time.perf_counter()
            # exact mid-epoch resume: the restored state already consumed the
            # first ``skip`` batches of this epoch — skip them (the loader
            # order is deterministic per (seed, epoch)) instead of training
            # them twice; n_steps stays the ABSOLUTE position in the epoch so
            # log cadence, preempt polls, and a second preemption stay exact
            skip = resume_skip if epoch == start_epoch else 0
            data_m, img_count, n_steps = Meter(), 0, skip
            # epoch loss accumulates ON-DEVICE (lazy adds, no per-step host
            # sync); one float() fetch at epoch end gives the true epoch mean
            # the reference Meter reports (reference train.py:277-281)
            loss_sum = None
            profiling = bool(conf.profile_dir) and epoch == start_epoch
            if profiling:
                jax.profiler.start_trace(conf.profile_dir)
            # intra-epoch progress every ``log_freq`` steps (reference
            # train.py:321-330).  The logged loss is the LAGGING device value
            # (step i-1's metrics, fetched while step i runs) so the log adds
            # no pipeline stall — step i-1's result is already materialized
            # by the time step i has been dispatched.
            log_freq = conf.log_freq if is_primary() else 0
            prev_metrics = None
            t_fetch = time.perf_counter()
            for batch_data in train_iter(epoch, skip):
                data_m.update(time.perf_counter() - t_fetch)
                batch_data = meshlib.shard_batch(mesh, batch_data)
                if log_freq and n_steps % log_freq == 0 and prev_metrics is not None:
                    lag_loss = float(prev_metrics["loss"])
                    lag_lr = float(schedule(jnp.maximum(state.step - 1, 0)))
                    logger.info(
                        f"epoch {epoch}; {n_steps}/{epoch_len}; "
                        f"loss: {lag_loss:.5f}; lr: {lag_lr:.5f}; "
                        f"img/s: {img_count / max(time.perf_counter() - t0, 1e-9):.1f}; "
                        f"data: {data_m.avg:.4f}"
                    )
                state, metrics = train_step(state, batch_data, rng)
                prev_metrics = metrics
                loss_sum = metrics["loss"] if loss_sum is None \
                    else loss_sum + metrics["loss"]
                img_count += batch
                n_steps += 1
                if profiling and img_count >= batch * 8:
                    jax.profiler.stop_trace()
                    profiling = False
                    logger.info(f"profiler trace written to {conf.profile_dir}")
                if n_steps % PREEMPT_CHECK_STEPS == 0 and poll_preempt():
                    if profiling:
                        jax.profiler.stop_trace()
                    logger.info(
                        f"preemption requested: checkpointing at epoch {epoch} "
                        f"step {n_steps} and exiting"
                    )
                    # stores epoch-1 so resume re-runs the interrupted epoch.
                    # A failed save must NOT exit 0 claiming success —
                    # raise_on_error propagates (disk-full etc. crashes the
                    # handoff visibly instead of silently losing the state)
                    checker.checkpoint(
                        {"state": jax.device_get(state), "epoch": epoch - 1,
                         "step_in_epoch": n_steps},
                        f"preempt-{epoch + 1:03d}", raise_on_error=True,
                    )
                    ckpt.wait_for_checkpoints()
                    logger.info("preemption checkpoint committed")
                    return final_metrics
                t_fetch = time.perf_counter()
            if profiling:
                jax.profiler.stop_trace()
            # guard: a dataset shard smaller than the batch with drop_last
            # yields an empty epoch — report NaN rather than crash
            executed = n_steps - skip
            train_loss = float(loss_sum) / executed if executed else float("nan")
            dt = time.perf_counter() - t0
            lr = float(schedule(jnp.maximum(state.step - 1, 0)))

            # ---- valid (EMA model when enabled; reference train.py:192-198) ----
            # sums stay ON-DEVICE across batches (lazy adds) — one host fetch
            # after the loop instead of 4 syncs per batch
            dev_sums = None
            for batch_data in valid_iter():
                batch_data = meshlib.shard_batch(mesh, batch_data)
                out = eval_step(state, batch_data)
                dev_sums = out if dev_sums is None else \
                    jax.tree.map(jnp.add, dev_sums, out)
            sums = {k: float(v) for k, v in dev_sums.items()} if dev_sums \
                else {"loss": 0.0, "prec1": 0.0, "prec5": 0.0, "n": 0.0}
            n = max(sums["n"], 1.0)
            final_metrics = {
                "epoch": epoch,
                "loss": train_loss,
                "valid_loss": sums["loss"] / n,
                "prec1": sums["prec1"] / n,
                "prec5": sums["prec5"] / n,
                "lr": lr,
                "images_per_sec": img_count / dt,
                "data_time": data_m.avg,
            }
            if is_primary():
                checker.log(step=epoch, **final_metrics)

            epoch_ckpt_ok = True
            try:
                checker.checkpoint(
                    {"state": jax.device_get(state), "epoch": epoch,
                     "step_in_epoch": 0},
                    f"epoch-{epoch + 1:03d}",
                )
            except KeyboardInterrupt:
                raise
            except Exception as e:  # reference also survives ckpt failure
                epoch_ckpt_ok = False
                logger.info(f"checkpoint failed at epoch {epoch}: {e!r}")

            # epoch-boundary preemption poll: the epoch checkpoint above is
            # already the resume point — unless it failed, in which case the
            # handoff must not exit 0 without a committed save (retry with
            # errors propagating)
            if preempt.requested_global():
                logger.info(f"preemption requested at epoch {epoch} boundary")
                if not epoch_ckpt_ok:
                    checker.checkpoint(
                        {"state": jax.device_get(state), "epoch": epoch,
                         "step_in_epoch": 0},
                        f"epoch-{epoch + 1:03d}", raise_on_error=True,
                    )
                ckpt.wait_for_checkpoints()
                logger.info(f"epoch {epoch} checkpoint committed, exiting")
                return final_metrics

            # ---- progressive stage advance (reference train.py:221-233) ----
            if prog.step > 0 and (epoch + 1) % prog.step == 0:
                next_stage = current_stage + 1
                if next_stage < max(training.epoch // prog.step, 1):
                    current_stage = next_stage
                    settings = stage_settings(training, current_stage)
                    check_divisible(settings.grad_accumulation)
                    model = conf.arch.make(dtype=dtype, drop_path=settings.drop_path,
                                           dropout=settings.dropout)
                    train_iter, valid_iter, epoch_len = _make_stage_loaders(conf, settings)
                    train_step, eval_step = build_step_fns(
                        model, settings.grad_accumulation)
                    logger.info(
                        f"progressive: stage {current_stage + 1}, re-jitted at "
                        f"{settings.train_size}px, grad_accum {settings.grad_accumulation}"
                    )

        try:  # commit the last epoch's async checkpoint write
            from . import checkpoint as ckpt

            ckpt.wait_for_checkpoints()
        except Exception as e:
            logger.info(f"final checkpoint commit failed: {e!r}")
        return final_metrics
