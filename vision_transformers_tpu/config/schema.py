"""Pydantic schema for the training configuration.

Mirrors the reference's ``config.py`` (reference: config.py:27-102) field for
field so existing ``.conf`` files drive this framework unchanged:
``Progressive`` (config.py:27-39), ``DINO`` (config.py:42-56), ``Training``
(config.py:59-90) and ``ImageNetConfig`` (config.py:93-102).  ``arch``,
``optimizer``, ``scheduler`` and ``checker`` blocks are discriminated unions
resolved through the type-tag registry (see ``registry.py``).

TPU-specific additions (all defaulted so reference confs stay valid):
``n_device`` replaces ``--n_gpu``; ``mesh`` describes the device mesh axes;
``precision`` selects the compute dtype (bf16 by default, the TPU-native
choice — the reference's ``fp16`` flag maps onto it).
"""

from __future__ import annotations

from typing import Any, List, Literal, Optional, Tuple

from pydantic import BaseModel, ConfigDict, Field, field_validator

from . import hocon, registry

__all__ = [
    "Progressive",
    "DINOTask",
    "Training",
    "ImageNetConfig",
    "load_config",
    "load_arg_config",
]


class _Base(BaseModel):
    model_config = ConfigDict(extra="forbid", validate_assignment=True)


class Progressive(_Base):
    """Progressive-training schedule (reference: config.py:27-39)."""

    step: int = 0
    train_sizes: Tuple[int, int] = (128, 300)
    valid_sizes: Tuple[int, int] = (128, 300)
    randaug_layers: Tuple[int, int] = (2, 2)
    randaug_magnitudes: Tuple[float, float] = (5, 15)
    mixups: Tuple[float, float] = (0, 0)
    cutmixes: Tuple[float, float] = (0, 1)
    dropouts: Tuple[float, float] = (0.1, 0.3)
    drop_paths: Tuple[float, float] = (0.2, 0.2)
    grad_accumulation: Optional[List[int]] = None
    verbose: bool = True


class DINOTask(_Base):
    """DINO self-distillation task settings (reference: config.py:42-56)."""

    type: str = "dino"
    global_crop_size: int = 224
    local_crop_size: int = 96
    global_crop_scale: Tuple[float, float] = (0.4, 1.0)
    local_crop_scale: Tuple[float, float] = (0.05, 0.4)
    n_local_crop: int = 8
    student_drop_path: float = 0.1
    warmup_teacher_temperature: float = 0.04
    teacher_temperature: float = 0.07
    warmup_teacher_temperature_epoch: int = 30
    teacher_momentum: float = 0.9
    weight_decay_end: float = 0.4
    freeze_last_layer: int = 1


class DataLoaderConf(_Base):
    """Loader settings (reference: tensorfn DataLoader, config.py:90)."""

    batch_size: int = 256
    num_workers: int = 4
    drop_last: bool = True
    prefetch: int = 2


class Training(_Base):
    """Training hyper-parameters (reference: config.py:59-90)."""

    optimizer: Any
    scheduler: Any

    base_lr: float
    weight_decay: float
    wd_skip: str
    epoch: int
    ema: float = 0.0
    ema_bn: bool = False
    agc: float = 0.0
    train_size: int = 224
    valid_size: int = 224

    randaug_layer: int = 0
    randaug_magnitude: float = 5.0
    randaug_increasing: bool = False
    randaug_magnitude_std: float = 0.0
    randaug_cutout: int = 40

    erasing: float = 0.0

    mixup: float = 0.0
    cutmix: float = 0.0
    mix_before_aug: bool = True

    # where RandAugment/mix run: "device" (jitted on-accelerator program) or
    # "host" (PIL in the loader's thread pool — the reference's own backend;
    # overlaps with device compute on multi-core hosts, see PERF.md)
    augment_backend: Literal["device", "host"] = "device"

    clip_grad_norm: float = 0.0
    grad_accumulation: int = 1

    progressive: Progressive = Progressive()

    dataloader: DataLoaderConf = DataLoaderConf()

    @field_validator("optimizer", mode="before")
    @classmethod
    def _check_optimizer(cls, v: Any) -> Any:
        return registry.build("optimizer", v)

    @field_validator("scheduler", mode="before")
    @classmethod
    def _check_scheduler(cls, v: Any) -> Any:
        return registry.build("scheduler", v)


class MeshConf(_Base):
    """Device-mesh layout: sizes of the named sharding axes.

    ``data`` is the batch (data-parallel) axis; ``model`` an optional
    tensor-parallel axis.  ``-1`` on ``data`` means "all remaining devices".
    """

    data: int = -1
    model: int = 1


class ImageNetConfig(_Base):
    """Top-level config (reference: config.py:93-102)."""

    arch: Any
    training: Training
    dataset_path: str
    task: Optional[DINOTask] = None

    log_freq: int = 10
    checker: Any = None
    fp16: bool = False
    logger: str = "rich"

    # --- TPU-native extensions (defaulted; absent from reference confs) ---
    n_device: int = 0  # 0 = all visible devices
    mesh: MeshConf = MeshConf()
    precision: str = "bf16"  # compute dtype: bf16 | f32
    seed: int = 0
    data_backend: str = "auto"  # auto | records | synthetic
    # checkpoint dir to restore, or "auto" = newest epoch-/preempt- save in
    # the checker's local storage (superset of reference: no resume there)
    resume: Optional[str] = None
    profile_dir: Optional[str] = None  # write a jax.profiler trace of early steps
    # start from pretrained weights: a converted orbax variables dir
    # (convert.py) or a reference torch .pt (converted on the fly);
    # "PATH:key" selects model/ema/student/teacher inside a .pt
    finetune: Optional[str] = None

    @field_validator("arch", mode="before")
    @classmethod
    def _check_arch(cls, v: Any) -> Any:
        return registry.build("model", v)

    @field_validator("checker", mode="before")
    @classmethod
    def _check_checker(cls, v: Any) -> Any:
        if v is None:
            v = {"type": "checker"}
        if isinstance(v, dict):
            v = dict(v)
            v.setdefault("type", "checker")
        return registry.build("checker", v)

    def dict(self, **kwargs: Any) -> dict:  # parity with reference conf.dict() (train.py:214)
        return self.model_dump(**kwargs)


def load_config(path: str, overrides: Optional[List[str]] = None) -> ImageNetConfig:
    """Load + validate a ``.conf`` file with optional ``key=value`` overrides."""
    raw = hocon.load(path)
    if overrides:
        hocon.apply_overrides(raw, list(overrides))
    return ImageNetConfig.model_validate(raw)


def load_arg_config(argv: Optional[List[str]] = None) -> ImageNetConfig:
    """CLI-compatible loader (reference: tensorfn.load_arg_config, train.py:392).

    Usage: ``train.py --conf FILE [--n_device N] [key=value ...]``.
    ``--n_gpu`` is accepted as an alias of ``--n_device`` so reference command
    lines keep working.
    """
    import argparse

    parser = argparse.ArgumentParser()
    parser.add_argument("--conf", required=True)
    parser.add_argument("--n_device", "--n_gpu", type=int, default=0, dest="n_device")
    parser.add_argument("--n_machine", type=int, default=1)
    parser.add_argument("--machine_rank", type=int, default=0)
    parser.add_argument("--dist_url", type=str, default=None)
    parser.add_argument("overrides", nargs="*")
    args = parser.parse_args(argv)

    conf = load_config(args.conf, args.overrides)
    if args.n_device:
        conf.n_device = args.n_device
    return conf
