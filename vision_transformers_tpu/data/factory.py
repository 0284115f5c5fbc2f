"""Dataset/loader composition + progressive adaptive regularization
(reference: factory.py).

``make_dataset``/``make_dataloader`` compose the records-backed host loaders
with the jitted device-side augmentation (pipeline.py) — the TPU equivalent
of the reference's LMDB + PIL + worker-process stack (factory.py:159-278).

``progressive_adaptive_regularization`` is a faithful port of
factory.py:281-325 (linear lerp of size / randaug / mix / dropout / drop-path
across stages).  The reference's progressive path forgets to thread
``erasing`` through (train.py:45-60 vs factory.py:159-161 — it would
TypeError); here erasing is carried from the base config.
"""

from __future__ import annotations

import math
import os
from types import SimpleNamespace
from typing import Optional, Tuple

__all__ = ["progressive_adaptive_regularization", "lerp", "stage_settings"]


def lerp(start, end, stage, max_stage):
    """(reference: factory.py:281-282)"""
    return start + (end - start) * (stage / (max_stage - 1))


def progressive_adaptive_regularization(
    stage: int,
    max_stage: int,
    train_sizes, valid_sizes,
    randaug_layers, randaug_magnitudes,
    mixups, cutmixes, dropouts, drop_paths,
    verbose: bool = True,
) -> SimpleNamespace:
    """(reference: factory.py:284-325)"""
    out = SimpleNamespace(
        train_size=int(lerp(*train_sizes, stage, max_stage)),
        valid_size=int(lerp(*valid_sizes, stage, max_stage)),
        randaug_layer=int(lerp(*randaug_layers, stage, max_stage)),
        randaug_magnitude=lerp(*randaug_magnitudes, stage, max_stage),
        mixup=lerp(*mixups, stage, max_stage),
        cutmix=lerp(*cutmixes, stage, max_stage),
        dropout=lerp(*dropouts, stage, max_stage),
        drop_path=lerp(*drop_paths, stage, max_stage),
    )
    if verbose:
        from ..utils.logging import get_logger

        get_logger().info(
            f"Progressive stage {stage + 1}/{max_stage}: "
            f"size={out.train_size}/{out.valid_size} "
            f"randaug=({out.randaug_layer},{out.randaug_magnitude:.1f}) "
            f"mixup={out.mixup:.2f} cutmix={out.cutmix:.2f} "
            f"dropout={out.dropout:.2f} drop_path={out.drop_path:.2f}"
        )
    return out


def stage_settings(training, stage: int) -> SimpleNamespace:
    """Resolve the augmentation/regularization settings for a progressive
    stage (or the base settings when progressive is disabled).

    Mirrors reference train.py:31-86: stage count = epoch // step; per-stage
    grad-accum list; model dropout/drop-path overrides.
    """
    prog = training.progressive
    if prog.step <= 0:
        return SimpleNamespace(
            train_size=training.train_size,
            valid_size=training.valid_size,
            randaug_layer=training.randaug_layer,
            randaug_magnitude=training.randaug_magnitude,
            mixup=training.mixup,
            cutmix=training.cutmix,
            dropout=None,
            drop_path=None,
            grad_accumulation=training.grad_accumulation,
        )

    max_stage = max(training.epoch // prog.step, 1)
    stage = min(stage, max_stage - 1)
    adapt = progressive_adaptive_regularization(
        stage, max_stage,
        prog.train_sizes, prog.valid_sizes,
        prog.randaug_layers, prog.randaug_magnitudes,
        prog.mixups, prog.cutmixes, prog.dropouts, prog.drop_paths,
        prog.verbose,
    )
    if prog.grad_accumulation is not None:
        adapt.grad_accumulation = prog.grad_accumulation[stage]
    else:
        adapt.grad_accumulation = training.grad_accumulation
    return adapt
