"""Preemption-tolerant training: SIGTERM → checkpoint → exit → resume=auto.

The reference has no failure handling or resume at all (SURVEY §5); these
tests pin the superset behavior: a real train.py subprocess is SIGTERMed
mid-run, must exit cleanly with a restorable checkpoint, and a second launch
with ``resume=auto`` must continue from it.
"""

import os
import signal
import subprocess
import sys
import time

import numpy as np
import pytest
from PIL import Image

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_find_resume_checkpoint_priority(tmp_path):
    from vision_transformers_tpu.train.checkpoint import find_resume_checkpoint

    assert find_resume_checkpoint(str(tmp_path / "missing")) is None
    (tmp_path / "epoch-001").mkdir()
    (tmp_path / "preempt-002").mkdir()
    assert find_resume_checkpoint(str(tmp_path)).endswith("preempt-002")
    # a completed epoch of the same number supersedes the preempt save
    (tmp_path / "epoch-002").mkdir()
    assert find_resume_checkpoint(str(tmp_path)).endswith("epoch-002")
    (tmp_path / "epoch-010").mkdir()
    assert find_resume_checkpoint(str(tmp_path)).endswith("epoch-010")


def test_preempt_flag_signal_roundtrip():
    from vision_transformers_tpu.utils import preempt

    preempt.reset()
    assert not preempt.requested()
    preempt.install()
    os.kill(os.getpid(), signal.SIGTERM)
    deadline = time.time() + 5
    while not preempt.requested() and time.time() < deadline:
        time.sleep(0.01)
    assert preempt.requested()
    assert preempt.requested_global()  # single process: plain flag read
    preempt.reset()
    assert not preempt.requested()


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("preempt_data")
    rng = np.random.default_rng(3)
    for split in ("train", "valid"):
        for cls in ("a", "b"):
            d = root / split / cls
            d.mkdir(parents=True)
            for i in range(8):
                arr = rng.integers(0, 256, (40, 44, 3), dtype=np.uint8)
                Image.fromarray(arr).save(d / f"{i}.jpg", quality=90)
    from vision_transformers_tpu.data.records import pack_image_folder

    pack_image_folder(str(root / "train"), str(root / "train"), verbose=False)
    pack_image_folder(str(root / "valid"), str(root / "valid"), verbose=False)
    return root


def _launch(tmp_path, corpus, log_name, epochs):
    env = dict(os.environ)
    env.update(
        JAX_PLATFORMS="cpu",
        XLA_FLAGS="--xla_force_host_platform_device_count=8",
        VTX_PREEMPT_CHECK_STEPS="1",
        JAX_COMPILATION_CACHE_DIR=os.path.join(REPO, "tests", ".jax_cache"),
    )
    env.pop("JAX_COORDINATOR_ADDRESS", None)
    log = open(tmp_path / log_name, "w")
    proc = subprocess.Popen(
        [sys.executable, os.path.join(REPO, "train.py"),
         "--conf", os.path.join(REPO, "configs", "vit-s-16.conf"),
         f"training.epoch={epochs}", "training.dataloader.batch_size=8",
         "arch.depth=1", "arch.dim=32", "arch.n_head=2", "arch.dim_ff=64",
         "arch.image_size=32", "resume=auto",
         f"dataset_path={corpus}"],
        cwd=str(tmp_path), env=env, stdout=log, stderr=subprocess.STDOUT,
    )
    return proc, tmp_path / log_name


def _wait_for(logfile, needle, proc, timeout):
    deadline = time.time() + timeout
    while time.time() < deadline:
        if needle in logfile.read_text(errors="replace"):
            return True
        if proc.poll() is not None:
            return needle in logfile.read_text(errors="replace")
        time.sleep(0.5)
    return False


def test_sigterm_checkpoints_and_resume_auto(tmp_path, corpus):
    proc, log = _launch(tmp_path, corpus, "run1.log", epochs=60)
    try:
        assert _wait_for(log, "epoch: 0;", proc, timeout=420), \
            f"first epoch never completed:\n{log.read_text(errors='replace')}"
        proc.send_signal(signal.SIGTERM)
        rc = proc.wait(timeout=180)
    finally:
        if proc.poll() is None:
            proc.kill()
    text = log.read_text(errors="replace")
    assert rc == 0, f"exit {rc}:\n{text}"
    assert "preemption requested" in text

    from vision_transformers_tpu.train.checkpoint import find_resume_checkpoint

    ckpt_dir = str(tmp_path / "checkpoint" / "vit-s-16")
    found = find_resume_checkpoint(ckpt_dir)
    assert found is not None, os.listdir(str(tmp_path / "checkpoint"))

    # relaunch with a reachable epoch target: must resume, not start fresh
    proc2, log2 = _launch(tmp_path, corpus, "run2.log", epochs=3)
    try:
        rc2 = proc2.wait(timeout=420)
    finally:
        if proc2.poll() is None:
            proc2.kill()
    text2 = log2.read_text(errors="replace")
    assert rc2 == 0, f"exit {rc2}:\n{text2}"
    assert "resumed from" in text2


def test_finders_skip_orbax_tmp_dirs(tmp_path):
    """Uncommitted orbax temporaries (left by a kill mid-commit) must never
    be selected for resume — restoring one crash-loops every relaunch."""
    from vision_transformers_tpu.train.checkpoint import (
        find_resume_checkpoint, latest_checkpoint)

    (tmp_path / "epoch-004").mkdir()
    (tmp_path / "epoch-005.orbax-checkpoint-tmp-1723456789").mkdir()
    (tmp_path / "preempt-006.orbax-checkpoint-tmp-99").mkdir()
    assert find_resume_checkpoint(str(tmp_path)).endswith("epoch-004")
    assert latest_checkpoint(str(tmp_path)).endswith("epoch-004")


@pytest.fixture(scope="module")
def corpus32(tmp_path_factory):
    """32 train images → 4 steps/epoch at batch 8: room to preempt mid-epoch."""
    root = tmp_path_factory.mktemp("preempt_data32")
    rng = np.random.default_rng(5)
    for split, n in (("train", 16), ("valid", 4)):
        for cls in ("a", "b"):
            d = root / split / cls
            d.mkdir(parents=True)
            for i in range(n):
                arr = rng.integers(0, 256, (40, 44, 3), dtype=np.uint8)
                Image.fromarray(arr).save(d / f"{i}.jpg", quality=90)
    from vision_transformers_tpu.data.records import pack_image_folder

    pack_image_folder(str(root / "train"), str(root / "train"), verbose=False)
    pack_image_folder(str(root / "valid"), str(root / "valid"), verbose=False)
    return root


def _launch32(tmp_path, corpus, log_name, epochs):
    env = dict(os.environ)
    env.update(
        JAX_PLATFORMS="cpu",
        XLA_FLAGS="--xla_force_host_platform_device_count=8",
        VTX_PREEMPT_CHECK_STEPS="1",
        JAX_COMPILATION_CACHE_DIR=os.path.join(REPO, "tests", ".jax_cache"),
    )
    env.pop("JAX_COORDINATOR_ADDRESS", None)
    log = open(tmp_path / log_name, "w")
    proc = subprocess.Popen(
        [sys.executable, os.path.join(REPO, "train.py"),
         "--conf", os.path.join(REPO, "configs", "vit-s-16.conf"),
         f"training.epoch={epochs}", "training.dataloader.batch_size=8",
         "arch.depth=1", "arch.dim=32", "arch.n_head=2", "arch.dim_ff=64",
         "arch.image_size=32", "resume=auto", "log_freq=1",
         f"dataset_path={corpus}"],
        cwd=str(tmp_path), env=env, stdout=log, stderr=subprocess.STDOUT,
    )
    return proc, tmp_path / log_name


def test_mid_epoch_resume_is_exact(tmp_path, corpus32):
    """Preempt mid-epoch → resume must produce the BIT-IDENTICAL final state
    an uninterrupted run produces: the resume skips exactly the batches the
    restored state already consumed (deterministic loader order), so no
    batch is trained twice and no batch is lost."""
    # uninterrupted reference: 2 epochs in its own directory
    ref_dir = tmp_path / "ref"
    ref_dir.mkdir()
    proc, log = _launch32(ref_dir, corpus32, "ref.log", epochs=2)
    rc = proc.wait(timeout=600)
    assert rc == 0, log.read_text(errors="replace")

    # preempted run: SIGTERM once epoch 1 is mid-flight
    run_dir = tmp_path / "run"
    run_dir.mkdir()
    proc, log1 = _launch32(run_dir, corpus32, "run1.log", epochs=2)
    try:
        assert _wait_for(log1, "epoch 1; 1/", proc, timeout=600), \
            f"epoch 1 never started:\n{log1.read_text(errors='replace')}"
        proc.send_signal(signal.SIGTERM)
        rc = proc.wait(timeout=180)
    finally:
        if proc.poll() is None:
            proc.kill()
    text1 = log1.read_text(errors="replace")
    assert rc == 0, f"exit {rc}:\n{text1}"
    if "preemption requested at epoch" in text1 and "boundary" in text1:
        pytest.skip("SIGTERM landed on the epoch boundary; no mid-epoch save")
    assert "preemption requested: checkpointing at epoch 1" in text1, text1

    proc2, log2 = _launch32(run_dir, corpus32, "run2.log", epochs=2)
    rc2 = proc2.wait(timeout=600)
    text2 = log2.read_text(errors="replace")
    assert rc2 == 0, f"exit {rc2}:\n{text2}"
    assert "exact mid-epoch resume" in text2, text2

    from vision_transformers_tpu.train import checkpoint as ckpt

    ref_state = ckpt.restore_checkpoint(
        str(ref_dir / "checkpoint" / "vit-s-16" / "epoch-002"))
    got_state = ckpt.restore_checkpoint(
        str(run_dir / "checkpoint" / "vit-s-16" / "epoch-002"))
    import jax

    ref_leaves = jax.tree_util.tree_leaves_with_path(ref_state)
    got_leaves = jax.tree_util.tree_leaves_with_path(got_state)
    assert len(ref_leaves) == len(got_leaves)
    for (pa, a), (pb, b) in zip(ref_leaves, got_leaves):
        assert pa == pb
        np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b),
            err_msg=jax.tree_util.keystr(pa))
