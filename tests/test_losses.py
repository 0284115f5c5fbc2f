"""Golden-value loss tests against independent torch implementations.

The reference losses (reference loss.py) are KL-style; we verify our jnp
versions against straightforward torch formulations computed here from the
published math (label-smoothed KL, mixup two-hot KL, DINO cross-entropy)
rather than against copied code.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from vision_transformers_tpu.train import loss as L


def _np(x):
    return np.asarray(x)


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def test_label_smoothing_matches_torch(rng):
    logits = rng.normal(size=(8, 10)).astype(np.float32)
    labels = rng.integers(0, 10, size=(8,))
    eps = 0.1

    ours = L.label_smoothing_loss(jnp.asarray(logits), jnp.asarray(labels), eps=eps)

    t_logits = torch.tensor(logits)
    n_class = 10
    off = eps / n_class
    target = torch.full((8, n_class), off)
    target[torch.arange(8), torch.tensor(labels)] = 1 - eps + off
    expected = F.kl_div(F.log_softmax(t_logits, -1), target, reduction="none").sum(-1).mean()
    np.testing.assert_allclose(_np(ours), expected.numpy(), rtol=1e-5)


def test_cross_entropy_matches_torch(rng):
    logits = rng.normal(size=(8, 10)).astype(np.float32)
    labels = rng.integers(0, 10, size=(8,))
    ours = L.cross_entropy_loss(jnp.asarray(logits), jnp.asarray(labels))
    expected = F.cross_entropy(torch.tensor(logits), torch.tensor(labels))
    np.testing.assert_allclose(_np(ours), expected.numpy(), rtol=1e-5)


def test_mix_loss_matches_torch(rng):
    logits = rng.normal(size=(8, 10)).astype(np.float32)
    l1 = rng.integers(0, 10, size=(8,))
    l2 = rng.integers(0, 10, size=(8,))
    ratio = rng.uniform(size=(8,)).astype(np.float32)
    eps = 0.1

    ours = L.mix_loss(jnp.asarray(logits), jnp.asarray(l1), jnp.asarray(l2),
                      jnp.asarray(ratio), eps=eps)

    n_class = 10
    off = eps / n_class
    t1 = torch.full((8, n_class), off)
    t1[torch.arange(8), torch.tensor(l1)] = 1 - eps + off
    t2 = torch.full((8, n_class), off)
    t2[torch.arange(8), torch.tensor(l2)] = 1 - eps + off
    r = torch.tensor(ratio).unsqueeze(-1)
    target = r * t1 + (1 - r) * t2
    expected = (
        F.kl_div(F.log_softmax(torch.tensor(logits), -1), target, reduction="none")
        .sum(-1)
        .mean()
    )
    np.testing.assert_allclose(_np(ours), expected.numpy(), rtol=1e-5)


def test_mix_loss_ratio_one_equals_label_smoothing(rng):
    logits = jnp.asarray(rng.normal(size=(4, 7)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, 7, size=(4,)))
    a = L.mix_loss(logits, labels, labels, jnp.ones(4), eps=0.1)
    b = L.label_smoothing_loss(logits, labels, eps=0.1)
    np.testing.assert_allclose(_np(a), _np(b), rtol=1e-6)


def test_dino_loss_matches_torch(rng):
    b, dim, n_crop = 4, 16, 6
    student = rng.normal(size=(n_crop * b, dim)).astype(np.float32)
    teacher = rng.normal(size=(2 * b, dim)).astype(np.float32)
    center = rng.normal(size=(1, dim)).astype(np.float32)
    t_temp, s_temp = 0.04, 0.1

    ours = L.dino_loss(jnp.asarray(student), jnp.asarray(teacher),
                       jnp.asarray(center), t_temp, n_crop, s_temp)

    # independent torch version (reference semantics: loss.py:124-142)
    st = torch.tensor(student) / s_temp
    st_chunks = st.chunk(n_crop)
    q = F.softmax((torch.tensor(teacher) - torch.tensor(center)) / t_temp, dim=-1)
    q_chunks = q.chunk(2)
    total, n_terms = 0.0, 0
    for iq, tq in enumerate(q_chunks):
        for v, sv in enumerate(st_chunks):
            if v == iq:
                continue
            total = total + (-tq * F.log_softmax(sv, dim=-1)).sum(-1).mean()
            n_terms += 1
    expected = total / n_terms
    np.testing.assert_allclose(_np(ours), expected.numpy(), rtol=1e-5)


def test_update_center():
    teacher = jnp.asarray(np.arange(12, dtype=np.float32).reshape(4, 3))
    center = jnp.zeros((1, 3))
    new = L.update_center(center, teacher, momentum=0.9)
    expected = 0.1 * np.asarray(teacher).mean(0, keepdims=True)
    np.testing.assert_allclose(_np(new), expected, rtol=1e-6)


def test_teacher_temperature_schedule():
    sched = L.teacher_temperature_schedule(0.04, 0.07, 3, 6)
    assert len(sched) == 6
    np.testing.assert_allclose(sched[0], 0.04)
    np.testing.assert_allclose(sched[2], 0.07)
    np.testing.assert_allclose(sched[5], 0.07)
