"""50-step training-trajectory parity: reference torch pipeline vs this framework.

The one-step test (test_optimizer_step_parity.py) pins a single AdamW update;
this pins the COMPOUNDING math of the EfficientNetV2 recipe — RMSpropTF with
lr folded into the momentum buffer, the exp_epoch warmup→decay schedule, L2
weight decay on the decay group, warmup-aware model EMA, EMA-of-BN, and the
BatchNorm running-stat updates — over 50 steps of identical batches, checked
at steps {1, 10, 50} (reference train.py:285-316, train_util.py:70-84;
timm RMSpropTF semantics selected by config/efficientnetv2-s.conf:38-53).

Torch side: the actual reference EfficientNetV2 module, driven by an
in-test replay of timm's RMSpropTF update rule (timm itself is not installed;
the rule is small and documented: rms starts at ONE, eps inside the sqrt,
``buf = mu*buf + lr*g/sqrt(rms+eps)``, ``p -= buf``, L2 decay into the grad).

Two documented deviations from torch-literal behavior (see
vision_transformers_tpu/models/efficientnet.py module docstring):
- BN momentum: the reference passes torch ``momentum=0.99`` (keep 1%),
  clearly intending TF's decay=0.99 (keep 99%); we patch the torch model to
  ``momentum=0.01`` so both sides keep 99%.
- running_var: torch stores the UNBIASED batch var, flax the biased one —
  an n/(n-1) deviation (n = B*H*W per channel) that reaches ~3% at the
  2x2-spatial head; absorbed by the bn atol below, negligible at
  production batch sizes.
"""

import copy
import math
import sys

import jax
import jax.numpy as jnp
import numpy as np
import torch

from test_torch_parity import _install_stub, REF, effv2_map  # noqa: F401

if REF not in sys.path:
    sys.path.insert(0, REF)

from vision_transformers_tpu.config import registry
from vision_transformers_tpu.config.schema import Training
from vision_transformers_tpu.train import engine
from vision_transformers_tpu.train.optim import make_optimizer

STEPS = 50
CHECKPOINTS = (1, 10, 50)
B, SIZE = 8, 48
# lr is scaled ~100x below the recipe's 0.016: at production lr a BN model's
# 50-step trajectory is chaotic (cross-framework f32 conv noise of ~1e-5
# relative at step 1 amplifies through batch-stat feedback to >100% by step
# 50 — measured).  At 2e-4 the run stays perturbative, and the drifts this
# test exists to catch (lr-outside-the-momentum-buffer, wrong EMA/BN decay,
# schedule off-by-one) are RELATIVE effects — 30-100%+ of displacement
# during warmup — independent of the absolute lr.
LR, WD, EMA = 2e-4, 1e-5, 0.9999
ALPHA, EPS, MU = 0.9, 1e-3, 0.9          # rmsprop_tf (conf :38-43)
WARMUP, GAMMA, INTERVAL = 20, 0.97, 9.6  # exp_epoch: 5 epochs × 4 steps, 2.4 × 4
WARMUP_MULT = 1e-8
N_CLASS = 1000  # the torch factory is fixed at 1000 classes (:377)


def _lr_at(t):
    """exp_epoch semantics (reference config/efficientnetv2-s.conf:45-53):
    linear warmup from lr*warmup_multiplier, then gamma decay every interval."""
    if t < WARMUP:
        frac = min((t + 1) / WARMUP, 1.0)
        return LR * WARMUP_MULT + (LR - LR * WARMUP_MULT) * frac
    return LR * GAMMA ** math.floor((t - WARMUP) / INTERVAL)


def _decay_group(name, p):
    # wd_skip_fn("resnet") (reference factory.py:29-31)
    return not ("bias" in name or "bn" in name or p.ndim == 1)


def _torch_trajectory(tm, batches, steps=STEPS, grad_accum=1,
                      checkpoints=CHECKPOINTS):
    """Reference pipeline: MixLoss grads → L2 wd → RMSpropTF → EMA(+BN).

    With ``grad_accum > 1`` this replays the reference's loader loop
    (train.py:264-316): grads accumulate over A microbatches with
    loss/A, the optimizer steps once at the boundary, and the EMA lerp runs
    once per LOADER batch — pre-boundary lerps toward the unchanged params
    (but already-advanced BN buffers), the boundary lerp after the step.
    The warmup decay counts t in loader batches, monotonic across epochs
    (the reference's backward-jumping ``step + i`` bookkeeping at
    train.py:302 is a bug we do not replicate — see engine.make_train_step)."""
    from loss import MixLoss

    for m in tm.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.momentum = 0.01  # TF reading of the reference's 0.99 (see above)
    tm.train()
    ema_model = copy.deepcopy(tm)
    criterion = MixLoss(eps=0.1)
    nu = {n: torch.ones_like(p) for n, p in tm.named_parameters()}
    buf = {n: torch.zeros_like(p) for n, p in tm.named_parameters()}
    snapshots = {}

    @torch.no_grad()
    def ema_update(t):
        # EMA with warmup decay + BN buffers (train.py:304-316,
        # train_util.py:70-84)
        d = min(EMA, (1 + t) / (10 + t))
        pe = dict(ema_model.named_parameters())
        for name, p in tm.named_parameters():
            pe[name].data.mul_(d).add_(p.data, alpha=1 - d)
        be = dict(ema_model.named_buffers())
        for name, b in tm.named_buffers():
            if "running_mean" in name or "running_var" in name:
                be[name].data.mul_(d).add_(b.data, alpha=1 - d)

    for s in range(steps):
        batch = batches[s % len(batches)]
        tm.zero_grad(set_to_none=True)
        n = batch["image"].shape[0] // grad_accum
        for k in range(grad_accum):
            sl = slice(k * n, (k + 1) * n)
            x = torch.tensor(batch["image"][sl].transpose(0, 3, 1, 2))
            loss = criterion(tm(x), torch.tensor(batch["label1"][sl]).long(),
                             torch.tensor(batch["label2"][sl]).long(),
                             torch.tensor(batch["ratio"][sl])) / grad_accum
            loss.backward()
            if k < grad_accum - 1:
                ema_update(s * grad_accum + k)
        lr = _lr_at(s)
        with torch.no_grad():
            for name, p in tm.named_parameters():
                g = p.grad
                if _decay_group(name, p):
                    g = g + WD * p
                nu[name].mul_(ALPHA).add_(g * g, alpha=1 - ALPHA)
                buf[name].mul_(MU).add_(lr * g / torch.sqrt(nu[name] + EPS))
                p.sub_(buf[name])
        ema_update(s * grad_accum + grad_accum - 1)
        if (s + 1) in checkpoints:
            snapshots[s + 1] = (copy.deepcopy(tm.state_dict()),
                                copy.deepcopy(ema_model.state_dict()))
    return snapshots


# Per-leaf criterion: |ours - torch| <= atol + rel * |torch displacement|.
# The displacement-relative term is the load-bearing one: a semantic drift in
# the optimizer/schedule/EMA moves every leaf by a constant FRACTION of its
# own displacement (~40-60% for lr-outside-the-buffer during warmup —
# derived and unit-tested in test_optim.py), far above the measured
# cross-framework noise (<=13% on the largest leaves at step 50).  The atol
# absorbs the absolute noise floor on near-zero-displacement leaves (BN
# biases whose gradients almost cancel, running means of zero-mean layers,
# and torch's unbiased-vs-flax-biased running_var storage — a known n/(n-1)
# deviation documented in the module docstring).
_TRAJ_TOL = {
    1: {"param": (3e-6, 0.25), "ema": (3e-6, 0.25),
        "bn": (5e-3, 0.25), "ema_bn": (5e-3, 0.25)},
    10: {"param": (1e-4, 0.30), "ema": (1e-4, 0.30),
         "bn": (5e-2, 0.30), "ema_bn": (5e-2, 0.30)},
    50: {"param": (5e-3, 0.30), "ema": (5e-3, 0.30),
         "bn": (2e-1, 0.30), "ema_bn": (2e-1, 0.30)},
}


def _assert_traj_close(ours, ref, init, tag, name, step):
    # steps between table entries use the next-larger checkpoint's tolerance
    key = min(k for k in _TRAJ_TOL if k >= step)
    atol, rel = _TRAJ_TOL[key][tag]
    a, b = np.asarray(ours), np.asarray(ref)
    disp = np.abs(b - np.asarray(init)).max()
    diff = np.abs(a - b).max()
    if diff > atol + rel * disp:
        raise AssertionError(
            f"step {step} {tag} {name}: max abs diff {diff:.3e} vs "
            f"displacement {disp:.3e} (tol {atol:.1e} + {rel}*disp)")


def _make_batches(n=10, seed=7):
    rng = np.random.default_rng(seed)
    return [
        {
            "image": rng.normal(size=(B, SIZE, SIZE, 3)).astype(np.float32),
            "label1": rng.integers(0, N_CLASS, B).astype(np.int32),
            "label2": rng.integers(0, N_CLASS, B).astype(np.int32),
            "ratio": rng.uniform(0.2, 0.8, B).astype(np.float32),
        }
        for _ in range(n)
    ]


def _run_and_compare(sd0, batches, snapshots, steps, grad_accum, checkpoints):
    """Drive our conf-driven stack from the same weights/batches and assert
    every pytree leaf tracks the torch snapshots."""
    cfg = registry.build("model", {"type": "efficientnetv2", "width": 0.25,
                                   "depth": 0.25, "n_class": N_CLASS,
                                   "dropout": 0.0, "drop_path": 0.0})
    model = cfg.make()
    blocks = model.expand_blocks()
    params0, stats0 = effv2_map(sd0, blocks)
    params0 = jax.tree.map(jnp.asarray, params0)
    stats0 = jax.tree.map(jnp.asarray, stats0)

    train_conf = Training(
        optimizer={"type": "rmsprop_tf", "lr": LR, "alpha": ALPHA, "eps": EPS,
                   "momentum": MU},
        scheduler={"type": "exp_epoch", "lr": LR, "epoch": 2.4, "gamma": GAMMA,
                   "warmup": 5, "warmup_multiplier": WARMUP_MULT},
        base_lr=LR, weight_decay=WD, wd_skip="resnet", epoch=1,
        agc=0.0, clip_grad_norm=0.0, ema=EMA, ema_bn=True,
        grad_accumulation=grad_accum,
    )
    schedule = train_conf.scheduler.make(lr=LR, epoch_len=4, warmup=WARMUP)
    # sanity: the jit-side schedule equals the independent replay
    for t in (0, 5, 19, 20, 29, 30, 49):
        np.testing.assert_allclose(float(schedule(t)), _lr_at(t), rtol=1e-6)

    tx = make_optimizer(train_conf, params0, schedule)
    state = engine.TrainState(
        step=jnp.zeros((), jnp.int32), params=params0,
        opt_state=tx.init(params0), batch_stats=stats0,
        ema_params=jax.tree.map(jnp.copy, params0),
        ema_batch_stats=jax.tree.map(jnp.copy, stats0),
    )
    step_fn = jax.jit(engine.make_train_step(model, tx, label_smoothing=0.1,
                                             ema=EMA, grad_accumulation=grad_accum))
    key = jax.random.PRNGKey(0)

    for t in range(steps):
        jbatch = jax.tree.map(jnp.asarray, batches[t % len(batches)])
        state, metrics = step_fn(state, jbatch, key)
        if (t + 1) in checkpoints:
            sd_ref, sd_ema = snapshots[t + 1]
            ref_params, ref_stats = effv2_map(sd_ref, blocks)
            ema_params, ema_stats = effv2_map(sd_ema, blocks)
            init_of = {"param": params0, "ema": params0,
                       "bn": stats0, "ema_bn": stats0}
            for got, want, tag in (
                (state.params, ref_params, "param"),
                (state.ema_params, ema_params, "ema"),
                (state.batch_stats, ref_stats, "bn"),
                (state.ema_batch_stats, ema_stats, "ema_bn"),
            ):
                flat_w = dict(jax.tree_util.tree_leaves_with_path(
                    jax.tree.map(jnp.asarray, want)))
                flat_i = dict(jax.tree_util.tree_leaves_with_path(init_of[tag]))
                for path, leaf in jax.tree_util.tree_leaves_with_path(got):
                    _assert_traj_close(
                        leaf, flat_w[path], flat_i[path], tag,
                        jax.tree_util.keystr(path), t + 1)
    assert np.isfinite(float(metrics["loss"]))


def test_fifty_step_effnetv2_trajectory_matches_reference():
    from models.efficientnet import efficientnetv2 as torch_effv2

    torch.manual_seed(0)
    tm = torch_effv2(0.25, 0.25)
    sd0 = copy.deepcopy(tm.state_dict())
    batches = _make_batches()

    snapshots = _torch_trajectory(tm, batches)
    _run_and_compare(sd0, batches, snapshots, STEPS, 1, CHECKPOINTS)


def test_grad_accumulation_trajectory_matches_reference():
    """grad_accumulation=2 over 10 optimizer steps (20 loader batches): pins
    the reference's per-LOADER-batch EMA semantics (train.py:264-316) — A-1
    lerps toward the unchanged params / advancing BN buffers before the
    boundary step, then one lerp toward the updated params — which the
    headline EffNetV2 recipe depends on (grad_accumulation: 8, ema: 0.9999 →
    effective per-step decay d^8, an 8x shorter EMA horizon than a
    per-optimizer-step lerp)."""
    from models.efficientnet import efficientnetv2 as torch_effv2

    torch.manual_seed(2)
    tm = torch_effv2(0.25, 0.25)
    sd0 = copy.deepcopy(tm.state_dict())
    batches = _make_batches(seed=13)

    snapshots = _torch_trajectory(tm, batches, steps=10, grad_accum=2,
                                  checkpoints=(1, 10))
    _run_and_compare(sd0, batches, snapshots, 10, 2, (1, 10))
