"""50-step NFNet training-trajectory parity: the SGD-Nesterov + AGC recipe.

Completes the trajectory-parity triplet (EffNetV2/RMSpropTF+EMA+BN,
DINO/AdamW+cosine-wd+clip): this pins the NFNet paper recipe the reference's
best published result uses (README.md:18, 83.17 top-1) — Nesterov momentum
with L2 weight decay folded into the gradient, adaptive gradient clipping on
every non-"linear" parameter (reference optimizer.py:13-26, train.py:256-262)
BEFORE weight decay, and the warmup-aware model EMA — over 50 identical
batches, checked at steps {1, 10, 50}.

Torch side: the actual reference NFNet module, MixLoss, and the reference's
own ``adaptive_grad_clip``, driven by a manual SGD-Nesterov replay (torch
semantics: ``buf = mu*buf + g``, ``d_p = g + mu*buf``, first step ``buf=g``).
"""

import copy
import sys

import jax
import jax.numpy as jnp
import numpy as np
import torch

from test_torch_parity import _install_stub, REF  # noqa: F401
from test_trajectory_parity import _assert_traj_close, _make_batches

if REF not in sys.path:
    sys.path.insert(0, REF)

from vision_transformers_tpu.config import registry
from vision_transformers_tpu.config.schema import Training
from vision_transformers_tpu.train import engine
from vision_transformers_tpu.train.optim import make_optimizer
from vision_transformers_tpu.utils.torch_convert import convert_variables

STEPS = 50
CHECKPOINTS = (1, 10, 50)
B = 8
LR, WD, MU, AGC, EMA = 5e-3, 1e-4, 0.9, 0.01, 0.9999
N_CLASS = 10

NFNET_KW = {"n_class": N_CLASS, "channels": [16, 32, 64, 64],
            "depths": [1, 1, 1, 1], "groups": [8, 8, 8, 8],
            "stochastic_depth": 0.0, "dropout": 0.0}


def _decay_group(name, p):
    # wd_skip_fn("nfnet") (reference factory.py:33-34)
    return not ("bias" in name or "gain" in name)


def _torch_trajectory(tm, batches):
    from loss import MixLoss
    from optimizer import adaptive_grad_clip

    tm.train()
    ema_model = copy.deepcopy(tm)
    criterion = MixLoss(eps=0.1)
    agc_params = [p for n, p in tm.named_parameters() if "linear" not in n]
    buf = {}
    snapshots = {}
    agc_engaged = False

    for t in range(STEPS):
        batch = batches[t % len(batches)]
        tm.zero_grad(set_to_none=True)
        x = torch.tensor(batch["image"].transpose(0, 3, 1, 2))
        loss = criterion(tm(x), torch.tensor(batch["label1"]).long(),
                         torch.tensor(batch["label2"]).long(),
                         torch.tensor(batch["ratio"]))
        loss.backward()
        pre = [p.grad.clone() for p in agc_params]
        adaptive_grad_clip(agc_params, AGC)  # the reference's own AGC
        agc_engaged = agc_engaged or any(
            not torch.equal(a, p.grad) for a, p in zip(pre, agc_params))
        with torch.no_grad():
            for name, p in tm.named_parameters():
                g = p.grad
                if _decay_group(name, p):
                    g = g + WD * p
                if name not in buf:
                    buf[name] = g.clone()
                else:
                    buf[name].mul_(MU).add_(g)
                p.sub_(LR * (g + MU * buf[name]))
            d = min(EMA, (1 + t) / (10 + t))
            pe = dict(ema_model.named_parameters())
            for name, p in tm.named_parameters():
                pe[name].data.mul_(d).add_(p.data, alpha=1 - d)
        if (t + 1) in CHECKPOINTS:
            snapshots[t + 1] = (copy.deepcopy(tm.state_dict()),
                                copy.deepcopy(ema_model.state_dict()))
    assert agc_engaged, "AGC never clipped anything — the test has no teeth"
    return snapshots


def test_fifty_step_nfnet_sgd_agc_trajectory_matches_reference():
    from models.nfnet import NFNet as TorchNFNet

    torch.manual_seed(0)
    tm = TorchNFNet(
        n_class=N_CLASS, channels=(16, 32, 64, 64), depths=(1, 1, 1, 1),
        groups=(8, 8, 8, 8), stochastic_depth=0.0, dropout=0.0)
    with torch.no_grad():  # zero-init skip gains hide the residual path
        for name, p in tm.named_parameters():
            if "skip_gain" in name:
                p.fill_(0.7)
    sd0 = copy.deepcopy(tm.state_dict())
    batches = _make_batches(seed=17)
    for b in batches:  # NFNet stem expects even spatial dims; reuse 48x48
        b["label1"] %= N_CLASS
        b["label2"] %= N_CLASS

    snapshots = _torch_trajectory(tm, batches)

    cfg_dict = {"type": "nfnet", **NFNET_KW}
    model = registry.build("model", cfg_dict).make()
    params0 = jax.tree.map(jnp.asarray,
                           convert_variables(cfg_dict, sd0)["params"])

    train_conf = Training(
        optimizer={"type": "sgd", "lr": LR, "momentum": MU, "nesterov": True},
        scheduler={"type": "constant", "lr": LR},
        base_lr=LR, weight_decay=WD, wd_skip="nfnet", epoch=1,
        agc=AGC, clip_grad_norm=0.0, ema=EMA,
    )
    tx = make_optimizer(train_conf, params0, lambda c: LR)
    state = engine.TrainState(
        step=jnp.zeros((), jnp.int32), params=params0,
        opt_state=tx.init(params0),
        ema_params=jax.tree.map(jnp.copy, params0),
    )
    step_fn = jax.jit(engine.make_train_step(model, tx, label_smoothing=0.1,
                                             ema=EMA, n_class=N_CLASS))
    key = jax.random.PRNGKey(0)

    for t in range(STEPS):
        jbatch = jax.tree.map(jnp.asarray, batches[t % len(batches)])
        state, metrics = step_fn(state, jbatch, key)
        if (t + 1) in CHECKPOINTS:
            sd_ref, sd_ema = snapshots[t + 1]
            for got, sd, tag in ((state.params, sd_ref, "param"),
                                 (state.ema_params, sd_ema, "ema")):
                want = convert_variables(cfg_dict, sd)["params"]
                flat_w = dict(jax.tree_util.tree_leaves_with_path(
                    jax.tree.map(jnp.asarray, want)))
                flat_i = dict(jax.tree_util.tree_leaves_with_path(params0))
                for path, leaf in jax.tree_util.tree_leaves_with_path(got):
                    _assert_traj_close(leaf, flat_w[path], flat_i[path], tag,
                                       jax.tree_util.keystr(path), t + 1)
    assert np.isfinite(float(metrics["loss"]))
