"""One full optimizer step: reference torch pipeline vs this framework.

Same initial weights + same batch through the reference's exact update
sequence — MixLoss gradients → AGC on non-"linear" params → global-norm clip
→ AdamW with the two weight-decay param groups → EMA accumulate with warmup
decay (reference train.py:236-316, optimizer.py:12-26, factory.py:25-45,
train_util.py:70-111) — and through our single jitted train step.  Post-step
parameters and EMA must match leaf-for-leaf.  This pins the training math
the way tests/test_torch_parity.py pins the forward math.
"""

import copy
import sys

import jax
import jax.numpy as jnp
import numpy as np
import torch

from test_torch_parity import _install_stub, REF, conv, lin, ln, t2j  # noqa: F401

if REF not in sys.path:
    sys.path.insert(0, REF)

from vision_transformers_tpu.config import registry
from vision_transformers_tpu.config.schema import Training
from vision_transformers_tpu.train import engine
from vision_transformers_tpu.train.optim import make_optimizer

DEPTH, DIM, N_HEAD, DIM_FF, N_CLASS = 2, 64, 2, 128, 10
LR, WD, AGC, CLIP, EMA = 0.05, 0.05, 0.02, 0.05, 0.9999


def _torch_model():
    from models.vit import VisionTransformer as TorchViT

    tm = TorchViT(
        head=torch.nn.Linear(DIM, N_CLASS),
        image_size=32, window_size=8, depth=DEPTH, dim=DIM, n_head=N_HEAD,
        dim_ff=DIM_FF, dropout=0, drop_attn=0, drop_ff=0, drop_path=0,
    )
    tm.train()
    return tm


def _map_params(sd):
    params = {
        "patch_embedding": {"linear": conv(sd, "patch_embedding.linear")},
        "cls_token": t2j(sd["cls_token"]),
        "pos_embed": t2j(sd["pos_embed"]),
        "norm": ln(sd, "norm"),
        "head": lin(sd, "head"),
    }
    for i in range(DEPTH):
        params[f"layers_{i}"] = {
            "norm_attn": ln(sd, f"layers.{i}.norm_attn"),
            "attn": {"qkv": lin(sd, f"layers.{i}.attn.qkv"),
                     "linear": lin(sd, f"layers.{i}.attn.linear")},
            "norm_ff": ln(sd, f"layers.{i}.norm_ff"),
            "ff": {"fc1": lin(sd, f"layers.{i}.ff.0"),
                   "fc2": lin(sd, f"layers.{i}.ff.3")},
        }
    return jax.tree.map(jnp.asarray, params)


def _reference_step(tm, batch):
    """The reference train.py:236-316 update, one optimizer step, plus EMA."""
    from loss import MixLoss
    from optimizer import adaptive_grad_clip
    from train_util import accumulate, add_weight_decay

    def check_skip(name, param):  # factory.py wd_skip_fn("vit")
        return ("bias" in name or "cls" in name or "norm" in name
                or param.ndim == 1)

    model_ema = copy.deepcopy(tm)
    groups, _names = add_weight_decay(tm.named_parameters(), WD, check_skip)
    optimizer = torch.optim.AdamW(groups, lr=LR)
    criterion = MixLoss(eps=0.1)

    x = torch.tensor(batch["image"].transpose(0, 3, 1, 2))
    out = tm(x)
    loss = criterion(out, torch.tensor(batch["label1"]).long(),
                     torch.tensor(batch["label2"]).long(),
                     torch.tensor(batch["ratio"]))
    loss.backward()

    agc_params = [p[1] for p in tm.named_parameters() if "linear" not in p[0]]
    adaptive_grad_clip(agc_params, AGC)
    torch.nn.utils.clip_grad_norm_(list(tm.parameters()), CLIP)
    optimizer.step()
    # EMA with warmup decay at t=0 (train.py:304-316)
    accumulate(model_ema, tm, min(EMA, (1 + 0) / (10 + 0)))
    return tm.state_dict(), model_ema.state_dict()


def test_one_optimizer_step_matches_reference():
    torch.manual_seed(0)
    tm = _torch_model()
    sd0 = copy.deepcopy(tm.state_dict())
    params0 = _map_params(sd0)

    rng = np.random.default_rng(0)
    batch = {
        "image": rng.normal(size=(4, 32, 32, 3)).astype(np.float32),
        "label1": rng.integers(0, N_CLASS, 4).astype(np.int32),
        "label2": rng.integers(0, N_CLASS, 4).astype(np.int32),
        "ratio": rng.uniform(0.2, 0.8, 4).astype(np.float32),
    }

    sd1, sd_ema = _reference_step(tm, batch)

    model = registry.build("model", {
        "type": "vit", "image_size": 32, "window_size": 8, "n_class": N_CLASS,
        "depth": DEPTH, "dim": DIM, "n_head": N_HEAD, "dim_ff": DIM_FF,
    }).make()
    train_conf = Training(
        optimizer={"type": "adamw", "lr": LR},
        scheduler={"type": "constant", "lr": LR},
        base_lr=LR, weight_decay=WD, wd_skip="vit", epoch=1,
        agc=AGC, clip_grad_norm=CLIP, ema=EMA,
    )
    tx = make_optimizer(train_conf, params0, lambda c: LR)
    state = engine.TrainState(
        step=jnp.zeros((), jnp.int32), params=params0,
        opt_state=tx.init(params0),
        ema_params=jax.tree.map(jnp.copy, params0),
    )
    step = engine.make_train_step(model, tx, label_smoothing=0.1, ema=EMA)
    jbatch = jax.tree.map(jnp.asarray, batch)
    state1, metrics = step(state, jbatch, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))

    ours1 = _map_params(sd1)
    ema1 = _map_params(sd_ema)

    def assert_step_close(a, b, name):
        """Leaf comparison tolerant of BORDERLINE threshold flips: AGC and
        the global clip both contain a hard ``where(g_norm < max_norm)``;
        f32 reduction-order noise can flip a unit sitting exactly on the
        threshold, perturbing a handful of elements by ~1% of the update.
        Require 99.9% of elements within tight tolerance and cap the worst
        element at 1% of the LR (the largest a flipped unit can move)."""
        a, b = np.asarray(a), np.asarray(b)
        close = np.isclose(a, b, rtol=2e-3, atol=5e-5)
        frac = close.mean()
        assert frac >= 0.999, f"{name}: only {frac:.4%} elements match"
        assert np.abs(a - b).max() <= LR * 0.01, \
            f"{name}: max abs diff {np.abs(a - b).max()}"

    flat_ours = jax.tree_util.tree_leaves_with_path(state1.params)
    flat_ref = dict(jax.tree_util.tree_leaves_with_path(ours1))
    assert len(flat_ours) == len(flat_ref)
    for path, leaf in flat_ours:
        name = jax.tree_util.keystr(path)
        assert_step_close(leaf, flat_ref[path], f"param {name}")
        # the step must have actually moved this parameter
        pre = dict(jax.tree_util.tree_leaves_with_path(params0))[path]
        assert not np.allclose(np.asarray(leaf), np.asarray(pre)), \
            f"param {name} did not move"

    flat_ema_ref = dict(jax.tree_util.tree_leaves_with_path(ema1))
    for path, leaf in jax.tree_util.tree_leaves_with_path(state1.ema_params):
        assert_step_close(leaf, flat_ema_ref[path],
                          f"ema {jax.tree_util.keystr(path)}")


def test_agc_and_clip_are_active_in_the_parity_setup():
    """Guard: the hyperparameters above actually trigger AGC and the global
    clip, so the parity test exercises those code paths (not identity)."""
    torch.manual_seed(0)
    tm = _torch_model()
    from loss import MixLoss

    rng = np.random.default_rng(0)
    x = torch.tensor(rng.normal(size=(4, 3, 32, 32)).astype(np.float32))
    out = tm(x)
    loss = MixLoss(eps=0.1)(out, torch.tensor(rng.integers(0, N_CLASS, 4)),
                            torch.tensor(rng.integers(0, N_CLASS, 4)),
                            torch.tensor(rng.uniform(0.2, 0.8, 4).astype(np.float32)))
    loss.backward()
    total = torch.sqrt(sum(p.grad.square().sum() for p in tm.parameters()))
    assert float(total) > CLIP  # global clip engages
    # at least one non-linear param exceeds its AGC budget
    hit = False
    for n, p in tm.named_parameters():
        if "linear" in n or p.grad is None:
            continue
        dims = list(range(1, p.ndim)) if p.ndim > 1 else None
        if dims:
            gn = p.grad.square().sum(dim=dims, keepdim=True).sqrt()
            pn = p.square().sum(dim=dims, keepdim=True).sqrt()
        else:
            gn, pn = p.grad.norm(), p.norm()
        if bool((gn > pn.clamp(min=1e-3) * AGC).any()):
            hit = True
            break
    assert hit