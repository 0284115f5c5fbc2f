"""Production-lr convergence-band comparison: reference torch vs framework.

The 50-step trajectory suites (test_trajectory_parity.py and friends) pin the
optimizer/schedule/EMA math leaf-for-leaf at a perturbative lr, because at the
recipes' production lr the trajectory is chaotic — f32 noise of ~1e-5 relative
at step 1 amplifies to O(1) parameter differences within tens of steps, so
leaf-wise comparison is meaningless there.  This suite covers the regime the
recipes actually train in (reference train.py:285-316 with
config/swin-transformer-s.conf lr=2.5e-4·B/256 AdamW-cycle and
config/efficientnetv2-s.conf lr=0.016 RMSpropTF-exp_epoch) STATISTICALLY:

  for each of N seeds, both frameworks start from the SAME torch-initialized
  weights and consume the SAME fixed synthetic corpus, then evolve
  independently at full recipe lr.  At fixed step checkpoints we compare
  window-averaged loss.  The null hypothesis "same training dynamics" predicts
  the torch-vs-jax gap is indistinguishable from the cross-seed chaos scale;
  a semantic drift (wrong decay group, lr misapplied, schedule off) moves the
  MEAN of one framework's band away from the other's.

Criterion per checkpoint: |mean_t − mean_j| ≤ K·max(std_t, std_j) + rel·mean,
plus both frameworks must actually train (final window below the first).
The lr values fed to the torch replay come from this repo's schedule objects —
schedule parity itself is pinned independently (golden vs the reference's own
PhaseScheduler, tests/test_schedule.py), so sharing them here does not mask a
schedule bug, and it removes a nuisance variable from the band.

Full-length runs (500 steps) via scripts/convergence_band.py; this pytest
runs the 240-step version of the recipes.  A third recipe covers DINO at
its scaled production lr with freeze_last_layer active (see _run_dino).
"""

import copy
import sys

import jax
import jax.numpy as jnp
import numpy as np
import torch

from test_torch_parity import _install_stub, REF  # noqa: F401

if REF not in sys.path:
    sys.path.insert(0, REF)

from vision_transformers_tpu.config import registry
from vision_transformers_tpu.config.schema import Training
from vision_transformers_tpu.train import engine
from vision_transformers_tpu.train.optim import make_optimizer
from vision_transformers_tpu.utils.torch_convert import convert_variables

B = 8
N_CLASS = 1000
SEEDS = (0, 1, 2)
# band criterion: gap vs cross-seed spread (3 seeds → noisy std, hence K=3)
BAND_K = 3.0
BAND_REL = 0.03  # absolute floor, fraction of the mean loss


# ---------------------------------------------------------------------------
# recipes (production hyperparameters, reduced model/corpus size)
# ---------------------------------------------------------------------------

# Swin recipe (config/swin-transformer-s.conf): AdamW, cycle schedule,
# wd 0.05 with wd_skip "vit", clip_grad_norm 5.0.  Recipe lr after linear
# scaling: 2.5e-4 · 1024/256 = 1e-3 (reference factory.py:42-45).
SWIN_LR, SWIN_WD, SWIN_CLIP = 1e-3, 0.05, 5.0
SWIN_KW = dict(image_size=(64, 64), n_class=N_CLASS, depths=(2, 2, 2, 2),
               dims=(16, 32, 64, 128), dim_head=8, n_heads=(2, 4, 8, 16),
               dim_ffs=(32, 64, 128, 256), window_size=2)
SWIN_CFG = {"type": "swin_transformer", "image_size": [64, 64],
            "n_class": N_CLASS, "depths": [2, 2, 2, 2],
            "dims": [16, 32, 64, 128], "dim_head": 8,
            "n_heads": [2, 4, 8, 16], "dim_ffs": [32, 64, 128, 256],
            "window_size": 2}

# EfficientNetV2 recipe (config/efficientnetv2-s.conf): RMSpropTF
# (alpha .9, eps 1e-3, momentum .9), exp_epoch (gamma .97 / 2.4 epochs,
# 5 warmup epochs from 1e-8·lr), wd 1e-5 with wd_skip "resnet", lr 0.016.
EFF_LR, EFF_WD = 0.016, 1e-5
EFF_ALPHA, EFF_EPS, EFF_MU = 0.9, 1e-3, 0.9
EFF_SIZE = 48
EFF_EPOCH_LEN = 12  # steps/“epoch” for warmup (5 ep) and decay (2.4 ep)


def make_corpus(n_batches, size, seed=7):
    rng = np.random.default_rng(seed)
    return [
        {
            "image": rng.normal(size=(B, size, size, 3)).astype(np.float32),
            "label1": rng.integers(0, N_CLASS, B).astype(np.int32),
            "label2": rng.integers(0, N_CLASS, B).astype(np.int32),
            "ratio": rng.uniform(0.2, 0.8, B).astype(np.float32),
        }
        for _ in range(n_batches)
    ]


def _schedule_values(train_conf, lr, steps, epoch_len):
    sched = train_conf.scheduler
    if sched.type == "exp_epoch":
        fn = sched.make(lr=lr, epoch_len=epoch_len,
                        warmup=sched.warmup * epoch_len)
    else:
        fn = sched.make(lr=lr, n_iter=steps, warmup=sched.warmup)
    return [float(fn(t)) for t in range(steps)]


# ---------------------------------------------------------------------------
# torch reference replays (loss-recording variants of the pinned 50-step
# drivers; reference train.py:236-316)
# ---------------------------------------------------------------------------

def torch_swin_losses(tm, batches, lrs, steps):
    from loss import MixLoss

    tm.train()
    criterion = MixLoss(eps=0.1)
    # add_weight_decay + wd_skip_fn("vit") (reference train_util.py:87-111,
    # factory.py:33-34): skip bias / "cls" / "norm" / 1-dim
    decay, no_decay = [], []
    for n, p in tm.named_parameters():
        skip = "bias" in n or "cls" in n or "norm" in n or p.ndim == 1
        (no_decay if skip else decay).append(p)
    opt = torch.optim.AdamW(
        [{"params": no_decay, "weight_decay": 0.0},
         {"params": decay, "weight_decay": SWIN_WD}],
        lr=lrs[0], betas=(0.9, 0.999), eps=1e-8)
    params = list(tm.parameters())

    losses = []
    for t in range(steps):
        batch = batches[t % len(batches)]
        opt.zero_grad(set_to_none=True)
        x = torch.tensor(batch["image"].transpose(0, 3, 1, 2))
        loss = criterion(tm(x), torch.tensor(batch["label1"]).long(),
                         torch.tensor(batch["label2"]).long(),
                         torch.tensor(batch["ratio"]))
        loss.backward()
        torch.nn.utils.clip_grad_norm_(params, SWIN_CLIP)
        for pg in opt.param_groups:
            pg["lr"] = lrs[t]
        opt.step()
        losses.append(float(loss.detach()))
    return losses


def torch_effv2_losses(tm, batches, lrs, steps):
    """RMSpropTF replay (timm semantics pinned in test_trajectory_parity.py:
    rms starts at ONE, eps inside the sqrt, lr folded into the momentum
    buffer, L2 decay into the grad; reference conf :38-43)."""
    from loss import MixLoss

    for m in tm.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.momentum = 0.01  # TF decay=0.99 reading (see trajectory suite)
    tm.train()
    criterion = MixLoss(eps=0.1)
    nu = {n: torch.ones_like(p) for n, p in tm.named_parameters()}
    buf = {n: torch.zeros_like(p) for n, p in tm.named_parameters()}

    losses = []
    for t in range(steps):
        batch = batches[t % len(batches)]
        tm.zero_grad(set_to_none=True)
        x = torch.tensor(batch["image"].transpose(0, 3, 1, 2))
        loss = criterion(tm(x), torch.tensor(batch["label1"]).long(),
                         torch.tensor(batch["label2"]).long(),
                         torch.tensor(batch["ratio"]))
        loss.backward()
        with torch.no_grad():
            for name, p in tm.named_parameters():
                g = p.grad
                # wd_skip_fn("resnet"): bias / "bn" / 1-dim skip decay
                if not ("bias" in name or "bn" in name or p.ndim == 1):
                    g = g + EFF_WD * p
                nu[name].mul_(EFF_ALPHA).add_(g * g, alpha=1 - EFF_ALPHA)
                buf[name].mul_(EFF_MU).add_(
                    lrs[t] * g / torch.sqrt(nu[name] + EFF_EPS))
                p.sub_(buf[name])
        losses.append(float(loss.detach()))
    return losses


# ---------------------------------------------------------------------------
# framework side: the real conf-driven train step
# ---------------------------------------------------------------------------

def ours_losses(cfg_dict, sd0, batches, train_conf, steps, epoch_len):
    model = registry.build("model", cfg_dict).make()
    variables = convert_variables(cfg_dict, sd0)
    params0 = jax.tree.map(jnp.asarray, variables["params"])
    stats0 = jax.tree.map(jnp.asarray, variables.get("batch_stats")) \
        if "batch_stats" in variables else None

    sched = train_conf.scheduler
    if sched.type == "exp_epoch":
        schedule = sched.make(lr=sched.lr, epoch_len=epoch_len,
                              warmup=sched.warmup * epoch_len)
    else:
        schedule = sched.make(lr=sched.lr, n_iter=steps, warmup=sched.warmup)

    tx = make_optimizer(train_conf, params0, schedule)
    state = engine.TrainState(
        step=jnp.zeros((), jnp.int32), params=params0,
        opt_state=tx.init(params0), batch_stats=stats0,
        ema_params=None, ema_batch_stats=None,
    )
    step_fn = jax.jit(engine.make_train_step(model, tx, label_smoothing=0.1),
                      donate_argnums=(0,))
    key = jax.random.PRNGKey(0)

    losses = []
    for t in range(steps):
        jbatch = jax.tree.map(jnp.asarray, batches[t % len(batches)])
        state, metrics = step_fn(state, jbatch, key)
        losses.append(float(metrics["loss"]))
    return losses


# ---------------------------------------------------------------------------
# the band comparison
# ---------------------------------------------------------------------------

def run_recipe(recipe: str, steps: int, seeds=SEEDS):
    """Returns {"torch": [seed][step], "ours": [seed][step]}."""
    if recipe == "swin":
        from models.swin_transformer import SwinTransformer as TorchSwin

        batches = make_corpus(12, 64)
        train_conf = Training(
            optimizer={"type": "adamw", "lr": SWIN_LR},
            scheduler={"type": "cycle", "lr": SWIN_LR, "warmup": 30,
                       "initial_multiplier": 1e-3, "final_multiplier": 1e-2},
            base_lr=SWIN_LR, weight_decay=SWIN_WD, wd_skip="vit", epoch=1,
            agc=0.0, clip_grad_norm=SWIN_CLIP,
        )
        lrs = _schedule_values(train_conf, SWIN_LR, steps, 1)
        t_curves, j_curves = [], []
        for seed in seeds:
            torch.manual_seed(seed)
            tm = TorchSwin(**SWIN_KW)
            with torch.no_grad():  # zero-init tables hide nothing here, but
                for n, p in tm.named_parameters():  # keep parity-test setup
                    if "rel_pos" in n:
                        p.normal_(0, 0.5)
            sd0 = copy.deepcopy(tm.state_dict())
            j_curves.append(ours_losses(SWIN_CFG, sd0, batches, train_conf,
                                        steps, 1))
            t_curves.append(torch_swin_losses(tm, batches, lrs, steps))
        return {"torch": t_curves, "ours": j_curves}

    if recipe == "dino":
        return _run_dino(steps, seeds)

    if recipe == "effnetv2":
        from models.efficientnet import efficientnetv2 as torch_effv2

        batches = make_corpus(12, EFF_SIZE)
        cfg_dict = {"type": "efficientnetv2", "width": 0.25, "depth": 0.25,
                    "n_class": N_CLASS, "dropout": 0.0, "drop_path": 0.0}
        train_conf = Training(
            optimizer={"type": "rmsprop_tf", "lr": EFF_LR, "alpha": EFF_ALPHA,
                       "eps": EFF_EPS, "momentum": EFF_MU},
            scheduler={"type": "exp_epoch", "lr": EFF_LR, "epoch": 2.4,
                       "gamma": 0.97, "warmup": 5, "warmup_multiplier": 1e-8},
            base_lr=EFF_LR, weight_decay=EFF_WD, wd_skip="resnet", epoch=1,
            agc=0.0, clip_grad_norm=0.0,
        )
        lrs = _schedule_values(train_conf, EFF_LR, steps, EFF_EPOCH_LEN)
        t_curves, j_curves = [], []
        for seed in seeds:
            torch.manual_seed(seed)
            tm = torch_effv2(0.25, 0.25)
            sd0 = copy.deepcopy(tm.state_dict())
            j_curves.append(ours_losses(cfg_dict, sd0, batches, train_conf,
                                        steps, EFF_EPOCH_LEN))
            t_curves.append(torch_effv2_losses(tm, batches, lrs, steps))
        return {"torch": t_curves, "ours": j_curves}

    raise ValueError(recipe)


def _run_dino(steps, seeds):
    """DINO band at the 1024-batch recipe lr (config/dino_deit-s-16.conf:
    base_lr 5e-4 → linear-scaled 2e-3), with the FULL production stack
    active: cosine wd 0.04→0.4, clip 3.0, teacher-momentum cosine
    0.996→1, teacher-temperature warmup, and freeze_last_layer=1 — so the
    band statistically covers the one knowingly-unpinned deviation (optax
    moments advancing for the frozen last layer while torch AdamW skips
    grad-None params, train/dino.py) in the regime where it acts."""
    from test_dino_trajectory_parity import (
        DINO_KW, _decay_split, _init_single_process_group)
    from models.vit import dino as torch_dino
    from loss import DINOLoss
    from train_util import cancel_last_layer_grad

    from vision_transformers_tpu.train.dino import (
        DINOTrainState, make_dino_train_step)
    from vision_transformers_tpu.train.loss import (
        teacher_temperature_schedule)
    from vision_transformers_tpu.train.schedule import cosine_schedule

    LR, CLIP, WD, WD_END = 2e-3, 3.0, 0.04, 0.4
    TEMP_WARM, TEMP, TEMP_WARM_EPOCH = 0.04, 0.07, 3
    TEACHER_M, FREEZE = 0.996, 1
    EPOCH_LEN = 10
    n_epoch = max(steps // EPOCH_LEN, TEMP_WARM_EPOCH + 1)
    N_CROP = 4  # 2 globals + 2 locals (tiny-model stand-in for 2+8)

    rng = np.random.default_rng(13)
    batches = [
        [rng.normal(size=(B, s, s, 3)).astype(np.float32)
         for s in (32, 32, 16, 16)]
        for _ in range(12)
    ]
    wd_sched = cosine_schedule(WD, WD_END, steps)
    mom_sched = cosine_schedule(TEACHER_M, 1.0, steps)
    temp_sched = teacher_temperature_schedule(TEMP_WARM, TEMP,
                                              TEMP_WARM_EPOCH, n_epoch)

    def torch_losses(tm):
        _init_single_process_group()
        teacher = torch_dino(**DINO_KW)
        teacher.load_state_dict(tm.state_dict())
        for p in teacher.parameters():
            p.requires_grad = False
        tm.train()
        teacher.train()
        criterion = DINOLoss(DINO_KW["dim_head_out"], N_CROP, TEMP_WARM,
                             TEMP, TEMP_WARM_EPOCH, n_epoch)
        decay, no_decay = _decay_split(tm)
        opt = torch.optim.AdamW(
            [{"params": no_decay, "weight_decay": 0.0, "no_decay": True},
             {"params": decay, "weight_decay": WD}],
            lr=LR, betas=(0.9, 0.999), eps=1e-8)
        params = list(tm.parameters())
        losses = []
        for t in range(steps):
            epoch = t // EPOCH_LEN
            inputs = [torch.tensor(c.transpose(0, 3, 1, 2))
                      for c in batches[t % len(batches)]]
            with torch.no_grad():
                teacher_out = teacher(inputs[:2])
            loss = criterion(tm(inputs), teacher_out, epoch)
            loss.backward()
            for pg in opt.param_groups:
                if "no_decay" not in pg:
                    pg["weight_decay"] = wd_sched[t]
            torch.nn.utils.clip_grad_norm_(params, CLIP)
            cancel_last_layer_grad(epoch, tm, FREEZE)
            opt.step()
            opt.zero_grad(set_to_none=True)
            with torch.no_grad():
                m = mom_sched[t]
                for pq, pk in zip(tm.parameters(), teacher.parameters()):
                    pk.detach().mul_(m).add_(pq.detach(), alpha=1 - m)
            losses.append(float(loss.detach()))
        return losses

    def ours_losses_dino(sd0):
        cfg_dict = {"type": "dino", **DINO_KW}
        model = registry.build("model", cfg_dict).make()
        params0 = jax.tree.map(jnp.asarray,
                               convert_variables(cfg_dict, sd0)["params"])
        train_conf = Training(
            optimizer={"type": "adamw", "lr": LR},
            scheduler={"type": "constant", "lr": LR},
            base_lr=LR, weight_decay=WD, wd_skip="dino", epoch=n_epoch,
            agc=0.0, clip_grad_norm=CLIP, grad_accumulation=1,
        )
        tx, train_step = make_dino_train_step(
            train_conf, model, model, params0, lambda t: LR, wd_sched,
            N_CROP)
        state = DINOTrainState(
            step=jnp.zeros((), jnp.int32), student=params0,
            teacher=jax.tree.map(jnp.copy, params0),
            opt_state=tx.init(params0),
            center=jnp.zeros((1, DINO_KW["dim_head_out"]), jnp.float32),
        )
        step_jit = jax.jit(train_step)
        key = jax.random.PRNGKey(0)
        losses = []
        for t in range(steps):
            epoch = t // EPOCH_LEN
            crops = [jnp.asarray(c) for c in batches[t % len(batches)]]
            state, metrics = step_jit(state, crops, key,
                                      jnp.float32(temp_sched[epoch]),
                                      jnp.float32(mom_sched[t]),
                                      jnp.int32(FREEZE > epoch))
            losses.append(float(metrics["loss"]))
        return losses

    t_curves, j_curves = [], []
    for seed in seeds:
        torch.manual_seed(seed)
        tm = torch_dino(**DINO_KW)
        with torch.no_grad():
            for name, p in tm.named_parameters():
                if "weight_g" in name:
                    p.normal_(1.0, 0.2)
        sd0 = copy.deepcopy(tm.state_dict())
        j_curves.append(ours_losses_dino(sd0))
        t_curves.append(torch_losses(tm))
    return {"torch": t_curves, "ours": j_curves}


def band_stats(curves, steps, window):
    """Window-mean loss per seed at each checkpoint (end of each window)."""
    checkpoints = list(range(window, steps + 1, window))
    out = {}
    for c in checkpoints:
        out[c] = np.array([float(np.mean(cv[c - window:c])) for cv in curves])
    return out


def assert_bands_overlap(result, steps, window, recipe, decreases=True):
    t_band = band_stats(result["torch"], steps, window)
    j_band = band_stats(result["ours"], steps, window)
    report = []
    for c in t_band:
        tm_, jm_ = t_band[c].mean(), j_band[c].mean()
        spread = max(t_band[c].std(ddof=1), j_band[c].std(ddof=1))
        gap = abs(tm_ - jm_)
        tol = BAND_K * spread + BAND_REL * abs(tm_)
        report.append(f"  step {c}: torch {tm_:.4f}±{t_band[c].std(ddof=1):.4f}"
                      f"  ours {jm_:.4f}±{j_band[c].std(ddof=1):.4f}"
                      f"  gap {gap:.4f} (tol {tol:.4f})")
        assert np.isfinite(tm_) and np.isfinite(jm_), \
            f"{recipe} diverged at step {c}"
        assert gap <= tol, (f"{recipe} band mismatch at step {c}: "
                            f"gap {gap:.4f} > tol {tol:.4f}\n" +
                            "\n".join(report))
    # both frameworks actually train at the production lr.  Supervised
    # recipes must DECREASE the loss; self-distillation on synthetic noise
    # crops instead collapses to the uniform fixed point (loss →
    # log(out_dim)) — there the sanity check is that the dynamics actually
    # moved, and moved IDENTICALLY on both sides (the band criterion above).
    first, last = min(t_band), max(t_band)
    if decreases:
        assert t_band[last].mean() < t_band[first].mean(), "\n".join(report)
        assert j_band[last].mean() < j_band[first].mean(), "\n".join(report)
    else:
        assert abs(t_band[last].mean() - t_band[first].mean()) > 1e-3, \
            "\n".join(report)
        assert abs(j_band[last].mean() - j_band[first].mean()) > 1e-3, \
            "\n".join(report)
    return report


def test_swin_production_lr_band():
    steps, window = 240, 30
    report = assert_bands_overlap(run_recipe("swin", steps), steps, window,
                                  "swin")
    print("\n".join(report))


def test_effnetv2_production_lr_band():
    steps, window = 240, 30
    report = assert_bands_overlap(run_recipe("effnetv2", steps), steps,
                                  window, "effnetv2")
    print("\n".join(report))


def test_dino_production_lr_band():
    """Covers the freeze-epoch torch-AdamW semantics (train/dino.py) in
    their acting regime: production lr, clip 3.0, freeze_last_layer=1,
    crossing the freeze boundary at step 10.  On synthetic noise crops the
    DINO dynamics collapse toward the uniform fixed point (loss rises to
    log(out_dim) on BOTH frameworks identically), so the band criterion is
    the whole check — no monotone-decrease sanity applies."""
    steps, window = 240, 30
    report = assert_bands_overlap(run_recipe("dino", steps), steps,
                                  window, "dino", decreases=False)
    print("\n".join(report))
