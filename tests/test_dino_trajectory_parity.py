"""50-step DINO training-trajectory parity: reference torch pipeline vs ours.

test_trajectory_parity.py pins the classification recipe (RMSpropTF + EMA +
BN); this pins the COMPOUNDING math of the DINO recipe — AdamW on the
two-group decay split, the per-step cosine weight-decay override on the decay
group only (reference train_dino.py:235-237), global-norm clipping, the
teacher-momentum cosine schedule (train_dino.py:140-142,257-261), the
teacher-temperature warmup (loss.py:108-119), the center EMA
(loss.py:144-151), and the weight-normed last layer's gradient flow — over 50
steps of identical multi-crop batches, checked at steps {1, 10, 50}.

Torch side: the actual reference modules (`models.vit.dino`, `loss.DINOLoss`)
driven by an in-test replay of the reference train loop
(train_dino.py:218-261) with torch.optim.AdamW on the add_weight_decay
two-group split (train_util.py:87-111).

A separate test pins the last-layer freeze ORDERING: the reference clips with
the last-layer grads included in the global norm and only then cancels them
(train_dino.py:240-250), so the frozen params get neither step nor weight
decay while every other param's clip scale still sees the full norm.
"""

import copy
import sys

import jax
import jax.numpy as jnp
import numpy as np
import torch

from test_torch_parity import _install_stub, REF  # noqa: F401
from test_trajectory_parity import _assert_traj_close

if REF not in sys.path:
    sys.path.insert(0, REF)

from vision_transformers_tpu.config import registry
from vision_transformers_tpu.config.schema import Training
from vision_transformers_tpu.train.dino import DINOTrainState, make_dino_train_step
from vision_transformers_tpu.train.loss import teacher_temperature_schedule
from vision_transformers_tpu.train.schedule import cosine_schedule
from vision_transformers_tpu.utils.torch_convert import convert_variables

STEPS = 50
CHECKPOINTS = (1, 10, 50)
B = 4
EPOCH_LEN, N_EPOCH = 10, 5
N_LOCAL, N_CROP = 2, 4
LR, CLIP = 5e-4, 0.5
WD, WD_END = 0.04, 0.4
TEMP_WARM, TEMP, TEMP_WARM_EPOCH = 0.04, 0.07, 3
TEACHER_M = 0.996

DINO_KW = dict(image_size=32, window_size=8, depth=2, dim=64, n_head=2,
               dim_ff=128, dropout=0.0, drop_attn=0.0, drop_ff=0.0,
               drop_path=0.0, dim_head_out=128, use_bn=False,
               norm_last_layer=False, depth_head=3, dim_head_ff=96,
               dim_head_bottleneck=32)


def _make_batches(n=5, seed=3):
    rng = np.random.default_rng(seed)
    return [
        [rng.normal(size=(B, s, s, 3)).astype(np.float32)
         for s in (32, 32, 16, 16)]
        for _ in range(n)
    ]


def _decay_split(tm):
    """Reference add_weight_decay + wd_skip_fn("dino") (train_util.py:87-111,
    factory.py:36-37): skip = "bias" in name or ndim == 1.  Note the
    weight-normed gain is (out, 1) in torch — ndim 2 — so it DECAYS."""
    decay, no_decay = [], []
    for n, p in tm.named_parameters():
        if not p.requires_grad:
            continue
        (no_decay if ("bias" in n or p.ndim == 1) else decay).append(p)
    return decay, no_decay


def _init_single_process_group():
    """DINOLoss.update_center calls torch.distributed.all_reduce unguarded
    (reference loss.py:146-148); give it a 1-process gloo group so the
    reference code runs verbatim."""
    if not torch.distributed.is_initialized():
        import tempfile

        store_file = tempfile.NamedTemporaryFile(delete=False)
        torch.distributed.init_process_group(
            "gloo", init_method=f"file://{store_file.name}",
            rank=0, world_size=1)


def _torch_trajectory(tm, batches, wd_sched, mom_sched, steps, freeze,
                      checkpoints=CHECKPOINTS):
    """Reference train loop replay (train_dino.py:218-261)."""
    from loss import DINOLoss
    from models.vit import dino as torch_dino
    from train_util import cancel_last_layer_grad

    # deepcopy is unsupported on weight_norm'd modules — rebuild + load
    _init_single_process_group()
    teacher = torch_dino(**DINO_KW)
    teacher.load_state_dict(tm.state_dict())
    for p in teacher.parameters():
        p.requires_grad = False
    tm.train()
    teacher.train()

    criterion = DINOLoss(DINO_KW["dim_head_out"], N_CROP, TEMP_WARM, TEMP,
                         TEMP_WARM_EPOCH, N_EPOCH)
    decay, no_decay = _decay_split(tm)
    optimizer = torch.optim.AdamW(
        [{"params": no_decay, "weight_decay": 0.0, "no_decay": True},
         {"params": decay, "weight_decay": WD}],
        lr=LR, betas=(0.9, 0.999), eps=1e-8)
    params = list(tm.parameters())

    snapshots, norms = {}, []
    for t in range(steps):
        epoch = t // EPOCH_LEN
        inputs = [torch.tensor(c.transpose(0, 3, 1, 2))
                  for c in batches[t % len(batches)]]
        with torch.no_grad():
            teacher_out = teacher(inputs[:2])
        loss = criterion(tm(inputs), teacher_out, epoch)
        loss.backward()
        for pg in optimizer.param_groups:
            if "no_decay" not in pg:
                pg["weight_decay"] = wd_sched[t]
        norms.append(float(torch.nn.utils.clip_grad_norm_(params, CLIP)))
        cancel_last_layer_grad(epoch, tm, freeze)
        optimizer.step()
        optimizer.zero_grad(set_to_none=True)
        with torch.no_grad():
            m = mom_sched[t]
            for pq, pk in zip(tm.parameters(), teacher.parameters()):
                pk.detach().mul_(m).add_(pq.detach(), alpha=1 - m)
        if (t + 1) in checkpoints:
            snapshots[t + 1] = (copy.deepcopy(tm.state_dict()),
                                copy.deepcopy(teacher.state_dict()),
                                criterion.center.clone())
    return snapshots, norms


def _ours_trajectory(sd0, batches, wd_sched, mom_sched, steps, freeze,
                     checkpoints=CHECKPOINTS):
    cfg_dict = {"type": "dino", **DINO_KW}
    model = registry.build("model", cfg_dict).make()
    params0 = jax.tree.map(jnp.asarray,
                           convert_variables(cfg_dict, sd0)["params"])

    train_conf = Training(
        optimizer={"type": "adamw", "lr": LR},
        scheduler={"type": "constant", "lr": LR},
        base_lr=LR, weight_decay=WD, wd_skip="dino", epoch=N_EPOCH,
        agc=0.0, clip_grad_norm=CLIP, grad_accumulation=1,
    )
    temp_sched = teacher_temperature_schedule(TEMP_WARM, TEMP,
                                              TEMP_WARM_EPOCH, N_EPOCH)
    tx, train_step = make_dino_train_step(
        train_conf, model, model, params0, lambda t: LR, wd_sched, N_CROP)
    state = DINOTrainState(
        step=jnp.zeros((), jnp.int32), student=params0,
        teacher=jax.tree.map(jnp.copy, params0), opt_state=tx.init(params0),
        center=jnp.zeros((1, DINO_KW["dim_head_out"]), jnp.float32),
    )
    step_jit = jax.jit(train_step)
    key = jax.random.PRNGKey(0)

    snapshots = {}
    for t in range(steps):
        epoch = t // EPOCH_LEN
        crops = [jnp.asarray(c) for c in batches[t % len(batches)]]
        state, metrics = step_jit(state, crops, key,
                                  jnp.float32(temp_sched[epoch]),
                                  jnp.float32(mom_sched[t]),
                                  jnp.int32(freeze > epoch))
        if (t + 1) in checkpoints:
            snapshots[t + 1] = jax.device_get(
                (state.student, state.teacher, state.center))
    assert np.isfinite(float(metrics["loss"]))
    return params0, snapshots


def _compare(cfg_dict, params0, ours, theirs, steps_to_check):
    flat_init = dict(jax.tree_util.tree_leaves_with_path(params0))
    for step in steps_to_check:
        student, teacher, center = ours[step]
        sd_s, sd_t, t_center = theirs[step]
        for got, sd, tag in ((student, sd_s, "param"), (teacher, sd_t, "ema")):
            want = convert_variables(cfg_dict, sd)["params"]
            flat_w = dict(jax.tree_util.tree_leaves_with_path(want))
            for path, leaf in jax.tree_util.tree_leaves_with_path(got):
                _assert_traj_close(leaf, flat_w[path], flat_init[path], tag,
                                   jax.tree_util.keystr(path), step)
        _assert_traj_close(center, t_center.numpy(),
                           np.zeros_like(t_center.numpy()), "param",
                           "center", step)


def test_fifty_step_dino_trajectory_matches_reference():
    from models.vit import dino as torch_dino

    torch.manual_seed(0)
    tm = torch_dino(**DINO_KW)
    with torch.no_grad():  # unit gains hide wd/grad mapping bugs — randomize
        for name, p in tm.named_parameters():
            if "weight_g" in name:
                p.normal_(1.0, 0.2)
    sd0 = copy.deepcopy(tm.state_dict())

    wd_sched = cosine_schedule(WD, WD_END, STEPS)
    mom_sched = cosine_schedule(TEACHER_M, 1.0, STEPS)
    batches = _make_batches()

    theirs, norms = _torch_trajectory(tm, batches, wd_sched, mom_sched,
                                      STEPS, freeze=0)
    # the clip path must actually engage for this test to pin its math
    assert max(norms) > CLIP, f"clip never engaged (max norm {max(norms):.3f})"

    cfg_dict = {"type": "dino", **DINO_KW}
    params0, ours = _ours_trajectory(sd0, batches, wd_sched, mom_sched,
                                     STEPS, freeze=0)
    _compare(cfg_dict, params0, ours, theirs, CHECKPOINTS)


def test_dino_freeze_ordering_matches_reference():
    """freeze_last_layer: frozen params stay at init on BOTH sides (no step,
    no weight decay) while the other params' clip scale still includes the
    last-layer grads in the global norm (reference train_dino.py:240-250 —
    cancel AFTER clip)."""
    from models.vit import dino as torch_dino

    torch.manual_seed(1)
    tm = torch_dino(**DINO_KW)
    sd0 = copy.deepcopy(tm.state_dict())

    steps = 10
    wd_sched = cosine_schedule(WD, WD_END, steps)
    mom_sched = cosine_schedule(TEACHER_M, 1.0, steps)
    batches = _make_batches(seed=11)

    theirs, norms = _torch_trajectory(tm, batches, wd_sched, mom_sched,
                                      steps, freeze=1)
    assert max(norms) > CLIP, f"clip never engaged (max norm {max(norms):.3f})"

    cfg_dict = {"type": "dino", **DINO_KW}
    params0, ours = _ours_trajectory(sd0, batches, wd_sched, mom_sched,
                                     steps, freeze=1)

    # frozen leaves exactly at init
    student, _, _ = ours[10]
    for name in ("last_v", "last_g"):
        got = student["head"][name]
        np.testing.assert_array_equal(np.asarray(got),
                                      np.asarray(params0["head"][name]))
    sd_s, _, _ = theirs[10]
    for k in ("head.last.weight_v", "head.last.weight_g"):
        np.testing.assert_array_equal(sd_s[k].numpy(), sd0[k].numpy())

    _compare(cfg_dict, params0, ours, theirs, (10,))


def test_dino_freeze_boundary_matches_reference():
    """Trajectory parity ACROSS the freeze boundary: torch AdamW skips the
    moment AND per-param step update for grad-None params
    (train_dino.py:240-250 sets p.grad = None during the freeze epoch), so
    after the freeze the last layer's exp_avg/exp_avg_sq start from their
    pre-freeze values and its bias correction runs at
    ``global_step - frozen_steps``.  The first post-freeze update (step 11,
    bias correction 1/(1-β₁) ≈ 10× the late-step magnitude) and the
    compounded tail (step 30) are both checked leaf-for-leaf."""
    from models.vit import dino as torch_dino

    torch.manual_seed(2)
    tm = torch_dino(**DINO_KW)
    with torch.no_grad():
        for name, p in tm.named_parameters():
            if "weight_g" in name:
                p.normal_(1.0, 0.2)
    sd0 = copy.deepcopy(tm.state_dict())

    steps = 30  # EPOCH_LEN=10, freeze=1 → steps 0-9 frozen, 10-29 live
    checkpoints = (10, 11, 30)
    wd_sched = cosine_schedule(WD, WD_END, steps)
    mom_sched = cosine_schedule(TEACHER_M, 1.0, steps)
    batches = _make_batches(seed=7)

    theirs, norms = _torch_trajectory(tm, batches, wd_sched, mom_sched,
                                      steps, freeze=1,
                                      checkpoints=checkpoints)
    assert max(norms) > CLIP, f"clip never engaged (max norm {max(norms):.3f})"

    cfg_dict = {"type": "dino", **DINO_KW}
    params0, ours = _ours_trajectory(sd0, batches, wd_sched, mom_sched,
                                     steps, freeze=1,
                                     checkpoints=checkpoints)
    _compare(cfg_dict, params0, ours, theirs, checkpoints)
