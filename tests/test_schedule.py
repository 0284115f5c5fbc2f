"""LR schedule tests (reference semantics: lr_scheduler.py, tensorfn cycle/exp_epoch)."""

import jax.numpy as jnp
import numpy as np

from vision_transformers_tpu.config import registry
from vision_transformers_tpu.train import schedule as S


def test_cycle_warmup_and_decay():
    conf = registry.build("scheduler", {"type": "cycle", "lr": 1.0, "warmup": 0})
    sched = conf.make(lr=1.0, n_iter=100, warmup=10)
    # warmup: rises from initial_multiplier*lr toward lr
    v0 = float(sched(0))
    v9 = float(sched(9))
    assert v0 < v9 <= 1.0 + 1e-6
    # peak right after warmup
    np.testing.assert_allclose(float(sched(9)), 1.0, rtol=1e-5)
    # decays to final multiplier at the end
    v_end = float(sched(99))
    assert v_end < 0.01
    # monotone decay after warmup
    vals = [float(sched(i)) for i in range(10, 100, 10)]
    assert all(a >= b for a, b in zip(vals, vals[1:]))


def test_exp_epoch():
    epoch_len = 100
    conf = registry.build(
        "scheduler",
        {"type": "exp_epoch", "lr": 1.0, "epoch": 2.0, "gamma": 0.5, "warmup": 0},
    )
    sched = conf.make(lr=1.0, epoch_len=epoch_len, warmup=100)
    assert float(sched(0)) < 0.05  # warmup start
    np.testing.assert_allclose(float(sched(99)), 1.0, rtol=1e-4)  # end of warmup
    np.testing.assert_allclose(float(sched(100)), 1.0, rtol=1e-5)  # first interval
    np.testing.assert_allclose(float(sched(300)), 0.5, rtol=1e-5)  # after 2 epochs
    np.testing.assert_allclose(float(sched(500)), 0.25, rtol=1e-5)


def test_step_scheduler():
    conf = registry.build(
        "scheduler",
        {"type": "step", "lr": 1.0, "milestones": [10, 20], "gamma": 0.1, "warmup": 0},
    )
    sched = conf.make(lr=1.0, n_iter=30, warmup=0)
    np.testing.assert_allclose(float(sched(5)), 1.0, rtol=1e-5)
    np.testing.assert_allclose(float(sched(15)), 0.1, rtol=1e-5)
    np.testing.assert_allclose(float(sched(25)), 0.01, rtol=1e-5)


def test_cosine_schedule_list():
    """(reference train_util.py:6-22: DINO wd/momentum schedules)."""
    out = S.cosine_schedule(base=0.04, final=0.4, step=10, warmup=0)
    assert len(out) == 10
    np.testing.assert_allclose(out[0], 0.04, rtol=1e-6)
    assert abs(out[-1] - 0.4) < 0.02
    # with warmup
    out = S.cosine_schedule(base=1.0, final=0.5, step=10, warmup=4, warmup_start=0.0)
    np.testing.assert_allclose(out[0], 0.0, atol=1e-8)
    np.testing.assert_allclose(out[3], 1.0, rtol=1e-6)


def test_make_schedule_linear_scaling():
    """LR linear-scaling rule lr = base_lr * batch / 256 (reference factory.py:42-45)."""

    class DL:
        batch_size = 512

    class TC:
        base_lr = 1e-3
        epoch = 10
        dataloader = DL
        scheduler = registry.build("scheduler", {"type": "constant", "lr": 0.0})

    sched = S.make_schedule(TC, epoch_len=100)
    np.testing.assert_allclose(float(sched(0)), 2e-3, rtol=1e-6)


def test_cycle_matches_reference_phase_scheduler_exactly():
    """Golden test against the reference's own PhaseScheduler
    (lr_scheduler.py:55-166 — dead code in the reference but the declared
    spec for `cycle` semantics): step() pre-increments, each phase emits
    phase_iter+1 values (the last overshooting the endpoint), and the lr
    freezes once the phases are exhausted.  The train loop calls
    scheduler.step() right before optimizer.step() (train.py:296-297), so
    optimizer step t sees the (t+1)-th returned value == schedule(t)."""
    import sys

    import torch

    from test_torch_parity import REF  # noqa: F401

    if REF not in sys.path:
        sys.path.insert(0, REF)
    import lr_scheduler as ref_sched

    LR = 0.3
    for warmup, plateau, n_iter in ((5, 0, 30), (0, 0, 20), (4, 3, 25)):
        opt = torch.optim.SGD([torch.nn.Parameter(torch.zeros(1))], lr=0.0)
        ref = ref_sched.cycle_scheduler(
            opt, lr=LR, n_iter=n_iter, initial_multiplier=1e-3,
            final_multiplier=1e-2, warmup=warmup, plateau=plateau)
        conf = registry.build(
            "scheduler", {"type": "cycle", "lr": LR, "warmup": 0,
                          "plateau": plateau, "initial_multiplier": 1e-3,
                          "final_multiplier": 1e-2})
        ours = conf.make(lr=LR, n_iter=n_iter, warmup=warmup)
        last = None
        for t in range(n_iter + 4):  # run past exhaustion: lr freezes
            r = ref.step()
            if r is None:
                r = last
            last = r
            np.testing.assert_allclose(  # f32 jnp.cos vs the f64 reference
                float(ours(t)), r, rtol=3e-5,
                err_msg=f"warmup={warmup} plateau={plateau} t={t}")


def test_step_matches_reference_step_scheduler_exactly():
    """Golden test against the reference step_scheduler
    (lr_scheduler.py:169-192) — constant phases between milestones at
    lr·γ^j, subject to PhaseScheduler's per-phase +1 call."""
    import sys

    import torch

    from test_torch_parity import REF  # noqa: F401

    if REF not in sys.path:
        sys.path.insert(0, REF)
    import lr_scheduler as ref_sched

    LR = 0.5
    for warmup, milestones, horizon in ((4, [10, 20], 30), (0, [8], 16),
                                        (3, [6, 9, 12], 20)):
        opt = torch.optim.SGD([torch.nn.Parameter(torch.zeros(1))], lr=0.0)
        ref = ref_sched.step_scheduler(opt, lr=LR, milestones=milestones,
                                       gamma=0.1, warmup=warmup,
                                       warmup_multiplier=4e-2)
        conf = registry.build(
            "scheduler", {"type": "step", "lr": LR, "milestones": milestones,
                          "gamma": 0.1, "warmup": 0,
                          "warmup_multiplier": 4e-2})
        ours = conf.make(lr=LR, n_iter=horizon, warmup=warmup)
        last = None
        for t in range(horizon):
            r = ref.step()
            if r is None:
                r = last
            last = r
            np.testing.assert_allclose(
                float(ours(t)), r, rtol=3e-5,
                err_msg=f"warmup={warmup} ms={milestones} t={t}")
