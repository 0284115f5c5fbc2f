"""scan_layers: the lax.scan layer stack must match the unrolled stack
exactly given the same (stacked) params — logits, grads, multi-crop path.

The scan exists to shrink the XLA graph ~depth× (the DINO 224/chip compile
blowup, PERF.md round 4); it must be a pure compile-time transform."""

import jax
import jax.numpy as jnp
import numpy as np

from vision_transformers_tpu.config import registry
from vision_transformers_tpu.models.vit import (stack_scan_layers,
                                                unstack_scan_layers)

ARCH = {"type": "vit", "image_size": 32, "window_size": 8, "n_class": 10,
        "depth": 3, "dim": 32, "n_head": 2, "dim_ff": 64}


def _models():
    loop = registry.build("model", dict(ARCH)).make()
    scan = registry.build("model", dict(ARCH, scan_layers=True)).make()
    return loop, scan


def test_scan_matches_loop_logits_and_grads():
    loop, scan = _models()
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 32, 32, 3)).astype(np.float32))
    params = loop.init(jax.random.PRNGKey(0), x)["params"]
    stacked = stack_scan_layers(params, 3)

    ref = loop.apply({"params": params}, x)
    out = scan.apply({"params": stacked}, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)

    g_ref = jax.grad(lambda p: loop.apply({"params": p}, x).sum())(params)
    g = jax.grad(lambda p: scan.apply({"params": p}, x).sum())(stacked)
    g_un = unstack_scan_layers(g, 3)
    for (pa, a), (_, b) in zip(
        sorted(jax.tree_util.tree_leaves_with_path(g_un),
               key=lambda kv: str(kv[0])),
        sorted(jax.tree_util.tree_leaves_with_path(g_ref),
               key=lambda kv: str(kv[0])),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5, err_msg=str(pa))


def test_stack_roundtrip():
    loop, _ = _models()
    x = jnp.zeros((1, 32, 32, 3))
    params = loop.init(jax.random.PRNGKey(1), x)["params"]
    back = unstack_scan_layers(stack_scan_layers(params, 3), 3)
    for (pa, a), (_, b) in zip(
        sorted(jax.tree_util.tree_leaves_with_path(back),
               key=lambda kv: str(kv[0])),
        sorted(jax.tree_util.tree_leaves_with_path(params),
               key=lambda kv: str(kv[0])),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b), str(pa))


def test_scan_multicrop_droppath_finite():
    """DINO-shaped usage: multi-crop list input, drop_path ramp, training
    mode — packed locals take the token-level rs_override path."""
    cfg = registry.build(
        "model",
        {"type": "dino", "image_size": 32, "window_size": 8, "depth": 3,
         "dim": 32, "n_head": 2, "dim_ff": 64, "dim_head_out": 64,
         "dim_head_ff": 32, "dim_head_bottleneck": 16, "drop_path": 0.5,
         "scan_layers": True},
    ).make()
    rng = np.random.default_rng(3)
    crops = [jnp.asarray(rng.normal(size=(4, 32, 32, 3)).astype(np.float32)),
             jnp.asarray(rng.normal(size=(4, 32, 32, 3)).astype(np.float32)),
             jnp.asarray(rng.normal(size=(12, 16, 16, 3)).astype(np.float32))]
    variables = cfg.init(jax.random.PRNGKey(0), crops)
    out = cfg.apply(variables, crops, False,
                    rngs={"dropout": jax.random.PRNGKey(7)})
    assert np.isfinite(np.asarray(out)).all()
    det = cfg.apply(variables, crops, True)
    assert np.isfinite(np.asarray(det)).all()


def test_scan_dino_matches_loop_deterministic():
    """DINO backbone (n_class=None) scan vs loop on the multi-crop forward."""
    base = {"type": "dino", "image_size": 32, "window_size": 8, "depth": 3,
            "dim": 32, "n_head": 2, "dim_ff": 64, "dim_head_out": 64,
            "dim_head_ff": 32, "dim_head_bottleneck": 16}
    loop = registry.build("model", dict(base)).make()
    scan = registry.build("model", dict(base, scan_layers=True)).make()
    rng = np.random.default_rng(5)
    crops = [jnp.asarray(rng.normal(size=(2, 32, 32, 3)).astype(np.float32)),
             jnp.asarray(rng.normal(size=(6, 16, 16, 3)).astype(np.float32))]
    variables = loop.init(jax.random.PRNGKey(0), crops)
    stacked = stack_scan_layers(variables["params"], 3)
    ref = loop.apply(variables, crops, True)
    out = scan.apply({"params": stacked}, crops, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_optimizer_equivalent_under_scan():
    """AdamW + wd_skip + AGC must treat the stacked tree exactly like the
    per-layer tree (scan-aware ndim rules + unit norms, train/optim.py)."""
    from vision_transformers_tpu.config.schema import Training
    from vision_transformers_tpu.train.optim import make_optimizer

    loop, _ = _models()
    x = jnp.zeros((1, 32, 32, 3))
    params = loop.init(jax.random.PRNGKey(2), x)["params"]
    rng = np.random.default_rng(9)
    grads = jax.tree.map(
        lambda p: jnp.asarray(rng.normal(size=p.shape).astype(np.float32)),
        params)
    for skip in ("vit", "dino"):
        tr = Training(
            optimizer={"type": "adamw", "lr": 1e-3},
            scheduler={"type": "constant", "lr": 1e-3},
            base_lr=1e-3, weight_decay=0.05, wd_skip=skip, epoch=1,
            clip_grad_norm=0.0, agc=0.01,
        )
        tx = make_optimizer(tr, params, lambda c: 1e-3)
        st = tx.init(params)
        up, _ = tx.update(grads, st, params)
        new_loop = jax.tree.map(lambda p, u: p + u, params, up)

        sp = stack_scan_layers(params, 3)
        sg = stack_scan_layers(grads, 3)
        txs = make_optimizer(tr, sp, lambda c: 1e-3)
        sts = txs.init(sp)
        ups, _ = txs.update(sg, sts, sp)
        new_scan = unstack_scan_layers(
            jax.tree.map(lambda p, u: p + u, sp, ups), 3)
        for (pa, a), (_, b) in zip(
            sorted(jax.tree_util.tree_leaves_with_path(new_scan),
                   key=lambda kv: str(kv[0])),
            sorted(jax.tree_util.tree_leaves_with_path(new_loop),
                   key=lambda kv: str(kv[0])),
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7,
                err_msg=f"{skip} {pa}")


def test_torch_convert_stacks_for_scan_arch():
    """convert_variables() must produce the stacked tree when the arch has
    scan_layers (finetune= / convert.py path, torch_convert.py)."""
    import sys as _sys
    import test_torch_parity  # noqa: F401 — installs the tensorfn stub
    import torch
    from models.vit import VisionTransformer as TorchViT

    from vision_transformers_tpu.utils.torch_convert import convert_variables

    torch.manual_seed(0)
    tm = TorchViT(head=torch.nn.Linear(32, 10), image_size=32,
                  window_size=8, depth=3, dim=32, n_head=2, dim_ff=64,
                  dropout=0, drop_attn=0, drop_ff=0, drop_path=0)
    arch = dict(ARCH, scan_layers=True)
    variables = convert_variables(arch, tm.state_dict())
    p = variables["params"]
    assert "layers" in p and "layer" in p["layers"], sorted(p)
    qkv = p["layers"]["layer"]["attn"]["qkv"]["kernel"]
    assert qkv.shape[0] == 3, qkv.shape  # leading depth axis
    # and the stacked model accepts it + matches torch logits
    scan = registry.build("model", arch).make()
    rng = np.random.default_rng(11)
    x = np.asarray(rng.normal(size=(2, 32, 32, 3)), np.float32)
    ours = scan.apply(variables, jnp.asarray(x))
    with torch.no_grad():
        theirs = tm(torch.from_numpy(x).permute(0, 3, 1, 2)).numpy()
    np.testing.assert_allclose(np.asarray(ours), theirs, atol=2e-4,
                               rtol=2e-4)
