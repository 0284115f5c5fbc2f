"""Swin tests: window machinery golden checks + model forward/grad."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vision_transformers_tpu.config import registry
from vision_transformers_tpu.models import swin


def test_patchify_feature_order():
    # 1x2x2x1 image: features must flatten as (sy, sx, d)
    x = jnp.asarray(np.arange(4, dtype=np.float32).reshape(1, 2, 2, 1))
    out = swin.patchify(x, 2)
    assert out.shape == (1, 1, 1, 4)
    np.testing.assert_array_equal(np.asarray(out)[0, 0, 0], [0, 1, 2, 3])


def test_relative_position_index_is_standard():
    w = 3
    idx = swin.relative_position_index(w)
    assert idx.shape == (9, 9)
    # self-pairs land on the table center
    center = (w - 1) * (2 * w - 1) + (w - 1)
    np.testing.assert_array_equal(np.diag(idx), center)
    # full index range covered exactly
    assert idx.min() == 0 and idx.max() == (2 * w - 1) ** 2 - 1
    # symmetry: idx[i,j] mirrors idx[j,i] around the center
    dy = idx // (2 * w - 1) - (w - 1)
    dx = idx % (2 * w - 1) - (w - 1)
    np.testing.assert_array_equal(dy, -dy.T)
    np.testing.assert_array_equal(dx, -dx.T)


def test_shifted_window_mask_first_principles():
    """Mask per reference criterion: attend iff |Δy|<w and |Δx|<w on pre-roll coords."""
    h = w_img = 8
    w = 4
    mask = swin.shifted_window_mask((h, w_img), w)
    assert mask.shape == (4, 16, 16)

    # recompute naively: token t of window s has original coords derived from
    # the rolled grid
    roll = w // 2
    yy = np.roll(np.arange(h)[:, None].repeat(w_img, 1), (-roll, -roll), (0, 1))
    xx = np.roll(np.arange(w_img)[None, :].repeat(h, 0), (-roll, -roll), (0, 1))
    for s in range(4):
        sy, sx = divmod(s, w_img // w)
        coords = [
            (yy[sy * w + i, sx * w + j], xx[sy * w + i, sx * w + j])
            for i in range(w)
            for j in range(w)
        ]
        for q in range(16):
            for k in range(16):
                local = abs(int(coords[q][0]) - int(coords[k][0])) < w and \
                        abs(int(coords[q][1]) - int(coords[k][1])) < w
                assert (mask[s, q, k] == 0.0) == local, (s, q, k)


def test_unshifted_window_attention_equals_per_window_mhsa():
    """Window attention == plain MHSA run independently on each window."""
    rng = np.random.default_rng(0)
    b, h, w_img, dim = 2, 8, 8, 16
    window, n_head, dim_head = 4, 2, 8
    x = jnp.asarray(rng.normal(size=(b, h, w_img, dim)).astype(np.float32))

    attn = swin.WindowAttention(n_head, dim_head, (h, w_img), window, shift=False)
    params = attn.init(jax.random.PRNGKey(0), x)
    out = attn.apply(params, x)
    assert out.shape == x.shape

    # manual per-window computation with the same params
    kw = np.asarray(params["params"]["weight"]["kernel"])
    bw = np.asarray(params["params"]["weight"]["bias"])
    ko = np.asarray(params["params"]["linear"]["kernel"])
    bo = np.asarray(params["params"]["linear"]["bias"])
    inner = n_head * dim_head

    xs = np.asarray(x)
    expected = np.zeros((b, h, w_img, dim), np.float32)
    for wy in range(h // window):
        for wx in range(w_img // window):
            blk = xs[:, wy * window:(wy + 1) * window, wx * window:(wx + 1) * window]
            tok = blk.reshape(b, window * window, dim)
            qkv = tok @ kw + bw
            q, k, v = np.split(qkv, 3, axis=-1)
            q = q.reshape(b, -1, n_head, dim_head).transpose(0, 2, 1, 3)
            k = k.reshape(b, -1, n_head, dim_head).transpose(0, 2, 1, 3)
            v = v.reshape(b, -1, n_head, dim_head).transpose(0, 2, 1, 3)
            score = q @ k.transpose(0, 1, 3, 2) / np.sqrt(dim_head)
            p = np.exp(score - score.max(-1, keepdims=True))
            p = p / p.sum(-1, keepdims=True)
            o = (p @ v).transpose(0, 2, 1, 3).reshape(b, -1, inner)
            o = o @ ko + bo
            expected[:, wy * window:(wy + 1) * window, wx * window:(wx + 1) * window] = \
                o.reshape(b, window, window, dim)

    np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-4, atol=1e-5)


def test_shift_roll_roundtrip():
    """Shifted attention rolls back: output stays aligned with the input grid."""
    b, h, w_img, dim = 1, 8, 8, 8
    x = jnp.asarray(np.random.default_rng(1).normal(size=(b, h, w_img, dim)).astype(np.float32))
    attn = swin.WindowAttention(2, 4, (h, w_img), 4, shift=True)
    params = attn.init(jax.random.PRNGKey(0), x)
    out = attn.apply(params, x)
    assert out.shape == x.shape
    assert bool(jnp.isfinite(out).all())


@pytest.fixture(scope="module")
def tiny_swin():
    cfg = registry.build(
        "model",
        {"type": "swin_transformer", "image_size": [64, 64], "n_class": 10,
         "depths": [1, 1, 1, 1], "dims": [8, 16, 32, 64], "dim_head": 4,
         "n_heads": [2, 4, 8, 16], "dim_ffs": [16, 32, 64, 128],
         "window_size": 2, "drop_path": 0.1},
    )
    model = cfg.make()
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    return model, params


def test_swin_forward_shape(tiny_swin):
    model, params = tiny_swin
    out = model.apply(params, jnp.ones((2, 64, 64, 3)))
    assert out.shape == (2, 10)
    assert bool(jnp.isfinite(out).all())


def test_swin_grad_flows_everywhere(tiny_swin):
    model, params = tiny_swin

    def loss(p, x):
        return model.apply(p, x).sum()

    g = jax.grad(loss)(params, jnp.ones((2, 64, 64, 3)))
    flat = jax.tree_util.tree_leaves_with_path(g)
    # all grads finite; rel_pos tables may be zero-grad only if bias cancels —
    # check qkv/ff kernels specifically get nonzero grads
    for path, leaf in flat:
        assert bool(jnp.isfinite(leaf).all()), path
    nonzero = [
        p for p, l in flat
        if "kernel" in str(p) and float(jnp.abs(l).sum()) > 0
    ]
    assert len(nonzero) > 10


def test_swin_train_mode_stochastic(tiny_swin):
    model, params = tiny_swin
    x = jnp.ones((4, 64, 64, 3))
    a = model.apply(params, x, deterministic=False, rngs={"dropout": jax.random.PRNGKey(1)})
    b = model.apply(params, x, deterministic=False, rngs={"dropout": jax.random.PRNGKey(2)})
    assert not np.allclose(np.asarray(a), np.asarray(b))


def test_swin_s_config_from_conf_file():
    """The Swin-S conf mirroring the reference's validates + builds."""
    import os

    from vision_transformers_tpu.config.schema import load_config

    path = os.path.join(os.path.dirname(__file__), "..", "configs", "swin-transformer-s.conf")
    conf = load_config(path)
    assert conf.arch.type == "swin_transformer"
    assert conf.arch.depths == (2, 2, 18, 2)
    model = conf.arch.make()
    assert model.dims == (96, 192, 384, 768)
