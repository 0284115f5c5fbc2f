"""EfficientNet / NFNet / NF-EfficientNet tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vision_transformers_tpu.config import registry
from vision_transformers_tpu.models.efficientnet import round_filters, round_repeats


def test_round_filters_matches_reference_math():
    # (reference: models/efficientnet.py:12-22)
    assert round_filters(32, None) == 32
    assert round_filters(32, 1.0, 8) == 32
    assert round_filters(32, 1.1, 8) == 32  # 35.2 -> 32; 32 >= 0.9*35.2
    assert round_filters(24, 1.1, 8) == 24  # 26.4 -> 24 -> 24 >= 0.9*26.4
    assert round_filters(16, 1.4, 8) == 24  # 22.4 -> 24
    assert round_filters(40, 1.1, 8) == 48  # 44 -> 48
    assert round_filters(8, 1.1, 8) == 8    # 8.8 -> 8 -> 8 < 7.92? no: 8 >= 7.92


def test_round_repeats():
    assert round_repeats(3, None) == 3
    assert round_repeats(3, 1.1) == 4
    assert round_repeats(2, 2.0) == 4


@pytest.fixture(scope="module")
def tiny_effnet():
    cfg = registry.build("model", {"type": "efficientnetv2", "width": 0.25,
                                   "depth": 0.25, "n_class": 10, "drop_path": 0.1})
    model = cfg.make()
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    return model, variables


def test_effnetv2_forward_and_stats(tiny_effnet):
    model, variables = tiny_effnet
    assert "batch_stats" in variables
    out = model.apply(variables, jnp.ones((2, 64, 64, 3)))
    assert out.shape == (2, 10)
    assert bool(jnp.isfinite(out).all())


def test_effnetv2_batch_stats_update(tiny_effnet):
    model, variables = tiny_effnet
    x = jnp.asarray(np.random.default_rng(0).normal(size=(4, 64, 64, 3)).astype(np.float32))
    out, updates = model.apply(variables, x, deterministic=False,
                               mutable=["batch_stats"],
                               rngs={"dropout": jax.random.PRNGKey(0)})
    old = jax.tree.leaves(variables["batch_stats"])
    new = jax.tree.leaves(updates["batch_stats"])
    changed = any(not np.allclose(np.asarray(a), np.asarray(b)) for a, b in zip(old, new))
    assert changed


def test_effnet_b0_structure():
    cfg = registry.build("model", {"type": "efficientnet", "width": 1.0,
                                   "depth": 1.0, "n_class": 10})
    model = cfg.make()
    blocks = model.expand_blocks()
    # B0: 1+2+2+3+3+4+1 = 16 blocks
    assert len(blocks) == 16
    assert blocks[0]["expand_ratio"] == 1
    assert blocks[-1]["out_channel"] == 320


def test_effnet_depth_scaling():
    cfg = registry.build("model", {"type": "efficientnet", "width": 1.0,
                                   "depth": 2.0, "n_class": 10})
    blocks = cfg.make().expand_blocks()
    assert len(blocks) == 2 * 16


def test_effnet_presets_conf_addressable():
    """B1-B7 presets build from the conf (reference efficientnet_b1..b7,
    models/efficientnet.py:287-312) with paper dropout/resolution defaults."""
    from vision_transformers_tpu.models.efficientnet import EFFICIENTNET_PRESETS

    preset = registry.build("model", {"type": "efficientnet", "preset": "b2",
                                      "n_class": 10})
    explicit = registry.build("model", {"type": "efficientnet", "width": 1.1,
                                        "depth": 1.2, "dropout": 0.3,
                                        "n_class": 10})
    m_p, m_e = preset.make(), explicit.make()
    assert m_p.width == m_e.width == 1.1
    assert m_p.depth == m_e.depth == 1.2
    assert m_p.dropout == 0.3  # paper default for b2
    assert preset.default_size == 260
    # identical architecture → identical block expansion
    assert m_p.expand_blocks() == m_e.expand_blocks()
    # explicit keys override the preset
    over = registry.build("model", {"type": "efficientnet", "preset": "b2",
                                    "dropout": 0.1, "width": 2.0, "n_class": 10})
    m_o = over.make()
    assert m_o.width == 2.0 and m_o.depth == 1.2 and m_o.dropout == 0.1
    # every preset resolves
    for name in EFFICIENTNET_PRESETS:
        registry.build("model", {"type": "efficientnet", "preset": name}).make()
    with pytest.raises(ValueError):
        registry.build("model", {"type": "efficientnet", "preset": "b9"}).make()


@pytest.fixture(scope="module")
def tiny_nfnet():
    cfg = registry.build(
        "model",
        {"type": "nfnet", "n_class": 10, "channels": [16, 32, 64, 64],
         "depths": [1, 1, 1, 1], "groups": [8, 8, 8, 8], "stochastic_depth": 0.1},
    )
    model = cfg.make()
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    return model, params


def test_nfnet_forward(tiny_nfnet):
    model, params = tiny_nfnet
    out = model.apply(params, jnp.ones((2, 64, 64, 3)))
    assert out.shape == (2, 10)
    assert bool(jnp.isfinite(out).all())


def test_nfnet_skipinit_zero_gain_passthrough(tiny_nfnet):
    """With skip_gain=0 (init), each block is ~identity on the skip path:
    output of a non-downsampling block equals its input."""
    from vision_transformers_tpu.models.nfnet import NFBlock

    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 8, 8, 16)).astype(np.float32))
    block = NFBlock(in_channel=16, out_channel=16, stride=1, group_size=4)
    params = block.init(jax.random.PRNGKey(0), x)
    out = block.apply(params, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-6)


def test_nfnet_grads(tiny_nfnet):
    model, params = tiny_nfnet
    g = jax.grad(lambda p: model.apply(p, jnp.ones((1, 64, 64, 3))).sum())(params)
    for path, leaf in jax.tree_util.tree_leaves_with_path(g):
        assert bool(jnp.isfinite(leaf).all()), path


def test_wsconv_standardization():
    """WSConv weight has ~zero mean / unit variance per output channel."""
    from vision_transformers_tpu.models.layers import WSConv

    x = jnp.ones((1, 8, 8, 4))
    conv = WSConv(8, (3, 3), padding=1)
    params = conv.init(jax.random.PRNGKey(3), x)
    # standardized weight reproduced manually
    kernel = np.asarray(params["params"]["kernel"])
    gain = np.asarray(params["params"]["gain"])
    mean = kernel.mean(axis=(0, 1, 2), keepdims=True)
    var = kernel.var(axis=(0, 1, 2), keepdims=True)
    w = (kernel - mean) / np.sqrt(var + 1e-10)
    fan_in = 3 * 3 * 4
    w = w * (gain * fan_in**-0.5)
    std = w / (gain * fan_in**-0.5)
    np.testing.assert_allclose(std.mean(axis=(0, 1, 2)), 0.0, atol=1e-5)
    np.testing.assert_allclose(std.std(axis=(0, 1, 2)), 1.0, atol=1e-3)


@pytest.fixture(scope="module")
def tiny_nfeffnet():
    cfg = registry.build("model", {"type": "nfefficientnetv2", "width": 0.25,
                                   "depth": 0.25, "n_class": 10, "drop_path": 0.1})
    model = cfg.make()
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    return model, params


def test_nfeffnetv2_forward(tiny_nfeffnet):
    model, params = tiny_nfeffnet
    out = model.apply(params, jnp.ones((2, 64, 64, 3)))
    assert out.shape == (2, 10)
    assert bool(jnp.isfinite(out).all())
    # normalizer-free: no batch_stats collection at all
    assert set(params.keys()) == {"params"}


def test_nfeffnet_v1_factory_builds():
    """Reference's nfefficientnet factory NameErrors (models/nfefficientnet.py:311);
    ours must build."""
    cfg = registry.build("model", {"type": "nfefficientnet", "width": 0.25,
                                   "depth": 0.25, "n_class": 10})
    model = cfg.make()
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    out = model.apply(params, jnp.ones((1, 32, 32, 3)))
    assert out.shape == (1, 10)


def test_nf_expand_blocks_beta_recursion():
    """expected-std bookkeeping (reference :173-211): betas follow
    1/sqrt(1 + k*alpha^2) within a skip-chain and reset after non-skip blocks."""
    from vision_transformers_tpu.models.nfefficientnet import nf_expand_blocks

    alpha = 0.2
    configs = (
        {"n_repeat": 2, "kernel_size": 3, "stride": 1, "expand_ratio": 1,
         "in_channel": 24, "out_channel": 24, "fused": True, "se": None},
        {"n_repeat": 2, "kernel_size": 3, "stride": 2, "expand_ratio": 4,
         "in_channel": 24, "out_channel": 48, "fused": True, "se": None},
    )
    blocks = nf_expand_blocks(configs, None, 8, None, None, alpha)
    assert len(blocks) == 4
    np.testing.assert_allclose(blocks[0]["beta"], 1.0)
    # second block of stage 1: std = sqrt(1 + a^2)
    np.testing.assert_allclose(blocks[1]["beta"], (1 + alpha**2) ** -0.5)
    # stage 2 first block (stride 2, non-skip): beta = 1/std accumulated
    np.testing.assert_allclose(blocks[2]["beta"], (1 + 2 * alpha**2) ** -0.5)
    # non-skip reset → next repeat has beta 1 (std reset to 1, accumulation skipped)
    np.testing.assert_allclose(blocks[3]["beta"], 1.0)
