"""Weight-level parity vs the reference torch models.

Loads the *reference's own* model code (read-only, /root/reference), converts
its randomly-initialized state_dict into our flax parameter trees via the
production converter (``vision_transformers_tpu.utils.torch_convert`` — the
same path ``convert.py`` uses on real checkpoints), and asserts the two
frameworks produce the same logits on the same input.  This pins the math
end-to-end: layer order, shapes, attention layout, masks, rel-pos indices,
epsilons, activations — and the checkpoint converter with it.

Depths are chosen >1 where the reference's module indexing is nontrivial
(Twins interleaves a PEG after the first layer of every stage; Swin prepends
a PatchMerge; Halo/PVT offset by the embedding), so the converter's general
indexing is exercised, not just the depth-1 corner.

The reference imports `tensorfn` (not installed) purely for its registration
decorator; a no-op stub unlocks the modules.
"""

import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from vision_transformers_tpu.utils.torch_convert import convert_variables

# ---------------------------------------------------------------------------
# import the reference with a tensorfn stub
# ---------------------------------------------------------------------------

REF = "/root/reference"


def _install_stub():
    if "tensorfn" in sys.modules:
        return
    tensorfn = types.ModuleType("tensorfn")
    config = types.ModuleType("tensorfn.config")

    def config_model(*args, **kwargs):
        def deco(obj):
            return obj
        return deco

    config.config_model = config_model
    tensorfn.config = config
    sys.modules["tensorfn"] = tensorfn
    sys.modules["tensorfn.config"] = config


_install_stub()
if REF not in sys.path:
    sys.path.insert(0, REF)


def t2j(t):
    return np.asarray(t.detach().numpy())


# kept for test_optimizer_step_parity.py, which maps a few leaves by hand
def lin(sd, name):
    out = {"kernel": t2j(sd[f"{name}.weight"]).T}
    if f"{name}.bias" in sd:
        out["bias"] = t2j(sd[f"{name}.bias"])
    return out


def conv(sd, name):
    out = {"kernel": t2j(sd[f"{name}.weight"]).transpose(2, 3, 1, 0)}
    if f"{name}.bias" in sd:
        out["bias"] = t2j(sd[f"{name}.bias"])
    return out


def ln(sd, name):
    return {"scale": t2j(sd[f"{name}.weight"]), "bias": t2j(sd[f"{name}.bias"])}


def effv2_map(sd, blocks):
    """EfficientNetV2 state_dict → (params, batch_stats); shared with the
    50-step trajectory-parity test.  Thin shim over the converter's
    block-driven mapper."""
    from vision_transformers_tpu.utils.torch_convert import _SD, _effnet_blocks_map

    tsd = _SD({k: np.asarray(v) for k, v in sd.items()})
    return _effnet_blocks_map(tsd, blocks)


def _logits_close(cfg_dict, torch_model, x_np, image_size=None, rtol=3e-4,
                  atol=3e-5):
    """Convert the torch model's weights through the production converter and
    compare logits."""
    from vision_transformers_tpu.config import registry

    sd = {k: t2j(v) for k, v in torch_model.state_dict().items()}
    variables = convert_variables(cfg_dict, sd, image_size=image_size)
    model = registry.build("model", cfg_dict).make()
    ours = model.apply(variables, jnp.asarray(x_np))
    with torch.no_grad():
        theirs = torch_model(torch.tensor(x_np.transpose(0, 3, 1, 2)))
    np.testing.assert_allclose(np.asarray(ours), theirs.numpy(),
                               rtol=rtol, atol=atol)


# ---------------------------------------------------------------------------
# ViT
# ---------------------------------------------------------------------------

def test_vit_logits_match_reference():
    from models.vit import VisionTransformer as TorchViT

    depth, dim, n_head, dim_ff, n_class = 2, 64, 2, 128, 10
    tm = TorchViT(
        head=torch.nn.Linear(dim, n_class),
        image_size=32, window_size=8, depth=depth, dim=dim, n_head=n_head,
        dim_ff=dim_ff, dropout=0, drop_attn=0, drop_ff=0, drop_path=0,
    ).eval()

    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 32, 32, 3)).astype(np.float32)
    _logits_close(
        {"type": "vit", "image_size": 32, "window_size": 8, "n_class": n_class,
         "depth": depth, "dim": dim, "n_head": n_head, "dim_ff": dim_ff},
        tm, x, rtol=2e-4, atol=2e-5)


# ---------------------------------------------------------------------------
# DINO (ViT trunk + DINOHead with weight-normed last layer)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("norm_last_layer", [True, False])
def test_dino_outputs_match_reference(norm_last_layer):
    from models.vit import dino as torch_dino

    kw = dict(image_size=32, window_size=8, depth=2, dim=64, n_head=2,
              dim_ff=128, dropout=0.0, drop_attn=0.0, drop_ff=0.0,
              drop_path=0.0, dim_head_out=128, use_bn=False,
              norm_last_layer=norm_last_layer, depth_head=3, dim_head_ff=96,
              dim_head_bottleneck=32)
    tm = torch_dino(**kw).eval()
    with torch.no_grad():  # frozen/unit gains hide mapping bugs — randomize
        for name, p in tm.named_parameters():
            if "weight_g" in name and not norm_last_layer:
                p.normal_(1.0, 0.2)

    rng = np.random.default_rng(8)
    x = rng.normal(size=(2, 32, 32, 3)).astype(np.float32)
    _logits_close({"type": "dino", **kw}, tm, x)


def test_dino_pos_embed_interpolation_matches_reference():
    """Non-native crop sizes route through bicubic pos-embed interpolation
    (reference models/vit.py:153-175, torch bicubic a=-0.75 / half-pixel /
    no antialias): both the downscale (local crop) and upscale directions."""
    from models.vit import dino as torch_dino

    kw = dict(image_size=32, window_size=8, depth=2, dim=64, n_head=2,
              dim_ff=128, dropout=0.0, drop_attn=0.0, drop_ff=0.0,
              drop_path=0.0, dim_head_out=128, use_bn=False,
              norm_last_layer=False, depth_head=3, dim_head_ff=96,
              dim_head_bottleneck=32)
    tm = torch_dino(**kw).eval()
    rng = np.random.default_rng(5)
    for size in (16, 24, 48):  # 4x4 grid -> 2x2 / 3x3 / 6x6
        x = rng.normal(size=(2, size, size, 3)).astype(np.float32)
        _logits_close({"type": "dino", **kw}, tm, x)


# ---------------------------------------------------------------------------
# Swin
# ---------------------------------------------------------------------------

def test_swin_logits_match_reference():
    from models.swin_transformer import SwinTransformer as TorchSwin

    kw = dict(image_size=(64, 64), n_class=10, depths=(2, 2, 2, 2),
              dims=(16, 32, 64, 128), dim_head=8, n_heads=(2, 4, 8, 16),
              dim_ffs=(32, 64, 128, 256), window_size=2)
    tm = TorchSwin(**kw).eval()
    # zero-init bias tables hide indexing bugs — randomize them
    with torch.no_grad():
        for name, p in tm.named_parameters():
            if "rel_pos" in name:
                p.normal_(0, 0.5)

    rng = np.random.default_rng(1)
    x = rng.normal(size=(2, 64, 64, 3)).astype(np.float32)
    _logits_close(
        {"type": "swin_transformer", "image_size": [64, 64], "n_class": 10,
         "depths": [2, 2, 2, 2], "dims": [16, 32, 64, 128], "dim_head": 8,
         "n_heads": [2, 4, 8, 16], "dim_ffs": [32, 64, 128, 256],
         "window_size": 2},
        tm, x)


# ---------------------------------------------------------------------------
# PVT
# ---------------------------------------------------------------------------

def test_pvt_logits_match_reference():
    from models.pvt import PyramidVisionTransformer as TorchPVT

    tm = TorchPVT(
        image_size=32, n_class=10, in_dim=3, depths=(2, 1, 1, 2),
        patch_embed_dims=(16, 32, 64, 128), n_heads=(1, 2, 4, 8),
        dim_ffs=(32, 64, 128, 256), reductions=(4, 2, 2, 1),
    ).eval()

    rng = np.random.default_rng(2)
    x = rng.normal(size=(2, 32, 32, 3)).astype(np.float32)
    _logits_close(
        {"type": "pvt", "image_size": 32, "n_class": 10,
         "depths": [2, 1, 1, 2], "patch_embed_dims": [16, 32, 64, 128],
         "n_heads": [1, 2, 4, 8], "dim_ffs": [32, 64, 128, 256],
         "reductions": [4, 2, 2, 1], "drop_path": 0.0},
        tm, x)


# ---------------------------------------------------------------------------
# Halo
# ---------------------------------------------------------------------------

def test_halo_logits_match_reference():
    from models.halo_transformer import HaloTransformer as TorchHalo

    tm = TorchHalo(
        image_size=64, n_class=10, depths=(2, 1, 1, 2), dims=(16, 32, 64, 128),
        dim_head=8, n_heads=(2, 4, 8, 16), dim_ffs=(32, 64, 128, 256),
        window_size=2, halo_size=1,
    ).eval()
    with torch.no_grad():
        for name, p in tm.named_parameters():
            if "rel_pos" in name:
                p.normal_(0, 0.5)

    rng = np.random.default_rng(3)
    x = rng.normal(size=(2, 64, 64, 3)).astype(np.float32)
    _logits_close(
        {"type": "halo_transformer", "image_size": 64, "n_class": 10,
         "depths": [2, 1, 1, 2], "dims": [16, 32, 64, 128], "dim_head": 8,
         "n_heads": [2, 4, 8, 16], "dim_ffs": [32, 64, 128, 256],
         "window_size": 2, "halo_size": 1},
        tm, x)


# ---------------------------------------------------------------------------
# NFNet
# ---------------------------------------------------------------------------

def test_nfnet_logits_match_reference():
    from models.nfnet import NFNet as TorchNFNet

    tm = TorchNFNet(
        n_class=10, channels=(16, 32, 64, 64), depths=(1, 2, 1, 1),
        groups=(8, 8, 8, 8), stochastic_depth=0.0, dropout=0.0,
    ).eval()
    # skip_gain init is 0 → blocks would be pure-skip; randomize to make the
    # residual path contribute
    with torch.no_grad():
        for name, p in tm.named_parameters():
            if "skip_gain" in name:
                p.fill_(0.7)

    rng = np.random.default_rng(4)
    x = rng.normal(size=(2, 64, 64, 3)).astype(np.float32)
    _logits_close(
        {"type": "nfnet", "n_class": 10, "channels": [16, 32, 64, 64],
         "depths": [1, 2, 1, 1], "groups": [8, 8, 8, 8],
         "stochastic_depth": 0.0, "dropout": 0.0},
        tm, x, rtol=5e-4, atol=5e-5)


# ---------------------------------------------------------------------------
# Twins-SVT (depth 2 in two stages exercises the PEG-after-first-layer
# interleaving: layer i sits at torch index 1 (i==0) / i+2 (i>=1))
# ---------------------------------------------------------------------------

def test_twins_logits_match_reference():
    from models.twins import TwinsSVT as TorchTwins

    tm = TorchTwins(
        n_class=10, depths=(2, 1, 1, 2), dims=(16, 32, 64, 128), dim_head=8,
        n_heads=(2, 4, 8, 16), dim_ffs=(32, 64, 128, 256), window_size=2,
    ).eval()

    rng = np.random.default_rng(5)
    x = rng.normal(size=(2, 64, 64, 3)).astype(np.float32)
    _logits_close(
        {"type": "twins_svt", "n_class": 10, "depths": [2, 1, 1, 2],
         "dims": [16, 32, 64, 128], "dim_head": 8, "n_heads": [2, 4, 8, 16],
         "dim_ffs": [32, 64, 128, 256], "window_size": 2},
        tm, x, image_size=64)


# ---------------------------------------------------------------------------
# EfficientNetV2 (BatchNorm model: eval mode, running stats mapped)
# ---------------------------------------------------------------------------

def test_efficientnetv2_logits_match_reference():
    from models.efficientnet import efficientnetv2 as torch_effv2

    tm = torch_effv2(0.25, 0.25).eval()
    # give running stats non-trivial values
    with torch.no_grad():
        for name, buf in tm.named_buffers():
            if "running_mean" in name:
                buf.normal_(0, 0.2)
            if "running_var" in name:
                buf.uniform_(0.5, 1.5)

    rng = np.random.default_rng(6)
    x = rng.normal(size=(2, 64, 64, 3)).astype(np.float32)
    _logits_close(
        {"type": "efficientnetv2", "width": 0.25, "depth": 0.25,
         "n_class": 1000},
        tm, x, image_size=64, rtol=2e-3, atol=5e-4)


def test_efficientnet_v1_logits_match_reference():
    """v1 (all non-fused MBConv + SE everywhere) exercises the converter
    branches EfficientNetV2's fused early stages skip."""
    from models.efficientnet import efficientnet as torch_eff

    tm = torch_eff(0.25, 0.25).eval()
    with torch.no_grad():
        for name, buf in tm.named_buffers():
            if "running_mean" in name:
                buf.normal_(0, 0.2)
            if "running_var" in name:
                buf.uniform_(0.5, 1.5)

    rng = np.random.default_rng(12)
    x = rng.normal(size=(2, 64, 64, 3)).astype(np.float32)
    _logits_close(
        {"type": "efficientnet", "width": 0.25, "depth": 0.25,
         "n_class": 1000},
        tm, x, image_size=64, rtol=2e-3, atol=5e-4)


# ---------------------------------------------------------------------------
# NF-EfficientNetV2
# ---------------------------------------------------------------------------

def test_nfefficientnetv2_logits_match_reference():
    from models.nfefficientnet import nfefficientnetv2 as torch_nfv2

    tm = torch_nfv2(0.25, 0.25).eval()
    with torch.no_grad():
        for name, p in tm.named_parameters():
            if "skip_gain" in name:
                p.fill_(0.6)

    rng = np.random.default_rng(7)
    x = rng.normal(size=(2, 64, 64, 3)).astype(np.float32)
    _logits_close(
        {"type": "nfefficientnetv2", "width": 0.25, "depth": 0.25,
         "n_class": 1000},
        tm, x, image_size=64, rtol=5e-4, atol=5e-5)


# ---------------------------------------------------------------------------
# converter error paths
# ---------------------------------------------------------------------------

def test_converter_rejects_depth_mismatch():
    """A state_dict from a deeper model must fail loudly (strict mode), not
    silently drop the extra layers."""
    from models.vit import VisionTransformer as TorchViT

    tm = TorchViT(head=torch.nn.Linear(64, 10), image_size=32, window_size=8,
                  depth=3, dim=64, n_head=2, dim_ff=128, dropout=0,
                  drop_attn=0, drop_ff=0, drop_path=0)
    sd = {k: t2j(v) for k, v in tm.state_dict().items()}
    with pytest.raises(KeyError, match="not mapped"):
        convert_variables(
            {"type": "vit", "image_size": 32, "window_size": 8, "n_class": 10,
             "depth": 2, "dim": 64, "n_head": 2, "dim_ff": 128}, sd)


def test_converter_rejects_shape_mismatch():
    """Same depth but different width: strict mapping succeeds key-wise, and
    the eval_shape validation catches the wrong shapes."""
    from models.vit import VisionTransformer as TorchViT

    tm = TorchViT(head=torch.nn.Linear(64, 10), image_size=32, window_size=8,
                  depth=2, dim=64, n_head=2, dim_ff=128, dropout=0,
                  drop_attn=0, drop_ff=0, drop_path=0)
    sd = {k: t2j(v) for k, v in tm.state_dict().items()}
    with pytest.raises(ValueError, match="does not match"):
        convert_variables(
            {"type": "vit", "image_size": 32, "window_size": 8, "n_class": 10,
             "depth": 2, "dim": 96, "n_head": 2, "dim_ff": 128}, sd)


def test_short_sequence_row_packing_is_exact():
    """MultiHeadedAttention packs short sequences (DINO 37-token locals) into
    block-diagonal (p·n)-token attention; masked scores underflow to exact
    zeros, so packed == unpacked to f32 exactness."""
    from vision_transformers_tpu.models.vit import MultiHeadedAttention

    rng = np.random.default_rng(11)
    for b, n in ((6, 37), (4, 37), (5, 37)):  # pack 3, 2, 1(prime b)
        x = jnp.asarray(rng.normal(size=(b, n, 32)).astype(np.float32))
        m = MultiHeadedAttention(n_head=2)
        params = m.init(jax.random.PRNGKey(0), x)
        packed = m.apply(params, x)

        # unpacked reference: run each row alone (pack impossible at b=1)
        rows = [m.apply(params, x[i:i + 1]) for i in range(b)]
        unpacked = jnp.concatenate(rows, axis=0)
        np.testing.assert_allclose(np.asarray(packed), np.asarray(unpacked),
                                   rtol=2e-5, atol=2e-6)
