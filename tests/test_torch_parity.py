"""Weight-level parity vs the reference torch models.

Loads the *reference's own* model code (read-only, /root/reference), maps its
randomly-initialized state_dict into our flax parameter trees, and asserts
the two frameworks produce the same logits on the same input.  This pins the
math end-to-end: layer order, shapes, attention layout, masks, rel-pos
indices, epsilons, activations.

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
    sd = tm.state_dict()

    from vision_transformers_tpu.config import registry

    model = registry.build("model", {
        "type": "vit", "image_size": 32, "window_size": 8, "n_class": n_class,
        "depth": depth, "dim": dim, "n_head": n_head, "dim_ff": dim_ff,
    }).make()

    params = {
        "patch_embedding": {"linear": conv(sd, "patch_embedding.linear")},
        "cls_token": t2j(sd["cls_token"]),
        "pos_embed": t2j(sd["pos_embed"]),
        "norm": ln(sd, "norm"),
        "head": lin(sd, "head"),
    }
    for i in range(depth):
        params[f"layers_{i}"] = {
            "norm_attn": ln(sd, f"layers.{i}.norm_attn"),
            "attn": {"qkv": lin(sd, f"layers.{i}.attn.qkv"),
                     "linear": lin(sd, f"layers.{i}.attn.linear")},
            "norm_ff": ln(sd, f"layers.{i}.norm_ff"),
            "ff": {"fc1": lin(sd, f"layers.{i}.ff.0"),
                   "fc2": lin(sd, f"layers.{i}.ff.3")},
        }

    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 32, 32, 3)).astype(np.float32)
    ours = model.apply({"params": jax.tree.map(jnp.asarray, params)},
                       jnp.asarray(x))
    with torch.no_grad():
        theirs = tm(torch.tensor(x.transpose(0, 3, 1, 2)))
    np.testing.assert_allclose(np.asarray(ours), theirs.numpy(),
                               rtol=2e-4, atol=2e-5)


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
    sd = tm.state_dict()

    from vision_transformers_tpu.config import registry

    model = registry.build("model", {"type": "swin_transformer", **{
        "image_size": [64, 64], "n_class": 10, "depths": [2, 2, 2, 2],
        "dims": [16, 32, 64, 128], "dim_head": 8, "n_heads": [2, 4, 8, 16],
        "dim_ffs": [32, 64, 128, 256], "window_size": 2}}).make()

    params = {
        "patch_embedding": {"linear": lin(sd, "patch_embedding.linear"),
                            "norm": ln(sd, "patch_embedding.norm")},
        "final_norm": ln(sd, "final_linear.0"),
        "classifier": lin(sd, "classifier.2"),
    }
    for stage in range(4):
        offset = 0
        if stage > 0:
            params[f"merge{stage + 1}"] = {
                "norm": ln(sd, f"block{stage + 1}.0.norm"),
                "linear": lin(sd, f"block{stage + 1}.0.linear"),
            }
            offset = 1
        for i in range(2):
            t = f"block{stage + 1}.{i + offset}"
            params[f"block{stage + 1}_{i}"] = {
                "norm_attn": ln(sd, f"{t}.norm_attn"),
                "attn": {
                    "weight": lin(sd, f"{t}.attn.weight"),
                    "linear": lin(sd, f"{t}.attn.linear"),
                    "rel_pos": t2j(sd[f"{t}.attn.rel_pos.weight"]),
                },
                "norm_ff": ln(sd, f"{t}.norm_ff"),
                "ff": {"fc1": lin(sd, f"{t}.ff.0"), "fc2": lin(sd, f"{t}.ff.3")},
            }

    rng = np.random.default_rng(1)
    x = rng.normal(size=(2, 64, 64, 3)).astype(np.float32)
    ours = model.apply({"params": jax.tree.map(jnp.asarray, params)},
                       jnp.asarray(x))
    with torch.no_grad():
        theirs = tm(torch.tensor(x.transpose(0, 3, 1, 2)))
    np.testing.assert_allclose(np.asarray(ours), theirs.numpy(),
                               rtol=3e-4, atol=3e-5)


# ---------------------------------------------------------------------------
# PVT
# ---------------------------------------------------------------------------

def test_pvt_logits_match_reference():
    from models.pvt import PyramidVisionTransformer as TorchPVT

    tm = TorchPVT(
        image_size=32, n_class=10, in_dim=3, depths=(1, 1, 1, 1),
        patch_embed_dims=(16, 32, 64, 128), n_heads=(1, 2, 4, 8),
        dim_ffs=(32, 64, 128, 256), reductions=(4, 2, 2, 1),
    ).eval()
    sd = tm.state_dict()

    from vision_transformers_tpu.config import registry

    model = registry.build("model", {
        "type": "pvt", "image_size": 32, "n_class": 10, "depths": [1, 1, 1, 1],
        "patch_embed_dims": [16, 32, 64, 128], "n_heads": [1, 2, 4, 8],
        "dim_ffs": [32, 64, 128, 256], "reductions": [4, 2, 2, 1],
        "drop_path": 0.0}).make()

    params = {"norm": ln(sd, "norm"), "classifier": lin(sd, "classifier")}
    for s in range(4):
        pe = {
            "conv": conv(sd, f"patch_embedding.{s}.conv"),
            "norm": ln(sd, f"patch_embedding.{s}.norm"),
            "pos": t2j(sd[f"patch_embedding.{s}.pos"]),
        }
        if s == 3:
            pe["cls_token"] = t2j(sd[f"patch_embedding.{s}.cls_token"])
        params[f"patch_embedding_{s}"] = pe

        t = f"block{s + 1}.0"
        attn = {
            "linear_q": lin(sd, f"{t}.attn.linear_q"),
            "linear_kv": lin(sd, f"{t}.attn.linear_kv"),
            "linear": lin(sd, f"{t}.attn.linear"),
        }
        if f"{t}.attn.reduce_conv.weight" in sd:
            attn["reduce_conv"] = conv(sd, f"{t}.attn.reduce_conv")
            attn["reduce_norm"] = ln(sd, f"{t}.attn.reduce_norm")
        params[f"block{s + 1}_0"] = {
            "norm_attn": ln(sd, f"{t}.norm_attn"),
            "attn": attn,
            "norm_ff": ln(sd, f"{t}.norm_ff"),
            "ff": {"fc1": lin(sd, f"{t}.ff.0"), "fc2": lin(sd, f"{t}.ff.3")},
        }

    rng = np.random.default_rng(2)
    x = rng.normal(size=(2, 32, 32, 3)).astype(np.float32)
    ours = model.apply({"params": jax.tree.map(jnp.asarray, params)},
                       jnp.asarray(x))
    with torch.no_grad():
        theirs = tm(torch.tensor(x.transpose(0, 3, 1, 2)))
    np.testing.assert_allclose(np.asarray(ours), theirs.numpy(),
                               rtol=3e-4, atol=3e-5)


# ---------------------------------------------------------------------------
# Halo
# ---------------------------------------------------------------------------

def test_halo_logits_match_reference():
    from models.halo_transformer import HaloTransformer as TorchHalo

    tm = TorchHalo(
        image_size=64, n_class=10, depths=(1, 1, 1, 1), dims=(16, 32, 64, 128),
        dim_head=8, n_heads=(2, 4, 8, 16), dim_ffs=(32, 64, 128, 256),
        window_size=2, halo_size=1,
    ).eval()
    with torch.no_grad():
        for name, p in tm.named_parameters():
            if "rel_pos" in name:
                p.normal_(0, 0.5)
    sd = tm.state_dict()

    from vision_transformers_tpu.config import registry

    model = registry.build("model", {
        "type": "halo_transformer", "image_size": 64, "n_class": 10,
        "depths": [1, 1, 1, 1], "dims": [16, 32, 64, 128], "dim_head": 8,
        "n_heads": [2, 4, 8, 16], "dim_ffs": [32, 64, 128, 256],
        "window_size": 2, "halo_size": 1}).make()

    params = {
        "final_norm": ln(sd, "final_linear.0"),
        "final_linear": lin(sd, "final_linear.1"),
        "final_norm2": ln(sd, "final_linear.2"),
        "classifier": lin(sd, "classifier.2"),
    }
    for s in range(4):
        params[f"embed{s + 1}"] = {
            "linear": lin(sd, f"block{s + 1}.0.linear"),
            "norm": ln(sd, f"block{s + 1}.0.norm"),
        }
        t = f"block{s + 1}.1"
        params[f"block{s + 1}_0"] = {
            "norm_attn": ln(sd, f"{t}.norm_attn"),
            "attn": {"weight": lin(sd, f"{t}.attn.weight"),
                     "linear": lin(sd, f"{t}.attn.linear"),
                     "rel_pos": t2j(sd[f"{t}.attn.rel_pos.weight"])},
            "norm_ff": ln(sd, f"{t}.norm_ff"),
            "ff": {"fc1": lin(sd, f"{t}.ff.0"), "fc2": lin(sd, f"{t}.ff.3")},
        }

    rng = np.random.default_rng(3)
    x = rng.normal(size=(2, 64, 64, 3)).astype(np.float32)
    ours = model.apply({"params": jax.tree.map(jnp.asarray, params)},
                       jnp.asarray(x))
    with torch.no_grad():
        theirs = tm(torch.tensor(x.transpose(0, 3, 1, 2)))
    np.testing.assert_allclose(np.asarray(ours), theirs.numpy(),
                               rtol=3e-4, atol=3e-5)


# ---------------------------------------------------------------------------
# NFNet
# ---------------------------------------------------------------------------

def wsconv(sd, name):
    return {"kernel": t2j(sd[f"{name}.weight"]).transpose(2, 3, 1, 0),
            "bias": t2j(sd[f"{name}.bias"]),
            "gain": t2j(sd[f"{name}.gain"])}


def test_nfnet_logits_match_reference():
    from models.nfnet import NFNet as TorchNFNet

    tm = TorchNFNet(
        n_class=10, channels=(16, 32, 64, 64), depths=(1, 1, 1, 1),
        groups=(8, 8, 8, 8), stochastic_depth=0.0, dropout=0.0,
    ).eval()
    # skip_gain init is 0 → blocks would be pure-skip; randomize to make the
    # residual path contribute
    with torch.no_grad():
        for name, p in tm.named_parameters():
            if "skip_gain" in name:
                p.fill_(0.7)
    sd = tm.state_dict()

    from vision_transformers_tpu.config import registry

    model = registry.build("model", {
        "type": "nfnet", "n_class": 10, "channels": [16, 32, 64, 64],
        "depths": [1, 1, 1, 1], "groups": [8, 8, 8, 8],
        "stochastic_depth": 0.0, "dropout": 0.0}).make()

    params = {
        "stem1": wsconv(sd, "stem.0"), "stem2": wsconv(sd, "stem.2"),
        "stem3": wsconv(sd, "stem.4"), "stem4": wsconv(sd, "stem.6"),
        "final_conv": wsconv(sd, "final_conv"),
        "linear": lin(sd, "linear.3"),
    }
    for i in range(4):
        t = f"blocks.{i}"
        blk = {
            "conv1": wsconv(sd, f"{t}.conv1"),
            "conv2": wsconv(sd, f"{t}.conv2"),
            "conv3": wsconv(sd, f"{t}.conv3"),
            "conv4": wsconv(sd, f"{t}.conv4"),
            "skip_gain": t2j(sd[f"{t}.skip_gain"]),
            "se": {"reduce": {"kernel": t2j(sd[f"{t}.se.1.weight"]).transpose(2, 3, 1, 0),
                              "bias": t2j(sd[f"{t}.se.1.bias"])},
                   "expand": {"kernel": t2j(sd[f"{t}.se.3.weight"]).transpose(2, 3, 1, 0),
                              "bias": t2j(sd[f"{t}.se.3.bias"])}},
        }
        if f"{t}.skip.1.weight" in sd:
            blk["skip_conv"] = wsconv(sd, f"{t}.skip.1")
        elif f"{t}.skip.0.weight" in sd:
            blk["skip_conv"] = wsconv(sd, f"{t}.skip.0")
        params[f"block_{i}"] = blk

    rng = np.random.default_rng(4)
    x = rng.normal(size=(2, 64, 64, 3)).astype(np.float32)
    ours = model.apply({"params": jax.tree.map(jnp.asarray, params)},
                       jnp.asarray(x))
    with torch.no_grad():
        theirs = tm(torch.tensor(x.transpose(0, 3, 1, 2)))
    np.testing.assert_allclose(np.asarray(ours), theirs.numpy(),
                               rtol=5e-4, atol=5e-5)


# ---------------------------------------------------------------------------
# Twins-SVT
# ---------------------------------------------------------------------------

def test_twins_logits_match_reference():
    from models.twins import TwinsSVT as TorchTwins

    tm = TorchTwins(
        n_class=10, depths=(1, 1, 1, 1), dims=(16, 32, 64, 128), dim_head=8,
        n_heads=(2, 4, 8, 16), dim_ffs=(32, 64, 128, 256), window_size=2,
    ).eval()
    sd = tm.state_dict()

    from vision_transformers_tpu.config import registry

    model = registry.build("model", {
        "type": "twins_svt", "n_class": 10, "depths": [1, 1, 1, 1],
        "dims": [16, 32, 64, 128], "dim_head": 8, "n_heads": [2, 4, 8, 16],
        "dim_ffs": [32, 64, 128, 256], "window_size": 2}).make()

    params = {"final_norm": ln(sd, "final_linear.0"),
              "classifier": lin(sd, "classifier.2")}
    for s in range(4):
        params[f"embed{s + 1}"] = {
            "linear": lin(sd, f"block{s + 1}.0.linear"),
            "norm": ln(sd, f"block{s + 1}.0.norm"),
        }
        t = f"block{s + 1}.1"  # single layer per stage; PEG at .2
        ag = {"linear_q": lin(sd, f"{t}.attn_global.linear_q"),
              "linear_kv": lin(sd, f"{t}.attn_global.linear_kv"),
              "linear": lin(sd, f"{t}.attn_global.linear")}
        if f"{t}.attn_global.reduce_conv.weight" in sd:
            ag["reduce_conv"] = conv(sd, f"{t}.attn_global.reduce_conv")
        params[f"block{s + 1}_0"] = {
            "norm_attn_local": ln(sd, f"{t}.norm_attn_local"),
            "attn_local": {"weight": lin(sd, f"{t}.attn_local.weight"),
                           "linear": lin(sd, f"{t}.attn_local.linear")},
            "norm_ff_local": ln(sd, f"{t}.norm_ff_local"),
            "ff_local": {"fc1": lin(sd, f"{t}.ff_local.0"),
                         "fc2": lin(sd, f"{t}.ff_local.3")},
            "norm_attn_global": ln(sd, f"{t}.norm_attn_global"),
            "attn_global": ag,
            "norm_ff_global": ln(sd, f"{t}.norm_ff_global"),
            "ff_global": {"fc1": lin(sd, f"{t}.ff_global.0"),
                          "fc2": lin(sd, f"{t}.ff_global.3")},
        }
        # depthwise PEG conv: torch [dim, 1, 3, 3] → flax [3, 3, 1, dim]
        params[f"peg{s + 1}"] = {
            "proj": {"kernel": t2j(sd[f"block{s + 1}.2.proj.weight"]).transpose(2, 3, 1, 0)}
        }

    rng = np.random.default_rng(5)
    x = rng.normal(size=(2, 64, 64, 3)).astype(np.float32)
    ours = model.apply({"params": jax.tree.map(jnp.asarray, params)},
                       jnp.asarray(x))
    with torch.no_grad():
        theirs = tm(torch.tensor(x.transpose(0, 3, 1, 2)))
    np.testing.assert_allclose(np.asarray(ours), theirs.numpy(),
                               rtol=3e-4, atol=3e-5)


# ---------------------------------------------------------------------------
# EfficientNetV2 (BatchNorm model: eval mode, running stats mapped)
# ---------------------------------------------------------------------------

def bn(sd, name):
    return ({"scale": t2j(sd[f"{name}.weight"]), "bias": t2j(sd[f"{name}.bias"])},
            {"mean": t2j(sd[f"{name}.running_mean"]),
             "var": t2j(sd[f"{name}.running_var"])})


def effv2_map(sd, blocks):
    """Map a reference-torch EfficientNetV2 state_dict to our flax
    (params, batch_stats) pytrees.  Shared by the logits-parity test and the
    50-step trajectory-parity test."""
    params = {"logit": lin(sd, "logit")}
    stats = {}
    p, s = bn(sd, "stem.1")
    params["stem_conv"] = conv(sd, "stem.0")
    params["stem_bn"], stats["stem_bn"] = p, s
    p, s = bn(sd, "head.1")
    params["head_conv"] = conv(sd, "head.0")
    params["head_bn"], stats["head_bn"] = p, s

    for i, cfg_b in enumerate(blocks):
        t = f"blocks.{i}"
        bp, bs = {}, {}
        if cfg_b.get("fused"):
            bp["conv_fused"] = conv(sd, f"{t}.conv.0")
            bp["bn_main"], bs["bn_main"] = bn(sd, f"{t}.conv.1")
        elif cfg_b.get("expand_ratio", 1) != 1:
            bp["conv_expand"] = conv(sd, f"{t}.conv.0")
            bp["bn_expand"], bs["bn_expand"] = bn(sd, f"{t}.conv.1")
            bp["conv_depthwise"] = conv(sd, f"{t}.conv.3")
            bp["bn_main"], bs["bn_main"] = bn(sd, f"{t}.conv.4")
        else:
            bp["conv_depthwise"] = conv(sd, f"{t}.conv.0")
            bp["bn_main"], bs["bn_main"] = bn(sd, f"{t}.conv.1")
        if f"{t}.se.1.weight" in sd:
            bp["se_reduce"] = {"kernel": t2j(sd[f"{t}.se.1.weight"]).transpose(2, 3, 1, 0),
                               "bias": t2j(sd[f"{t}.se.1.bias"])}
            bp["se_expand"] = {"kernel": t2j(sd[f"{t}.se.3.weight"]).transpose(2, 3, 1, 0),
                               "bias": t2j(sd[f"{t}.se.3.bias"])}
        bp["conv_project"] = conv(sd, f"{t}.project.0")
        bp["bn_project"], bs["bn_project"] = bn(sd, f"{t}.project.1")
        params[f"block_{i}"] = bp
        stats[f"block_{i}"] = bs
    return params, stats


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
    sd = tm.state_dict()

    from vision_transformers_tpu.config import registry

    cfg = registry.build("model", {"type": "efficientnetv2", "width": 0.25,
                                   "depth": 0.25, "n_class": 1000})
    model = cfg.make()
    blocks = model.expand_blocks()
    params, stats = effv2_map(sd, blocks)

    rng = np.random.default_rng(6)
    x = rng.normal(size=(2, 64, 64, 3)).astype(np.float32)
    ours = model.apply({"params": jax.tree.map(jnp.asarray, params),
                        "batch_stats": jax.tree.map(jnp.asarray, stats)},
                       jnp.asarray(x))
    with torch.no_grad():
        theirs = tm(torch.tensor(x.transpose(0, 3, 1, 2)))
    np.testing.assert_allclose(np.asarray(ours), theirs.numpy(),
                               rtol=2e-3, atol=5e-4)


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
    sd = tm.state_dict()

    from vision_transformers_tpu.config import registry

    cfg = registry.build("model", {"type": "nfefficientnetv2", "width": 0.25,
                                   "depth": 0.25, "n_class": 1000})
    model = cfg.make()
    from vision_transformers_tpu.models.nfefficientnet import nf_expand_blocks

    blocks = nf_expand_blocks(model.block_configs, 0.25, 8, None, 0.25, 0.2)

    params = {"logit": lin(sd, "logit"),
              "stem_conv": wsconv(sd, "stem.0"),
              "head_conv": wsconv(sd, "head.0")}
    for i, cfg_b in enumerate(blocks):
        t = f"blocks.{i}"
        bp = {}
        if cfg_b.get("fused"):
            bp["conv_fused"] = wsconv(sd, f"{t}.conv.0")
        elif cfg_b.get("expand_ratio", 1) != 1:
            bp["conv_expand"] = wsconv(sd, f"{t}.conv.0")
            bp["conv_depthwise"] = wsconv(sd, f"{t}.conv.2")
        else:
            bp["conv_depthwise"] = wsconv(sd, f"{t}.conv.0")
        bp["conv_project"] = wsconv(sd, f"{t}.project")
        if f"{t}.skip_gain" in sd:
            bp["skip_gain"] = t2j(sd[f"{t}.skip_gain"])
        params[f"block_{i}"] = bp

    rng = np.random.default_rng(7)
    x = rng.normal(size=(2, 64, 64, 3)).astype(np.float32)
    ours = model.apply({"params": jax.tree.map(jnp.asarray, params)},
                       jnp.asarray(x))
    with torch.no_grad():
        theirs = tm(torch.tensor(x.transpose(0, 3, 1, 2)))
    np.testing.assert_allclose(np.asarray(ours), theirs.numpy(),
                               rtol=5e-4, atol=5e-5)


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
