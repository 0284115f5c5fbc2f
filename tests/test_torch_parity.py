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
        "patch_embedding": {"proj": conv(sd, "patch_embedding.linear")},
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
