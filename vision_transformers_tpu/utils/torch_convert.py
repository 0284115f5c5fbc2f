"""Convert reference torch checkpoints into this framework's flax variables.

The reference saves ``epoch-NNN.pt`` files shaped
``{"model": state_dict, "ema": state_dict, "scheduler": ..., "optimizer": ...,
"conf": ...}`` (reference train.py:208-217) and, for DINO,
``{"student": ..., "teacher": ...}`` (reference train_dino.py:173-181).  This
module maps those torch ``state_dict``s — key-for-key, for every registered
model family — onto the flax parameter pytrees this framework's models
expect, so users migrating from the reference can keep their trained
weights.

The mappings are the single source of truth for torch↔flax layout: the
weight-level parity tests (tests/test_torch_parity.py) build their flax
params through these functions and assert logit-identical outputs against
the reference's own torch modules, so every converter path below is pinned
end-to-end.

Layout conventions (torch → flax):
- ``nn.Linear``   weight [out, in]        → Dense kernel [in, out] (transpose)
- ``nn.Conv2d``   weight [out, in, kh, kw]→ Conv kernel [kh, kw, in, out]
- ``nn.LayerNorm``/``nn.BatchNorm`` weight/bias → scale/bias
- BatchNorm running_mean/var → ``batch_stats`` collection
- ``weight_norm`` (DINO head last layer) weight_v [out, in] → last_v [in, out],
  weight_g [out, 1] → last_g [out]

Everything here is numpy-only; torch is imported solely inside
:func:`load_torch_checkpoint` to read ``.pt`` files.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional, Tuple

import numpy as np

__all__ = [
    "convert_state_dict",
    "convert_variables",
    "load_torch_checkpoint",
    "load_pretrained_variables",
    "CONVERTERS",
]


# ---------------------------------------------------------------------------
# tracked state dict + leaf helpers
# ---------------------------------------------------------------------------


class _SD:
    """A state_dict wrapper that records which keys a converter consumed, so
    unmapped weights fail loudly instead of being silently dropped."""

    def __init__(self, d: Dict[str, np.ndarray]):
        self.d = d
        self.used: set = set()

    def __getitem__(self, k: str) -> np.ndarray:
        self.used.add(k)
        return self.d[k]

    def __contains__(self, k: str) -> bool:
        return k in self.d

    def unused(self) -> list:
        return sorted(set(self.d) - self.used)

    def keys(self):
        return self.d.keys()


def _lin(sd, name):
    out = {"kernel": sd[f"{name}.weight"].T}
    if f"{name}.bias" in sd:
        out["bias"] = sd[f"{name}.bias"]
    return out


def _conv(sd, name):
    out = {"kernel": sd[f"{name}.weight"].transpose(2, 3, 1, 0)}
    if f"{name}.bias" in sd:
        out["bias"] = sd[f"{name}.bias"]
    return out


def _ln(sd, name):
    return {"scale": sd[f"{name}.weight"], "bias": sd[f"{name}.bias"]}


def _wsconv(sd, name):
    return {
        "kernel": sd[f"{name}.weight"].transpose(2, 3, 1, 0),
        "bias": sd[f"{name}.bias"],
        "gain": sd[f"{name}.gain"],
    }


def _bn(sd, name):
    """BatchNorm → (params, batch_stats)."""
    return (
        {"scale": sd[f"{name}.weight"], "bias": sd[f"{name}.bias"]},
        {"mean": sd[f"{name}.running_mean"], "var": sd[f"{name}.running_var"]},
    )


def _ff(sd, prefix):
    """PositionwiseFeedForward: torch Sequential(Linear, act, Dropout, Linear)
    (reference models/layer.py) → {fc1, fc2}."""
    return {"fc1": _lin(sd, f"{prefix}.0"), "fc2": _lin(sd, f"{prefix}.3")}


# ---------------------------------------------------------------------------
# per-family converters: (sd, arch_cfg) -> (params, batch_stats | None)
# ---------------------------------------------------------------------------


def _vit_body(sd, depth: int) -> dict:
    """VisionTransformer trunk (reference models/vit.py:79-203) minus head."""
    params = {
        "patch_embedding": {"linear": _conv(sd, "patch_embedding.linear")},
        "cls_token": sd["cls_token"],
        "pos_embed": sd["pos_embed"],
        "norm": _ln(sd, "norm"),
    }
    for i in range(depth):
        params[f"layers_{i}"] = {
            "norm_attn": _ln(sd, f"layers.{i}.norm_attn"),
            "attn": {
                "qkv": _lin(sd, f"layers.{i}.attn.qkv"),
                "linear": _lin(sd, f"layers.{i}.attn.linear"),
            },
            "norm_ff": _ln(sd, f"layers.{i}.norm_ff"),
            "ff": _ff(sd, f"layers.{i}.ff"),
        }
    return params


def _convert_vit(sd, cfg):
    params = _vit_body(sd, cfg.depth)
    if "head.weight" in sd:
        params["head"] = _lin(sd, "head")
    return params, None


def _convert_dino(sd, cfg):
    """DINO = ViT trunk + DINOHead (reference models/vit.py:206-307).

    The head's torch ``mlp`` is a Sequential whose indices depend on depth and
    ``use_bn`` (GELUs interleaved); linears/BNs are discovered by scanning the
    state_dict rather than recomputing the index arithmetic."""
    head: dict = {}
    head_stats: dict = {}
    if "head.mlp.weight" in sd:  # depth_head == 1: bare Linear
        head["mlp_0"] = _lin(sd, "head.mlp")
    else:
        # Sequential indices are sparse (GELUs hold slots); enumerate the
        # indices actually present and classify Linear vs BatchNorm
        idxs = sorted({
            int(k.split(".")[2]) for k in sd.keys()
            if k.startswith("head.mlp.") and k.split(".")[2].isdigit()
        })
        n_lin = n_bn = 0
        for i in idxs:
            if f"head.mlp.{i}.running_mean" in sd:
                p, s = _bn(sd, f"head.mlp.{i}")
                head[f"bn_{n_bn}"] = p
                head_stats[f"bn_{n_bn}"] = s
                n_bn += 1
            else:
                head[f"mlp_{n_lin}"] = _lin(sd, f"head.mlp.{i}")
                n_lin += 1
    # weight_norm last layer: w = g · v/||v||_row; g frozen to 1 when
    # norm_last_layer (reference models/vit.py:244-248)
    head["last_v"] = sd["head.last.weight_v"].T
    if not cfg.norm_last_layer:
        head["last_g"] = sd["head.last.weight_g"].reshape(-1)
    elif "head.last.weight_g" in sd:
        g = sd["head.last.weight_g"]
        if not np.allclose(g, 1.0, atol=1e-6):
            raise ValueError(
                "checkpoint has trained weight-norm gains (head.last.weight_g"
                " != 1) but the conf says norm_last_layer=true, which freezes"
                " the gain — set arch.norm_last_layer=false to keep them"
            )

    params = {"backbone": _vit_body(sd, cfg.depth), "head": head}
    stats = {"head": head_stats} if head_stats else None
    return params, stats


def _convert_swin(sd, cfg):
    """(reference models/swin_transformer.py:236-368).  Stage s's torch block
    is Sequential([PatchMerge if reduction>1] + depth×TransformerLayer); the
    merge's presence is detected from the keys, not recomputed."""
    params = {
        "patch_embedding": {
            "linear": _lin(sd, "patch_embedding.linear"),
            "norm": _ln(sd, "patch_embedding.norm"),
        },
        "final_norm": _ln(sd, "final_linear.0"),
        "classifier": _lin(sd, "classifier.2"),
    }
    for s, depth in enumerate(cfg.depths):
        offset = 0
        if f"block{s + 1}.0.norm_attn.weight" not in sd:  # PatchMerge first
            params[f"merge{s + 1}"] = {
                "norm": _ln(sd, f"block{s + 1}.0.norm"),
                "linear": _lin(sd, f"block{s + 1}.0.linear"),
            }
            offset = 1
        for i in range(depth):
            t = f"block{s + 1}.{i + offset}"
            params[f"block{s + 1}_{i}"] = {
                "norm_attn": _ln(sd, f"{t}.norm_attn"),
                "attn": {
                    "weight": _lin(sd, f"{t}.attn.weight"),
                    "linear": _lin(sd, f"{t}.attn.linear"),
                    "rel_pos": sd[f"{t}.attn.rel_pos.weight"],
                },
                "norm_ff": _ln(sd, f"{t}.norm_ff"),
                "ff": _ff(sd, f"{t}.ff"),
            }
    return params, None


def _convert_pvt(sd, cfg):
    """(reference models/pvt.py:148-258)."""
    params = {"norm": _ln(sd, "norm"), "classifier": _lin(sd, "classifier")}
    for s, depth in enumerate(cfg.depths):
        pe = {
            "conv": _conv(sd, f"patch_embedding.{s}.conv"),
            "norm": _ln(sd, f"patch_embedding.{s}.norm"),
            "pos": sd[f"patch_embedding.{s}.pos"],
        }
        if f"patch_embedding.{s}.cls_token" in sd:  # last stage only
            pe["cls_token"] = sd[f"patch_embedding.{s}.cls_token"]
        params[f"patch_embedding_{s}"] = pe
        for i in range(depth):
            t = f"block{s + 1}.{i}"
            attn = {
                "linear_q": _lin(sd, f"{t}.attn.linear_q"),
                "linear_kv": _lin(sd, f"{t}.attn.linear_kv"),
                "linear": _lin(sd, f"{t}.attn.linear"),
            }
            if f"{t}.attn.reduce_conv.weight" in sd:  # reduction > 1
                attn["reduce_conv"] = _conv(sd, f"{t}.attn.reduce_conv")
                attn["reduce_norm"] = _ln(sd, f"{t}.attn.reduce_norm")
            params[f"block{s + 1}_{i}"] = {
                "norm_attn": _ln(sd, f"{t}.norm_attn"),
                "attn": attn,
                "norm_ff": _ln(sd, f"{t}.norm_ff"),
                "ff": _ff(sd, f"{t}.ff"),
            }
    return params, None


def _convert_halo(sd, cfg):
    """(reference models/halo_transformer.py:180-270).  Stage s's torch block
    is Sequential(PatchEmbedding, depth×TransformerLayer)."""
    params = {
        "final_norm": _ln(sd, "final_linear.0"),
        "final_linear": _lin(sd, "final_linear.1"),
        "final_norm2": _ln(sd, "final_linear.2"),
        "classifier": _lin(sd, "classifier.2"),
    }
    for s, depth in enumerate(cfg.depths):
        params[f"embed{s + 1}"] = {
            "linear": _lin(sd, f"block{s + 1}.0.linear"),
            "norm": _ln(sd, f"block{s + 1}.0.norm"),
        }
        for i in range(depth):
            t = f"block{s + 1}.{i + 1}"
            params[f"block{s + 1}_{i}"] = {
                "norm_attn": _ln(sd, f"{t}.norm_attn"),
                "attn": {
                    "weight": _lin(sd, f"{t}.attn.weight"),
                    "linear": _lin(sd, f"{t}.attn.linear"),
                    "rel_pos": sd[f"{t}.attn.rel_pos.weight"],
                },
                "norm_ff": _ln(sd, f"{t}.norm_ff"),
                "ff": _ff(sd, f"{t}.ff"),
            }
    return params, None


def _convert_twins(sd, cfg):
    """(reference models/twins.py:228-346).  Stage s's torch block is
    Sequential(PatchEmbedding, layer0, PEG, layer1, ..., layer_{d-1}) — the
    PEG sits at index 2, after the FIRST layer, so layer i lives at torch
    index 1 (i == 0) or i + 2 (i >= 1)."""
    params = {
        "final_norm": _ln(sd, "final_linear.0"),
        "classifier": _lin(sd, "classifier.2"),
    }
    for s, depth in enumerate(cfg.depths):
        params[f"embed{s + 1}"] = {
            "linear": _lin(sd, f"block{s + 1}.0.linear"),
            "norm": _ln(sd, f"block{s + 1}.0.norm"),
        }
        for i in range(depth):
            t = f"block{s + 1}.{1 if i == 0 else i + 2}"
            ag = {
                "linear_q": _lin(sd, f"{t}.attn_global.linear_q"),
                "linear_kv": _lin(sd, f"{t}.attn_global.linear_kv"),
                "linear": _lin(sd, f"{t}.attn_global.linear"),
            }
            if f"{t}.attn_global.reduce_conv.weight" in sd:
                ag["reduce_conv"] = _conv(sd, f"{t}.attn_global.reduce_conv")
            params[f"block{s + 1}_{i}"] = {
                "norm_attn_local": _ln(sd, f"{t}.norm_attn_local"),
                "attn_local": {
                    "weight": _lin(sd, f"{t}.attn_local.weight"),
                    "linear": _lin(sd, f"{t}.attn_local.linear"),
                },
                "norm_ff_local": _ln(sd, f"{t}.norm_ff_local"),
                "ff_local": _ff(sd, f"{t}.ff_local"),
                "norm_attn_global": _ln(sd, f"{t}.norm_attn_global"),
                "attn_global": ag,
                "norm_ff_global": _ln(sd, f"{t}.norm_ff_global"),
                "ff_global": _ff(sd, f"{t}.ff_global"),
            }
        # depthwise PEG conv (reference models/twins.py:204-225)
        params[f"peg{s + 1}"] = {
            "proj": {"kernel": sd[f"block{s + 1}.2.proj.weight"].transpose(2, 3, 1, 0)}
        }
    return params, None


def _convert_nfnet(sd, cfg):
    """(reference models/nfnet.py:27-158).  Blocks are one flat Sequential
    across stages; the skip conv is ``skip.1`` when the stage downsamples
    (AvgPool first) and ``skip.0`` otherwise."""
    params = {
        "stem1": _wsconv(sd, "stem.0"),
        "stem2": _wsconv(sd, "stem.2"),
        "stem3": _wsconv(sd, "stem.4"),
        "stem4": _wsconv(sd, "stem.6"),
        "final_conv": _wsconv(sd, "final_conv"),
        "linear": _lin(sd, "linear.3"),
    }
    n_blocks = sum(cfg.depths)
    for i in range(n_blocks):
        t = f"blocks.{i}"
        blk = {
            "conv1": _wsconv(sd, f"{t}.conv1"),
            "conv2": _wsconv(sd, f"{t}.conv2"),
            "conv3": _wsconv(sd, f"{t}.conv3"),
            "conv4": _wsconv(sd, f"{t}.conv4"),
            "skip_gain": sd[f"{t}.skip_gain"],
            "se": {
                "reduce": _conv(sd, f"{t}.se.1"),
                "expand": _conv(sd, f"{t}.se.3"),
            },
        }
        if f"{t}.skip.1.weight" in sd:
            blk["skip_conv"] = _wsconv(sd, f"{t}.skip.1")
        elif f"{t}.skip.0.weight" in sd:
            blk["skip_conv"] = _wsconv(sd, f"{t}.skip.0")
        params[f"block_{i}"] = blk
    return params, None


def _effnet_blocks_map(sd, blocks) -> Tuple[dict, dict]:
    """EfficientNet/V2 state_dict → (params, batch_stats), driven by the
    expanded per-block configs: fused MBConv is one conv; regular MBConv is
    [expand 1×1 +] depthwise; SE optional."""
    params: dict = {"logit": _lin(sd, "logit")}
    stats: dict = {}
    params["stem_conv"] = _conv(sd, "stem.0")
    params["stem_bn"], stats["stem_bn"] = _bn(sd, "stem.1")
    params["head_conv"] = _conv(sd, "head.0")
    params["head_bn"], stats["head_bn"] = _bn(sd, "head.1")
    for i, b in enumerate(blocks):
        t = f"blocks.{i}"
        bp: dict = {}
        bs: dict = {}
        if b.get("fused"):
            bp["conv_fused"] = _conv(sd, f"{t}.conv.0")
            bp["bn_main"], bs["bn_main"] = _bn(sd, f"{t}.conv.1")
        elif b.get("expand_ratio", 1) != 1:
            bp["conv_expand"] = _conv(sd, f"{t}.conv.0")
            bp["bn_expand"], bs["bn_expand"] = _bn(sd, f"{t}.conv.1")
            bp["conv_depthwise"] = _conv(sd, f"{t}.conv.3")
            bp["bn_main"], bs["bn_main"] = _bn(sd, f"{t}.conv.4")
        else:
            bp["conv_depthwise"] = _conv(sd, f"{t}.conv.0")
            bp["bn_main"], bs["bn_main"] = _bn(sd, f"{t}.conv.1")
        if f"{t}.se.1.weight" in sd:
            bp["se_reduce"] = _conv(sd, f"{t}.se.1")
            bp["se_expand"] = _conv(sd, f"{t}.se.3")
        bp["conv_project"] = _conv(sd, f"{t}.project.0")
        bp["bn_project"], bs["bn_project"] = _bn(sd, f"{t}.project.1")
        params[f"block_{i}"] = bp
        stats[f"block_{i}"] = bs
    return params, stats


def _convert_efficientnet(sd, cfg):
    """EfficientNet / EfficientNetV2 (reference models/efficientnet.py)."""
    return _effnet_blocks_map(sd, cfg.make().expand_blocks())


def _convert_nfefficientnet(sd, cfg):
    """NF-EfficientNet/V2 (reference models/nfefficientnet.py:148-244):
    every conv weight-standardized, no BN, SE absent."""
    from ..models.nfefficientnet import nf_expand_blocks

    model = cfg.make()
    blocks = nf_expand_blocks(
        model.block_configs, model.width, model.divisor,
        model.min_depth, model.depth, model.alpha,
    )
    params: dict = {
        "logit": _lin(sd, "logit"),
        "stem_conv": _wsconv(sd, "stem.0"),
        "head_conv": _wsconv(sd, "head.0"),
    }
    for i, b in enumerate(blocks):
        t = f"blocks.{i}"
        bp: dict = {}
        if b.get("fused"):
            bp["conv_fused"] = _wsconv(sd, f"{t}.conv.0")
        elif b.get("expand_ratio", 1) != 1:
            bp["conv_expand"] = _wsconv(sd, f"{t}.conv.0")
            bp["conv_depthwise"] = _wsconv(sd, f"{t}.conv.2")
        else:
            bp["conv_depthwise"] = _wsconv(sd, f"{t}.conv.0")
        bp["conv_project"] = _wsconv(sd, f"{t}.project")
        if f"{t}.skip_gain" in sd:
            bp["skip_gain"] = sd[f"{t}.skip_gain"]
        params[f"block_{i}"] = bp
    return params, None


CONVERTERS = {
    "vit": _convert_vit,
    "dino": _convert_dino,
    "swin_transformer": _convert_swin,
    "pvt": _convert_pvt,
    "halo_transformer": _convert_halo,
    "twins_svt": _convert_twins,
    "nfnet": _convert_nfnet,
    "efficientnet": _convert_efficientnet,
    "efficientnetv2": _convert_efficientnet,
    "nfefficientnet": _convert_nfefficientnet,
    "nfefficientnetv2": _convert_nfefficientnet,
}

# torch state_dict entries that have no flax counterpart by design:
# BN step counters, and the reference's precomputed rel-pos index / mask
# buffers (swin_transformer.py:55-76, halo_transformer.py:40-52 — here these
# are static numpy constants baked at trace time, not weights)
_IGNORABLE_SUFFIXES = ("num_batches_tracked", ".attn.pos", ".attn.local_mask")


def _is_ignorable(key: str) -> bool:
    return key.endswith(_IGNORABLE_SUFFIXES)


# ---------------------------------------------------------------------------
# public API
# ---------------------------------------------------------------------------


def convert_state_dict(arch_cfg: Any, state_dict: Dict[str, Any],
                       strict: bool = True) -> Dict[str, Any]:
    """Map a reference torch ``state_dict`` to flax ``variables``
    (``{"params": ..., ["batch_stats": ...]}``) for ``arch_cfg`` (a registered
    model TypedConfig or raw conf dict).

    With ``strict`` (default), raises if any non-buffer torch key was not
    consumed — a converter/config mismatch should never pass silently.
    """
    from ..config import registry

    arch_cfg = registry.build("model", arch_cfg)
    try:
        fn = CONVERTERS[arch_cfg.type]
    except KeyError:
        raise KeyError(
            f"no torch converter for model type {arch_cfg.type!r}; "
            f"available: {sorted(CONVERTERS)}"
        ) from None

    sd = _SD({k: np.asarray(v) for k, v in state_dict.items()})
    params, stats = fn(sd, arch_cfg)
    if strict:
        leftover = [k for k in sd.unused() if not _is_ignorable(k)]
        if leftover:
            raise KeyError(
                f"{arch_cfg.type}: {len(leftover)} torch keys were not mapped "
                f"(config/depth mismatch?): {leftover[:10]}"
            )
    variables: Dict[str, Any] = {"params": params}
    if stats:
        variables["batch_stats"] = stats
    return variables


def convert_variables(arch_cfg: Any, state_dict: Dict[str, Any],
                      image_size: Optional[int] = None,
                      strict: bool = True, validate: bool = True) -> Dict[str, Any]:
    """:func:`convert_state_dict` + structural validation: the converted tree
    must match the model's own ``init`` tree (same treedef, same leaf shapes),
    computed shape-only via ``jax.eval_shape`` (no FLOPs, no device)."""
    import jax
    import jax.numpy as jnp

    from ..config import registry

    arch_cfg = registry.build("model", arch_cfg)
    variables = convert_state_dict(arch_cfg, state_dict, strict=strict)
    variables = jax.tree.map(jnp.asarray, variables)
    if getattr(arch_cfg, "scan_layers", False):
        # torch checkpoints are per-layer; the scan_layers model wants the
        # stacked layers/layer tree (models/vit.py::stack_scan_layers)
        from ..models.vit import stack_scan_layers

        variables = stack_scan_layers(variables, arch_cfg.depth)
    if not validate:
        return variables

    model = arch_cfg.make()
    size = image_size or getattr(arch_cfg, "image_size", None) or 64
    if isinstance(size, (list, tuple)):
        h, w = size
    else:
        h = w = int(size)
    dummy = jnp.zeros((1, h, w, 3), jnp.float32)
    expected = jax.eval_shape(model.init, jax.random.PRNGKey(0), dummy)

    exp_paths = {
        jax.tree_util.keystr(p): v.shape
        for p, v in jax.tree_util.tree_flatten_with_path(expected)[0]
    }
    got_paths = {
        jax.tree_util.keystr(p): v.shape
        for p, v in jax.tree_util.tree_flatten_with_path(variables)[0]
    }
    problems = []
    for k in sorted(set(exp_paths) | set(got_paths)):
        if k not in got_paths:
            problems.append(f"missing {k} {exp_paths[k]}")
        elif k not in exp_paths:
            problems.append(f"unexpected {k} {got_paths[k]}")
        elif exp_paths[k] != got_paths[k]:
            problems.append(f"shape {k}: got {got_paths[k]}, model wants {exp_paths[k]}")
    if problems:
        raise ValueError(
            f"converted tree does not match {arch_cfg.type} model structure "
            f"({len(problems)} problems):\n  " + "\n  ".join(problems[:20])
        )
    return variables


def load_pretrained_variables(path: str, arch_cfg: Any,
                              key: Optional[str] = None) -> Dict[str, Any]:
    """Load pretrained flax ``variables`` for ``arch_cfg`` from either
    - a converted orbax variables dir (written by ``convert.py``), or
    - a reference torch ``.pt`` checkpoint (converted on the fly).

    ``path`` may carry a ``:key`` suffix (e.g. ``epoch-050.pt:ema``) selecting
    the sub-state_dict of a ``.pt`` file; ``key`` overrides it.
    """
    if key is None and ":" in path and not os.path.exists(path):
        path, key = path.rsplit(":", 1)
    if os.path.isfile(path):  # torch .pt
        sd = load_torch_checkpoint(path, key=key)
        return convert_variables(arch_cfg, sd)
    if key is not None:
        raise ValueError(
            f"':{key}' selects a state_dict inside a torch .pt; {path} is a "
            f"converted checkpoint dir, which stores exactly one variable set"
        )
    from ..train.checkpoint import restore_checkpoint

    variables = restore_checkpoint(path)
    if "params" not in variables:
        raise ValueError(
            f"{path} is not a converted variables checkpoint "
            f"(top-level keys: {sorted(variables)}); run convert.py first or "
            f"use conf resume= for training checkpoints"
        )
    return variables


def load_eval_variables(path: str, arch_cfg: Any,
                        use_ema: bool = True) -> Dict[str, Any]:
    """Inference-ready ``variables`` from ANY checkpoint this framework
    understands: a converted variables dir, a reference torch ``.pt``
    (optionally with a ``:key`` suffix), or a training checkpoint written by
    train.py (EMA weights by default when present).

    Used by evaluate.py and predict.py.
    """
    base = path.rsplit(":", 1)[0] if ":" in path else path
    if os.path.isfile(base):  # torch .pt
        return load_pretrained_variables(path, arch_cfg)
    from ..train.checkpoint import restore_checkpoint

    restored = restore_checkpoint(path)
    if "params" in restored:  # converted variables checkpoint
        return restored
    if "state" in restored:  # training checkpoint {"state": ..., "epoch": ...}
        state = restored["state"]
        if "params" not in state:
            raise ValueError(
                f"{path} is a DINO training checkpoint (student/teacher); the "
                f"DINO head has no classifier to evaluate — export the "
                f"backbone or evaluate a classification run instead"
            )
        params = state.get("ema_params") if use_ema else None
        stats = state.get("ema_batch_stats") if use_ema else None
        variables = {"params": params if params is not None else state["params"]}
        stats = stats if stats is not None else state.get("batch_stats")
        if stats:
            variables["batch_stats"] = stats
        return variables
    raise ValueError(f"unrecognized checkpoint layout at {path}: {sorted(restored)}")


def load_torch_checkpoint(path: str, key: Optional[str] = None) -> Dict[str, np.ndarray]:
    """Read a reference ``.pt`` checkpoint and return one numpy state_dict.

    ``key`` selects the sub-dict (``model``/``ema`` for classification,
    ``student``/``teacher`` for DINO — reference train.py:208-217,
    train_dino.py:173-181).  A bare state_dict file needs no key.  DDP's
    ``module.`` prefix is stripped.
    """
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if key is not None:
        if key not in obj:
            raise KeyError(f"{path} has no {key!r}; top-level keys: {sorted(obj)}")
        obj = obj[key]
    elif isinstance(obj, dict) and any(
        isinstance(v, dict) for v in obj.values()
    ) and not any(hasattr(v, "numpy") for v in obj.values()):
        for candidate in ("model", "ema", "student", "teacher", "state_dict"):
            if candidate in obj:
                obj = obj[candidate]
                break
        else:
            raise KeyError(
                f"{path} is a checkpoint wrapper, not a bare state_dict; "
                f"pass key= to select one of: {sorted(obj)}"
            )
    return _numpy_state_dict(obj, path)


def load_torch_dino_checkpoint(path: str) -> Tuple[Dict[str, np.ndarray],
                                                   Dict[str, np.ndarray]]:
    """Both nets of a reference DINO checkpoint (reference
    train_dino.py:173-181) with ONE file read: (student_sd, teacher_sd)."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    for k in ("student", "teacher"):
        if k not in obj:
            raise KeyError(
                f"{path} is not a DINO checkpoint (no {k!r}); "
                f"top-level keys: {sorted(obj)}"
            )
    return (_numpy_state_dict(obj["student"], path),
            _numpy_state_dict(obj["teacher"], path))


def _numpy_state_dict(obj: Any, path: str) -> Dict[str, np.ndarray]:
    out = {}
    for k, v in obj.items():
        if not hasattr(v, "detach") and not isinstance(v, np.ndarray):
            raise ValueError(
                f"{path}: entry {k!r} is {type(v).__name__}, not a tensor — "
                f"this is a checkpoint wrapper; pass key= to select a "
                f"state_dict"
            )
        if k.startswith("module."):
            k = k[len("module."):]
        out[k] = v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)
    return out
