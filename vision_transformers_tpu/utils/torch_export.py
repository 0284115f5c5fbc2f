"""Export this framework's flax variables to reference-compatible torch
state_dicts — the inverse of :mod:`torch_convert`.

Weights trained here load straight into the reference's torch models
(reference models/*.py) with ``model.load_state_dict(sd, strict=False)`` —
``strict=False`` only because the reference registers derived buffers
(rel-pos index tables, window masks, BN step counters) that its constructors
already recompute; every *learnable* tensor is exported.

Round-trip guarantee (tests/test_export.py): for every family,
``export(convert(sd)) == sd`` bit-for-bit on all non-buffer keys, and the
reference torch model produces identical logits after reloading an exported
state_dict.
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np

__all__ = ["export_state_dict", "EXPORTERS"]


# ---------------------------------------------------------------------------
# inverse leaf helpers (see torch_convert layout conventions)
# ---------------------------------------------------------------------------


def _np(x) -> np.ndarray:
    return np.asarray(x)


def _lin(dst, name, p):
    dst[f"{name}.weight"] = _np(p["kernel"]).T
    if "bias" in p:
        dst[f"{name}.bias"] = _np(p["bias"])


def _conv(dst, name, p):
    dst[f"{name}.weight"] = _np(p["kernel"]).transpose(3, 2, 0, 1)
    if "bias" in p:
        dst[f"{name}.bias"] = _np(p["bias"])


def _ln(dst, name, p):
    dst[f"{name}.weight"] = _np(p["scale"])
    dst[f"{name}.bias"] = _np(p["bias"])


def _wsconv(dst, name, p):
    dst[f"{name}.weight"] = _np(p["kernel"]).transpose(3, 2, 0, 1)
    dst[f"{name}.bias"] = _np(p["bias"])
    dst[f"{name}.gain"] = _np(p["gain"])


def _bn(dst, name, p, s):
    dst[f"{name}.weight"] = _np(p["scale"])
    dst[f"{name}.bias"] = _np(p["bias"])
    dst[f"{name}.running_mean"] = _np(s["mean"])
    dst[f"{name}.running_var"] = _np(s["var"])
    dst[f"{name}.num_batches_tracked"] = np.asarray(0, np.int64)


def _ff(dst, prefix, p):
    _lin(dst, f"{prefix}.0", p["fc1"])
    _lin(dst, f"{prefix}.3", p["fc2"])


# ---------------------------------------------------------------------------
# per-family exporters: (params, batch_stats, arch_cfg) -> state_dict
# ---------------------------------------------------------------------------


def _vit_body(dst, params, prefix=""):
    _conv(dst, f"{prefix}patch_embedding.linear", params["patch_embedding"]["linear"])
    dst[f"{prefix}cls_token"] = _np(params["cls_token"])
    dst[f"{prefix}pos_embed"] = _np(params["pos_embed"])
    _ln(dst, f"{prefix}norm", params["norm"])
    i = 0
    while f"layers_{i}" in params:
        lp = params[f"layers_{i}"]
        _ln(dst, f"{prefix}layers.{i}.norm_attn", lp["norm_attn"])
        _lin(dst, f"{prefix}layers.{i}.attn.qkv", lp["attn"]["qkv"])
        _lin(dst, f"{prefix}layers.{i}.attn.linear", lp["attn"]["linear"])
        _ln(dst, f"{prefix}layers.{i}.norm_ff", lp["norm_ff"])
        _ff(dst, f"{prefix}layers.{i}.ff", lp["ff"])
        i += 1


def _export_vit(params, stats, cfg):
    dst: Dict[str, np.ndarray] = {}
    _vit_body(dst, params)
    if "head" in params:
        _lin(dst, "head", params["head"])
    return dst


def _export_dino(params, stats, cfg):
    dst: Dict[str, np.ndarray] = {}
    _vit_body(dst, params["backbone"])
    head = params["head"]
    head_stats = (stats or {}).get("head", {})
    depth = cfg.depth_head
    if depth == 1:
        _lin(dst, "head.mlp", head["mlp_0"])
    else:
        # Sequential layout (reference models/vit.py:223-240): [Linear, BN?,
        # GELU] × (depth-1) + final Linear → linear i sits at stride 2 (no
        # bn) or 3 (bn); the final linear follows the last GELU directly
        stride = 3 if cfg.use_bn else 2
        for i in range(depth - 1):
            _lin(dst, f"head.mlp.{stride * i}", head[f"mlp_{i}"])
            if cfg.use_bn:
                _bn(dst, f"head.mlp.{stride * i + 1}",
                    head[f"bn_{i}"], head_stats[f"bn_{i}"])
        _lin(dst, f"head.mlp.{stride * (depth - 1)}", head[f"mlp_{depth - 1}"])
    v = _np(head["last_v"]).T  # [out, bottleneck]
    dst["head.last.weight_v"] = v
    if "last_g" in head:
        dst["head.last.weight_g"] = _np(head["last_g"]).reshape(-1, 1)
    else:  # norm_last_layer: gain frozen at 1 (reference models/vit.py:244-248)
        dst["head.last.weight_g"] = np.ones((v.shape[0], 1), v.dtype)
    return dst


def _export_swin(params, stats, cfg):
    dst: Dict[str, np.ndarray] = {}
    _lin(dst, "patch_embedding.linear", params["patch_embedding"]["linear"])
    _ln(dst, "patch_embedding.norm", params["patch_embedding"]["norm"])
    _ln(dst, "final_linear.0", params["final_norm"])
    _lin(dst, "classifier.2", params["classifier"])
    for s, depth in enumerate(cfg.depths):
        offset = 0
        if f"merge{s + 1}" in params:
            _ln(dst, f"block{s + 1}.0.norm", params[f"merge{s + 1}"]["norm"])
            _lin(dst, f"block{s + 1}.0.linear", params[f"merge{s + 1}"]["linear"])
            offset = 1
        for i in range(depth):
            bp = params[f"block{s + 1}_{i}"]
            t = f"block{s + 1}.{i + offset}"
            _ln(dst, f"{t}.norm_attn", bp["norm_attn"])
            _lin(dst, f"{t}.attn.weight", bp["attn"]["weight"])
            _lin(dst, f"{t}.attn.linear", bp["attn"]["linear"])
            dst[f"{t}.attn.rel_pos.weight"] = _np(bp["attn"]["rel_pos"])
            _ln(dst, f"{t}.norm_ff", bp["norm_ff"])
            _ff(dst, f"{t}.ff", bp["ff"])
    return dst


def _export_pvt(params, stats, cfg):
    dst: Dict[str, np.ndarray] = {}
    _ln(dst, "norm", params["norm"])
    _lin(dst, "classifier", params["classifier"])
    for s, depth in enumerate(cfg.depths):
        pe = params[f"patch_embedding_{s}"]
        _conv(dst, f"patch_embedding.{s}.conv", pe["conv"])
        _ln(dst, f"patch_embedding.{s}.norm", pe["norm"])
        dst[f"patch_embedding.{s}.pos"] = _np(pe["pos"])
        if "cls_token" in pe:
            dst[f"patch_embedding.{s}.cls_token"] = _np(pe["cls_token"])
        for i in range(depth):
            bp = params[f"block{s + 1}_{i}"]
            t = f"block{s + 1}.{i}"
            _ln(dst, f"{t}.norm_attn", bp["norm_attn"])
            _lin(dst, f"{t}.attn.linear_q", bp["attn"]["linear_q"])
            _lin(dst, f"{t}.attn.linear_kv", bp["attn"]["linear_kv"])
            _lin(dst, f"{t}.attn.linear", bp["attn"]["linear"])
            if "reduce_conv" in bp["attn"]:
                _conv(dst, f"{t}.attn.reduce_conv", bp["attn"]["reduce_conv"])
                _ln(dst, f"{t}.attn.reduce_norm", bp["attn"]["reduce_norm"])
            _ln(dst, f"{t}.norm_ff", bp["norm_ff"])
            _ff(dst, f"{t}.ff", bp["ff"])
    return dst


def _export_halo(params, stats, cfg):
    dst: Dict[str, np.ndarray] = {}
    _ln(dst, "final_linear.0", params["final_norm"])
    _lin(dst, "final_linear.1", params["final_linear"])
    _ln(dst, "final_linear.2", params["final_norm2"])
    _lin(dst, "classifier.2", params["classifier"])
    for s, depth in enumerate(cfg.depths):
        _lin(dst, f"block{s + 1}.0.linear", params[f"embed{s + 1}"]["linear"])
        _ln(dst, f"block{s + 1}.0.norm", params[f"embed{s + 1}"]["norm"])
        for i in range(depth):
            bp = params[f"block{s + 1}_{i}"]
            t = f"block{s + 1}.{i + 1}"
            _ln(dst, f"{t}.norm_attn", bp["norm_attn"])
            _lin(dst, f"{t}.attn.weight", bp["attn"]["weight"])
            _lin(dst, f"{t}.attn.linear", bp["attn"]["linear"])
            dst[f"{t}.attn.rel_pos.weight"] = _np(bp["attn"]["rel_pos"])
            _ln(dst, f"{t}.norm_ff", bp["norm_ff"])
            _ff(dst, f"{t}.ff", bp["ff"])
    return dst


def _export_twins(params, stats, cfg):
    dst: Dict[str, np.ndarray] = {}
    _ln(dst, "final_linear.0", params["final_norm"])
    _lin(dst, "classifier.2", params["classifier"])
    for s, depth in enumerate(cfg.depths):
        _lin(dst, f"block{s + 1}.0.linear", params[f"embed{s + 1}"]["linear"])
        _ln(dst, f"block{s + 1}.0.norm", params[f"embed{s + 1}"]["norm"])
        for i in range(depth):
            bp = params[f"block{s + 1}_{i}"]
            t = f"block{s + 1}.{1 if i == 0 else i + 2}"  # PEG at .2
            _ln(dst, f"{t}.norm_attn_local", bp["norm_attn_local"])
            _lin(dst, f"{t}.attn_local.weight", bp["attn_local"]["weight"])
            _lin(dst, f"{t}.attn_local.linear", bp["attn_local"]["linear"])
            _ln(dst, f"{t}.norm_ff_local", bp["norm_ff_local"])
            _ff(dst, f"{t}.ff_local", bp["ff_local"])
            _ln(dst, f"{t}.norm_attn_global", bp["norm_attn_global"])
            _lin(dst, f"{t}.attn_global.linear_q", bp["attn_global"]["linear_q"])
            _lin(dst, f"{t}.attn_global.linear_kv", bp["attn_global"]["linear_kv"])
            _lin(dst, f"{t}.attn_global.linear", bp["attn_global"]["linear"])
            if "reduce_conv" in bp["attn_global"]:
                _conv(dst, f"{t}.attn_global.reduce_conv",
                      bp["attn_global"]["reduce_conv"])
            _ln(dst, f"{t}.norm_ff_global", bp["norm_ff_global"])
            _ff(dst, f"{t}.ff_global", bp["ff_global"])
        dst[f"block{s + 1}.2.proj.weight"] = \
            _np(params[f"peg{s + 1}"]["proj"]["kernel"]).transpose(3, 2, 0, 1)
    return dst


def _export_nfnet(params, stats, cfg):
    dst: Dict[str, np.ndarray] = {}
    for j, torch_i in enumerate((0, 2, 4, 6)):
        _wsconv(dst, f"stem.{torch_i}", params[f"stem{j + 1}"])
    _wsconv(dst, "final_conv", params["final_conv"])
    _lin(dst, "linear.3", params["linear"])
    # both frameworks fix stage strides at (1, 2, 2, 2); a stride-2 block's
    # torch skip pools first (skip.0=AvgPool, skip.1=WSConv), a stride-1
    # channel-change skip is bare (skip.0)
    strides = (1, 2, 2, 2)
    i = 0
    for s, depth in enumerate(cfg.depths):
        for j in range(depth):
            bp = params[f"block_{i}"]
            t = f"blocks.{i}"
            for c in ("conv1", "conv2", "conv3", "conv4"):
                _wsconv(dst, f"{t}.{c}", bp[c])
            dst[f"{t}.skip_gain"] = _np(bp["skip_gain"])
            _conv(dst, f"{t}.se.1", bp["se"]["reduce"])
            _conv(dst, f"{t}.se.3", bp["se"]["expand"])
            if "skip_conv" in bp:
                pooled = (strides[s] if j == 0 else 1) > 1
                _wsconv(dst, f"{t}.skip.{1 if pooled else 0}", bp["skip_conv"])
            i += 1
    return dst


def _export_efficientnet(params, stats, cfg):
    dst: Dict[str, np.ndarray] = {}
    blocks = cfg.make().expand_blocks()
    _conv(dst, "stem.0", params["stem_conv"])
    _bn(dst, "stem.1", params["stem_bn"], stats["stem_bn"])
    _conv(dst, "head.0", params["head_conv"])
    _bn(dst, "head.1", params["head_bn"], stats["head_bn"])
    _lin(dst, "logit", params["logit"])
    for i, b in enumerate(blocks):
        bp, bs = params[f"block_{i}"], stats[f"block_{i}"]
        t = f"blocks.{i}"
        if b.get("fused"):
            _conv(dst, f"{t}.conv.0", bp["conv_fused"])
            _bn(dst, f"{t}.conv.1", bp["bn_main"], bs["bn_main"])
        elif b.get("expand_ratio", 1) != 1:
            _conv(dst, f"{t}.conv.0", bp["conv_expand"])
            _bn(dst, f"{t}.conv.1", bp["bn_expand"], bs["bn_expand"])
            _conv(dst, f"{t}.conv.3", bp["conv_depthwise"])
            _bn(dst, f"{t}.conv.4", bp["bn_main"], bs["bn_main"])
        else:
            _conv(dst, f"{t}.conv.0", bp["conv_depthwise"])
            _bn(dst, f"{t}.conv.1", bp["bn_main"], bs["bn_main"])
        if "se_reduce" in bp:
            _conv(dst, f"{t}.se.1", bp["se_reduce"])
            _conv(dst, f"{t}.se.3", bp["se_expand"])
        _conv(dst, f"{t}.project.0", bp["conv_project"])
        _bn(dst, f"{t}.project.1", bp["bn_project"], bs["bn_project"])
    return dst


def _export_nfefficientnet(params, stats, cfg):
    from ..models.nfefficientnet import nf_expand_blocks

    model = cfg.make()
    blocks = nf_expand_blocks(model.block_configs, model.width, model.divisor,
                              model.min_depth, model.depth, model.alpha)
    dst: Dict[str, np.ndarray] = {}
    _wsconv(dst, "stem.0", params["stem_conv"])
    _wsconv(dst, "head.0", params["head_conv"])
    _lin(dst, "logit", params["logit"])
    for i, b in enumerate(blocks):
        bp = params[f"block_{i}"]
        t = f"blocks.{i}"
        if b.get("fused"):
            _wsconv(dst, f"{t}.conv.0", bp["conv_fused"])
        elif b.get("expand_ratio", 1) != 1:
            _wsconv(dst, f"{t}.conv.0", bp["conv_expand"])
            _wsconv(dst, f"{t}.conv.2", bp["conv_depthwise"])
        else:
            _wsconv(dst, f"{t}.conv.0", bp["conv_depthwise"])
        _wsconv(dst, f"{t}.project", bp["conv_project"])
        if "skip_gain" in bp:
            dst[f"{t}.skip_gain"] = _np(bp["skip_gain"])
    return dst


EXPORTERS = {
    "vit": _export_vit,
    "dino": _export_dino,
    "swin_transformer": _export_swin,
    "pvt": _export_pvt,
    "halo_transformer": _export_halo,
    "twins_svt": _export_twins,
    "nfnet": _export_nfnet,
    "efficientnet": _export_efficientnet,
    "efficientnetv2": _export_efficientnet,
    "nfefficientnet": _export_nfefficientnet,
    "nfefficientnetv2": _export_nfefficientnet,
}


def export_state_dict(arch_cfg: Any, variables: Dict[str, Any]) -> Dict[str, np.ndarray]:
    """flax ``variables`` (``{"params": ..., ["batch_stats": ...]}``) →
    reference torch state_dict (numpy values; wrap with ``torch.tensor`` or
    pass through ``export.py`` for a ``.pt``).  Load into the reference model
    with ``strict=False`` (derived buffers are constructor-recomputed there).
    """
    from ..config import registry

    arch_cfg = registry.build("model", arch_cfg)
    try:
        fn = EXPORTERS[arch_cfg.type]
    except KeyError:
        raise KeyError(
            f"no torch exporter for model type {arch_cfg.type!r}; "
            f"available: {sorted(EXPORTERS)}"
        ) from None
    params = variables["params"]
    stats = variables.get("batch_stats")
    return fn(params, stats, arch_cfg)
