"""Converter coverage at PRODUCTION scale: the shipped .conf recipes.

The per-family parity tests use tiny shapes; these tests pin the converter on
the real configs — notably Swin-S's 18-layer stage-3 (depths [2,2,18,2]),
ViT-S/16's 12 layers at 224px, EfficientNetV2-S's full 40-block table, and
the DINO deit-s head (65536 prototypes, norm_last_layer=false → trainable
weight-norm gain).  Strict conversion (every torch key consumed) + eval_shape
structural validation; plus one full logit-parity check through the deep
Swin-S stage.
"""

import os
import sys

import numpy as np
import pytest
import torch

from test_torch_parity import _install_stub, REF, t2j  # noqa: F401

_install_stub()
if REF not in sys.path:
    sys.path.insert(0, REF)

ROOT = os.path.join(os.path.dirname(__file__), "..")


def _conf(name):
    from vision_transformers_tpu.config.schema import load_config

    return load_config(os.path.join(ROOT, "configs", name))


def _torch_model(arch):
    """Build the reference torch model matching a shipped conf's arch block."""
    t = arch.type
    if t == "vit":
        from models.vit import VisionTransformer

        return VisionTransformer(
            head=torch.nn.Linear(arch.dim, arch.n_class),
            image_size=arch.image_size, window_size=arch.window_size,
            depth=arch.depth, dim=arch.dim, n_head=arch.n_head,
            dim_ff=arch.dim_ff, dropout=arch.dropout, drop_attn=arch.drop_attn,
            drop_ff=arch.drop_ff, drop_path=arch.drop_path)
    if t == "dino":
        from models.vit import dino

        kw = arch.dict()
        kw.pop("type")
        # framework-only extensions, unknown to torch
        kw.pop("remat", None)
        kw.pop("scan_layers", None)
        return dino(**kw)
    if t == "swin_transformer":
        from models.swin_transformer import SwinTransformer

        return SwinTransformer(
            image_size=tuple(arch.image_size), n_class=arch.n_class,
            depths=tuple(arch.depths), dims=tuple(arch.dims),
            dim_head=arch.dim_head, n_heads=tuple(arch.n_heads),
            dim_ffs=tuple(arch.dim_ffs), window_size=arch.window_size,
            drop_path=arch.drop_path)
    if t == "efficientnetv2":
        from models.efficientnet import efficientnetv2

        return efficientnetv2(arch.width, arch.depth)
    raise NotImplementedError(t)


@pytest.mark.parametrize("conf_name", [
    "vit-s-16.conf",
    "dino_deit-s-16.conf",
    "swin-transformer-s.conf",
    "efficientnetv2-s.conf",
])
def test_shipped_conf_converts_strict(conf_name):
    """Every torch key of the production model maps, and the converted tree
    matches the flax model's init structure exactly."""
    from vision_transformers_tpu.utils.torch_convert import convert_variables

    conf = _conf(conf_name)
    tm = _torch_model(conf.arch)
    sd = {k: t2j(v) for k, v in tm.state_dict().items()}
    variables = convert_variables(conf.arch, sd)  # strict + validated
    import jax

    n = sum(int(np.prod(x.shape)) for x in jax.tree.leaves(variables["params"]))
    assert n > 1_000_000  # production scale, not a stub


def test_swin_s_production_logits_match():
    """Full Swin-S (depths [2,2,18,2], window 7, 224px): converted weights are
    logit-identical through the 18-layer stage the tiny tests never reach."""
    from vision_transformers_tpu.utils.torch_convert import convert_variables
    import jax
    import jax.numpy as jnp

    conf = _conf("swin-transformer-s.conf")
    tm = _torch_model(conf.arch).eval()
    with torch.no_grad():  # zero-init rel-pos tables hide indexing bugs
        for name, p in tm.named_parameters():
            if "rel_pos" in name:
                p.normal_(0, 0.1)
    sd = {k: t2j(v) for k, v in tm.state_dict().items()}
    variables = convert_variables(conf.arch, sd)
    model = conf.arch.make()

    rng = np.random.default_rng(42)
    x = rng.normal(size=(1, 224, 224, 3)).astype(np.float32)
    ours = model.apply(jax.tree.map(jnp.asarray, variables), jnp.asarray(x))
    with torch.no_grad():
        theirs = tm(torch.tensor(x.transpose(0, 3, 1, 2)))
    np.testing.assert_allclose(np.asarray(ours), theirs.numpy(),
                               rtol=2e-3, atol=1e-3)
