"""flax→torch export: round-trip exactness + torch-reload logit parity.

Two independent pins on utils/torch_export.py:
1. ``export(convert(sd)) == sd`` bit-for-bit on every non-buffer key, for
   every model family (the converter itself is logit-parity-tested, so
   equality transfers the guarantee to the export direction).
2. Weights that ORIGINATE here (a fresh flax init) load into the reference's
   own torch model and produce identical logits — the "train on TPU, serve
   on torch" path.
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from test_torch_parity import _install_stub, REF, t2j  # noqa: F401

_install_stub()
if REF not in sys.path:
    sys.path.insert(0, REF)

from vision_transformers_tpu.utils.torch_convert import (  # noqa: E402
    _is_ignorable, convert_variables)
from vision_transformers_tpu.utils.torch_export import export_state_dict  # noqa: E402


def _torch_tiny(family):
    """(torch_model, arch_conf_dict) at tiny shapes, depths >1 where the
    torch module indexing is nontrivial."""
    if family == "vit":
        from models.vit import VisionTransformer

        tm = VisionTransformer(head=torch.nn.Linear(64, 10), image_size=32,
                               window_size=8, depth=2, dim=64, n_head=2,
                               dim_ff=128, dropout=0, drop_attn=0, drop_ff=0,
                               drop_path=0)
        cfg = {"type": "vit", "image_size": 32, "window_size": 8,
               "n_class": 10, "depth": 2, "dim": 64, "n_head": 2,
               "dim_ff": 128}
    elif family == "dino":
        from models.vit import dino

        kw = dict(image_size=32, window_size=8, depth=2, dim=64, n_head=2,
                  dim_ff=128, dropout=0.0, drop_attn=0.0, drop_ff=0.0,
                  drop_path=0.0, dim_head_out=128, use_bn=False,
                  norm_last_layer=True, depth_head=3, dim_head_ff=96,
                  dim_head_bottleneck=32)
        tm = dino(**kw)
        cfg = {"type": "dino", **kw}
    elif family == "swin_transformer":
        from models.swin_transformer import SwinTransformer

        kw = dict(image_size=(64, 64), n_class=10, depths=(2, 2, 2, 2),
                  dims=(16, 32, 64, 128), dim_head=8, n_heads=(2, 4, 8, 16),
                  dim_ffs=(32, 64, 128, 256), window_size=2)
        tm = SwinTransformer(**kw)
        cfg = {"type": "swin_transformer",
               **{k: list(v) if isinstance(v, tuple) else v for k, v in kw.items()}}
    elif family == "pvt":
        from models.pvt import PyramidVisionTransformer

        tm = PyramidVisionTransformer(
            image_size=32, n_class=10, in_dim=3, depths=(2, 1, 1, 2),
            patch_embed_dims=(16, 32, 64, 128), n_heads=(1, 2, 4, 8),
            dim_ffs=(32, 64, 128, 256), reductions=(4, 2, 2, 1))
        cfg = {"type": "pvt", "image_size": 32, "n_class": 10,
               "depths": [2, 1, 1, 2], "patch_embed_dims": [16, 32, 64, 128],
               "n_heads": [1, 2, 4, 8], "dim_ffs": [32, 64, 128, 256],
               "reductions": [4, 2, 2, 1], "drop_path": 0.0}
    elif family == "halo_transformer":
        from models.halo_transformer import HaloTransformer

        tm = HaloTransformer(
            image_size=64, n_class=10, depths=(2, 1, 1, 2),
            dims=(16, 32, 64, 128), dim_head=8, n_heads=(2, 4, 8, 16),
            dim_ffs=(32, 64, 128, 256), window_size=2, halo_size=1)
        cfg = {"type": "halo_transformer", "image_size": 64, "n_class": 10,
               "depths": [2, 1, 1, 2], "dims": [16, 32, 64, 128],
               "dim_head": 8, "n_heads": [2, 4, 8, 16],
               "dim_ffs": [32, 64, 128, 256], "window_size": 2,
               "halo_size": 1}
    elif family == "twins_svt":
        from models.twins import TwinsSVT

        tm = TwinsSVT(n_class=10, depths=(2, 1, 1, 2), dims=(16, 32, 64, 128),
                      dim_head=8, n_heads=(2, 4, 8, 16),
                      dim_ffs=(32, 64, 128, 256), window_size=2)
        cfg = {"type": "twins_svt", "n_class": 10, "depths": [2, 1, 1, 2],
               "dims": [16, 32, 64, 128], "dim_head": 8,
               "n_heads": [2, 4, 8, 16], "dim_ffs": [32, 64, 128, 256],
               "window_size": 2}
    elif family == "nfnet":
        from models.nfnet import NFNet

        tm = NFNet(n_class=10, channels=(16, 32, 64, 64), depths=(1, 2, 1, 1),
                   groups=(8, 8, 8, 8), stochastic_depth=0.0, dropout=0.0)
        cfg = {"type": "nfnet", "n_class": 10, "channels": [16, 32, 64, 64],
               "depths": [1, 2, 1, 1], "groups": [8, 8, 8, 8],
               "stochastic_depth": 0.0, "dropout": 0.0}
    elif family in ("efficientnet", "efficientnetv2"):
        from models.efficientnet import efficientnet, efficientnetv2

        tm = (efficientnetv2 if family == "efficientnetv2" else efficientnet)(0.25, 0.25)
        with torch.no_grad():
            for name, buf in tm.named_buffers():
                if "running_mean" in name:
                    buf.normal_(0, 0.2)
                if "running_var" in name:
                    buf.uniform_(0.5, 1.5)
        cfg = {"type": family, "width": 0.25, "depth": 0.25,
               "n_class": 1000}
    elif family == "nfefficientnetv2":
        from models.nfefficientnet import nfefficientnetv2

        tm = nfefficientnetv2(0.25, 0.25)
        cfg = {"type": "nfefficientnetv2", "width": 0.25, "depth": 0.25,
               "n_class": 1000}
    else:
        raise NotImplementedError(family)
    return tm.eval(), cfg


FAMILIES = ["vit", "dino", "swin_transformer", "pvt", "halo_transformer",
            "twins_svt", "nfnet", "efficientnet", "efficientnetv2",
            "nfefficientnetv2"]


@pytest.mark.parametrize("family", FAMILIES)
def test_export_inverts_convert_bitexact(family):
    tm, cfg = _torch_tiny(family)
    sd0 = {k: t2j(v) for k, v in tm.state_dict().items()}
    variables = convert_variables(cfg, sd0)
    sd1 = export_state_dict(cfg, jax.device_get(variables))

    learnable = {k for k in sd0 if not _is_ignorable(k)}
    missing = learnable - set(sd1)
    assert not missing, f"export dropped keys: {sorted(missing)[:8]}"
    extra = {k for k in sd1 if k not in sd0}
    assert not extra, f"export invented keys: {sorted(extra)[:8]}"
    for k in learnable:
        np.testing.assert_array_equal(
            sd1[k], sd0[k], err_msg=f"{family}: {k} not bit-identical")


def test_export_cli_full_circle(tmp_path, monkeypatch):
    """reference .pt → convert.py → export.py → .pt: the exported model
    state_dict equals the original bit-for-bit (CLI layer included)."""
    import importlib.util
    import os

    tm, cfg = _torch_tiny("vit")
    sd0 = tm.state_dict()
    src = str(tmp_path / "src.pt")
    torch.save({"model": sd0, "ema": sd0, "scheduler": {}, "optimizer": {},
                "conf": {}}, src)

    root = os.path.join(os.path.dirname(__file__), "..")

    def cli(name):
        spec = importlib.util.spec_from_file_location(
            name, os.path.join(root, f"{name}.py"))
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod

    conf_path = os.path.join(root, "configs", "vit-s-16.conf")
    overrides = ["arch.depth=2", "arch.dim=64", "arch.n_head=2",
                 "arch.dim_ff=128", "arch.image_size=32",
                 "arch.window_size=8", "arch.n_class=10"]
    conv_dir = str(tmp_path / "conv")
    monkeypatch.setattr(sys, "argv", ["convert.py", "--conf", conf_path,
                                      "--checkpoint", src, "--key", "model",
                                      "--out", conv_dir] + overrides)
    cli("convert").main()

    out_pt = str(tmp_path / "back.pt")
    monkeypatch.setattr(sys, "argv", ["export.py", "--conf", conf_path,
                                      "--checkpoint", conv_dir,
                                      "--out", out_pt] + overrides)
    cli("export").main()

    back = torch.load(out_pt, map_location="cpu", weights_only=False)
    assert set(back) == {"model"}
    for k, v in sd0.items():
        np.testing.assert_array_equal(back["model"][k].numpy(), t2j(v),
                                      err_msg=k)


@pytest.mark.parametrize("family", ["vit", "twins_svt", "efficientnetv2"])
def test_flax_weights_serve_on_torch(family):
    """A fresh flax init exported to torch produces identical logits on the
    reference's own model — weights trained here are servable there."""
    tm, cfg = _torch_tiny(family)

    from vision_transformers_tpu.config import registry

    arch = registry.build("model", cfg)
    model = arch.make()
    size = cfg.get("image_size", 64)
    size = size if isinstance(size, int) else size[0]
    variables = model.init(jax.random.PRNGKey(3),
                           jnp.zeros((1, size, size, 3), jnp.float32))
    if "batch_stats" in variables:  # give BN stats non-trivial values
        variables = dict(variables)
        variables["batch_stats"] = jax.tree.map(
            lambda x: x + 0.25, variables["batch_stats"])

    sd = export_state_dict(cfg, jax.device_get(variables))
    missing, unexpected = tm.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()},
        strict=False)
    # the reference may keep derived buffers; no LEARNABLE param may be absent
    param_names = {n for n, _ in tm.named_parameters()}
    assert not (set(missing) & param_names), f"missing params: {missing}"
    assert not unexpected, f"unexpected keys: {unexpected}"

    rng = np.random.default_rng(9)
    x = rng.normal(size=(2, size, size, 3)).astype(np.float32)
    ours = model.apply(variables, jnp.asarray(x))
    with torch.no_grad():
        theirs = tm(torch.tensor(x.transpose(0, 3, 1, 2)))
    np.testing.assert_allclose(np.asarray(ours), theirs.numpy(),
                               rtol=2e-3, atol=5e-4)
