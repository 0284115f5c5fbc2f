"""Checkpoint migration end-to-end: convert.py, evaluate.py, finetune=.

Builds a real reference-format ``.pt`` checkpoint (reference train.py:208-217
layout: model/ema/scheduler/optimizer/conf) from the reference's own torch
ViT, converts it, and drives the full downstream surface on CPU.
"""

import importlib.util
import json
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from test_torch_parity import _install_stub, REF  # noqa: F401

_install_stub()
if REF not in sys.path:
    sys.path.insert(0, REF)

ROOT = os.path.join(os.path.dirname(__file__), "..")
CONF = os.path.join(ROOT, "configs", "vit-s-16.conf")

ARCH_OVERRIDES = [
    "arch.depth=1", "arch.dim=32", "arch.n_head=2", "arch.dim_ff=64",
    "arch.image_size=16", "arch.window_size=8", "arch.n_class=5",
]


def _cli(name):
    """Import a repo-root CLI module (convert.py / evaluate.py) by path."""
    spec = importlib.util.spec_from_file_location(name, os.path.join(ROOT, f"{name}.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def reference_pt(tmp_path_factory):
    """A reference-layout checkpoint with distinct model vs ema weights."""
    from models.vit import VisionTransformer as TorchViT

    def make(seed):
        torch.manual_seed(seed)
        return TorchViT(head=torch.nn.Linear(32, 5), image_size=16,
                        window_size=8, depth=1, dim=32, n_head=2, dim_ff=64,
                        dropout=0, drop_attn=0, drop_ff=0, drop_path=0).eval()

    model, ema = make(0), make(1)
    path = tmp_path_factory.mktemp("ref") / "epoch-003.pt"
    torch.save(
        {"model": model.state_dict(), "ema": ema.state_dict(),
         "scheduler": {}, "optimizer": {}, "conf": {"arch": {"type": "vit"}}},
        path,
    )
    return str(path), model, ema


def test_convert_cli_roundtrip(reference_pt, tmp_path, monkeypatch):
    """convert.py writes an orbax variables checkpoint whose logits match the
    source torch model."""
    pt_path, torch_model, _ = reference_pt
    out = str(tmp_path / "converted")
    monkeypatch.setattr(sys, "argv", [
        "convert.py", "--conf", CONF, "--checkpoint", pt_path,
        "--key", "model", "--out", out] + ARCH_OVERRIDES)
    _cli("convert").main()

    from vision_transformers_tpu.config.schema import load_config
    from vision_transformers_tpu.train.checkpoint import restore_checkpoint

    conf = load_config(CONF, ARCH_OVERRIDES)
    variables = restore_checkpoint(out)
    model = conf.arch.make()

    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 16, 16, 3)).astype(np.float32)
    ours = model.apply(jax.tree.map(jnp.asarray, variables), jnp.asarray(x))
    with torch.no_grad():
        theirs = torch_model(torch.tensor(x.transpose(0, 3, 1, 2)))
    np.testing.assert_allclose(np.asarray(ours), theirs.numpy(),
                               rtol=2e-4, atol=2e-5)


def test_evaluate_cli_on_pt_key_suffix(reference_pt, monkeypatch, capsys):
    """evaluate.py consumes a reference .pt directly via PATH:key and prints
    the metrics JSON line."""
    pt_path, _, _ = reference_pt
    monkeypatch.setattr(sys, "argv", [
        "evaluate.py", "--conf", CONF, "--checkpoint", f"{pt_path}:ema",
    ] + ARCH_OVERRIDES + [
        "data_backend=synthetic", "training.dataloader.batch_size=8",
        "training.train_size=16", "training.valid_size=16", "precision=f32",
        "dataset_path=/nonexistent",
    ])
    _cli("evaluate").main()
    line = capsys.readouterr().out.strip().splitlines()[-1]
    result = json.loads(line)
    assert set(result) == {"loss", "prec1", "prec5", "n"}
    assert np.isfinite(result["loss"]) and result["n"] > 0


def test_evaluate_model_vs_ema_differ(reference_pt, tmp_path, monkeypatch, capsys):
    """model and ema weights are different models — their metrics must differ
    (pins that --key/:key actually selects the sub-state_dict)."""
    pt_path, _, _ = reference_pt
    common = [
        "--conf", CONF] + ARCH_OVERRIDES + [
        "data_backend=synthetic", "training.dataloader.batch_size=8",
        "training.train_size=16", "training.valid_size=16", "precision=f32",
        "dataset_path=/nonexistent",
    ]
    results = []
    for key in ("model", "ema"):
        monkeypatch.setattr(sys, "argv",
                            ["evaluate.py", "--checkpoint", f"{pt_path}:{key}"] + common)
        _cli("evaluate").main()
        line = capsys.readouterr().out.strip().splitlines()[-1]
        results.append(json.loads(line)["loss"])
    assert results[0] != results[1]


def test_finetune_from_converted(reference_pt, tmp_path, monkeypatch):
    """finetune= starts training from converted weights: after one tiny epoch
    the saved params sit a few AdamW steps from the pretrained values — far
    inside the distance to any fresh random init."""
    pt_path, torch_model, _ = reference_pt
    out = str(tmp_path / "converted")
    monkeypatch.setattr(sys, "argv", [
        "convert.py", "--conf", CONF, "--checkpoint", pt_path,
        "--key", "model", "--out", out] + ARCH_OVERRIDES)
    _cli("convert").main()

    from vision_transformers_tpu.config.schema import load_config
    from vision_transformers_tpu.train.checkpoint import restore_checkpoint
    from vision_transformers_tpu.train.trainer import train_classification

    conf = load_config(CONF, ARCH_OVERRIDES + [
        "training.epoch=1", "training.dataloader.batch_size=16",
        "data_backend=synthetic", "training.train_size=16",
        "training.valid_size=16", "dataset_path=/nonexistent",
        "precision=f32", "training.scheduler.warmup=0",
        f"finetune={out}",
        f"checker.storage=[{{type: local, path: {tmp_path}/ck}}]",
    ])
    metrics = train_classification(conf)
    assert np.isfinite(metrics["loss"])

    converted = restore_checkpoint(out)
    saved = restore_checkpoint(str(tmp_path / "ck" / "epoch-001"))
    # 4 AdamW steps at the scaled lr move pos_embed by ~1e-3; two independent
    # N(0, 0.02) inits differ by ~0.1 at the max — 0.02 separates the cases
    pre = converted["params"]["pos_embed"]
    got = saved["state"]["params"]["pos_embed"]
    assert float(np.max(np.abs(got - pre))) < 0.02


def test_dino_finetune_from_reference_pt(tmp_path):
    """train_dino finetune= consumes a reference DINO .pt: the student AND
    teacher state_dicts both load (they are different nets — the saved
    checkpoint must stay near its own source, not the other's)."""
    from models.vit import dino as torch_dino

    kw = dict(image_size=32, window_size=8, depth=2, dim=32, n_head=2,
              dim_ff=64, dropout=0.0, drop_attn=0.0, drop_ff=0.0,
              drop_path=0.0, dim_head_out=64, use_bn=False,
              norm_last_layer=True, depth_head=3, dim_head_ff=64,
              dim_head_bottleneck=16)

    def mk(seed):
        torch.manual_seed(seed)
        return torch_dino(**kw)

    student, teacher = mk(0), mk(1)
    pt = str(tmp_path / "dino-epoch.pt")
    torch.save({"student": student.state_dict(), "teacher": teacher.state_dict(),
                "scheduler": {}, "optimizer": {}, "conf": {}}, pt)

    from vision_transformers_tpu.config.schema import load_config
    from vision_transformers_tpu.train.checkpoint import restore_checkpoint
    from vision_transformers_tpu.train.dino import train_dino
    from vision_transformers_tpu.utils.torch_convert import load_pretrained_variables

    conf = load_config(
        os.path.join(ROOT, "configs", "dino_deit-s-16.conf"),
        overrides=[
            "training.epoch=1", "training.dataloader.batch_size=8",
            "arch.depth=2", "arch.dim=32", "arch.n_head=2", "arch.dim_ff=64",
            "arch.image_size=32", "arch.window_size=8", "arch.dim_head_out=64",
            "arch.dim_head_ff=64", "arch.dim_head_bottleneck=16",
            "task.global_crop_size=32", "task.local_crop_size=16",
            "task.n_local_crop=2", "dataset_path=/nonexistent",
            "precision=f32", "data_backend=synthetic", f"finetune={pt}",
            f"checker.storage=[{{type: local, path: {tmp_path}/ck}}]",
        ])
    metrics = train_dino(conf)
    assert np.isfinite(metrics["loss"])

    saved = restore_checkpoint(str(tmp_path / "ck" / "epoch-001"))["state"]
    v_student = load_pretrained_variables(f"{pt}:student", conf.arch)["params"]
    v_teacher = load_pretrained_variables(f"{pt}:teacher", conf.arch)["params"]
    pe_s = np.asarray(v_student["backbone"]["pos_embed"])
    pe_t = np.asarray(v_teacher["backbone"]["pos_embed"])

    def dist(a, b):
        return float(np.max(np.abs(np.asarray(a) - np.asarray(b))))

    # a few optimizer steps / EMA updates drift ~1e-3; two independent inits
    # differ ~0.1 — each net must sit near its own source
    assert dist(saved["student"]["backbone"]["pos_embed"], pe_s) < 0.02
    assert dist(saved["teacher"]["backbone"]["pos_embed"], pe_t) < 0.02
    assert dist(pe_s, pe_t) > 0.05  # the sources ARE distinguishable


def test_evaluate_valid_only_records(reference_pt, tmp_path, monkeypatch, capsys):
    """evaluate.py works against a dataset dir holding ONLY the validation
    split (review fix: eval hosts don't carry train.rec, and auto-backend must
    key on valid.rec — silently falling back to synthetic would publish
    random-data metrics)."""
    from PIL import Image

    from vision_transformers_tpu.data.records import pack_image_folder

    rng = np.random.default_rng(0)
    for c in range(2):
        d = tmp_path / "images" / f"class{c}"
        d.mkdir(parents=True)
        for i in range(3):
            arr = rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)
            Image.fromarray(arr).save(d / f"{i}.jpg", quality=90)
    data = tmp_path / "data"
    data.mkdir()
    assert pack_image_folder(str(tmp_path / "images"),
                             str(data / "valid"), verbose=False) == 6

    pt_path, _, _ = reference_pt
    monkeypatch.setattr(sys, "argv", [
        "evaluate.py", "--conf", CONF, "--checkpoint", f"{pt_path}:model",
    ] + ARCH_OVERRIDES + [
        "training.dataloader.batch_size=8", "training.train_size=16",
        "training.valid_size=16", "precision=f32",
        "training.dataloader.num_workers=0", f"dataset_path={data}",
    ])
    _cli("evaluate").main()
    result = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert result["n"] == 6  # the REAL images, wrap-padding zero-weighted
    assert np.isfinite(result["loss"])


def test_converter_error_paths(reference_pt, tmp_path):
    """Review fixes: trained weight-norm gains vs norm_last_layer=true must
    error; unknown checkpoint wrappers must name their keys; ':key' on a
    converted dir must error rather than be ignored."""
    from models.vit import dino as torch_dino

    from vision_transformers_tpu.config.schema import load_config
    from vision_transformers_tpu.utils.torch_convert import (
        convert_variables, load_pretrained_variables, load_torch_checkpoint)

    # trained gains + norm_last_layer=true conf
    kw = dict(image_size=16, window_size=8, depth=1, dim=32, n_head=2,
              dim_ff=64, dropout=0.0, drop_attn=0.0, drop_ff=0.0,
              drop_path=0.0, dim_head_out=32, use_bn=False,
              norm_last_layer=False, depth_head=2, dim_head_ff=48,
              dim_head_bottleneck=16)
    tm = torch_dino(**kw)
    with torch.no_grad():
        dict(tm.named_parameters())["head.last.weight_g"].normal_(1.0, 0.3)
    sd = {k: np.asarray(v.detach()) for k, v in tm.state_dict().items()}
    good = dict(kw, norm_last_layer=False)
    convert_variables({"type": "dino", **good}, sd)  # fine when conf matches
    with pytest.raises(ValueError, match="norm_last_layer"):
        convert_variables({"type": "dino", **dict(kw, norm_last_layer=True)}, sd)

    # unknown wrapper keys
    weird = str(tmp_path / "weird.pt")
    torch.save({"generator": tm.state_dict(), "discriminator": {}}, weird)
    with pytest.raises(KeyError, match="pass key="):
        load_torch_checkpoint(weird)

    # :key on a converted dir
    pt_path, _, _ = reference_pt
    conf = load_config(CONF, ARCH_OVERRIDES)
    with pytest.raises(ValueError, match="exactly one variable set"):
        load_pretrained_variables(f"{tmp_path}:ema", conf.arch)


def test_predict_cli(reference_pt, tmp_path, monkeypatch, capsys):
    """predict.py classifies image files from a reference .pt: one JSON line
    per file, probabilities sum to ~1, labels file honored."""
    from PIL import Image

    rng = np.random.default_rng(1)
    files = []
    for i in range(2):
        p = tmp_path / f"img{i}.jpg"
        Image.fromarray(rng.integers(0, 255, (40, 48, 3), dtype=np.uint8)).save(p)
        files.append(str(p))
    labels = tmp_path / "labels.txt"
    labels.write_text("".join(f"name{i}\n" for i in range(5)))

    pt_path, _, _ = reference_pt
    monkeypatch.setattr(sys, "argv", [
        "predict.py", "--conf", CONF, "--checkpoint", f"{pt_path}:model",
        "--topk", "3", "--labels", str(labels), "--size", "16",
    ] + files + ARCH_OVERRIDES + ["precision=f32"])
    _cli("predict").main()
    lines = [json.loads(x) for x in capsys.readouterr().out.strip().splitlines()]
    assert [e["file"] for e in lines] == files
    for e in lines:
        assert len(e["topk"]) == 3
        assert e["topk"][0]["prob"] >= e["topk"][1]["prob"]
        assert e["topk"][0]["label"].startswith("name")


def test_load_pretrained_variables_key_suffix(reference_pt):
    from vision_transformers_tpu.config.schema import load_config
    from vision_transformers_tpu.utils.torch_convert import load_pretrained_variables

    pt_path, torch_model, ema_model = reference_pt
    conf = load_config(CONF, ARCH_OVERRIDES)
    v_model = load_pretrained_variables(f"{pt_path}:model", conf.arch)
    v_ema = load_pretrained_variables(f"{pt_path}:ema", conf.arch)
    w_model = torch_model.state_dict()["head.weight"].numpy().T
    w_ema = ema_model.state_dict()["head.weight"].numpy().T
    np.testing.assert_allclose(np.asarray(v_model["params"]["head"]["kernel"]), w_model)
    np.testing.assert_allclose(np.asarray(v_ema["params"]["head"]["kernel"]), w_ema)
