"""Config system tests: HOCON parsing, overrides, registry, schema validation."""

import textwrap

import pytest

from vision_transformers_tpu.config import hocon, registry
from vision_transformers_tpu.config.schema import ImageNetConfig, load_config


def test_hocon_basic():
    text = textwrap.dedent(
        """
        # comment
        arch: {
            type: vit
            dim: 384         // trailing comment
            heads = 6
            sizes: [1, 2, 3]
            nested.path: true
        }
        lr: 1e-3
        name: "quoted string"
        bare: hello_world
        flag: off
        """
    )
    conf = hocon.loads(text)
    assert conf["arch"]["type"] == "vit"
    assert conf["arch"]["dim"] == 384
    assert conf["arch"]["heads"] == 6
    assert conf["arch"]["sizes"] == [1, 2, 3]
    assert conf["arch"]["nested"]["path"] is True
    assert conf["lr"] == 1e-3
    assert conf["name"] == "quoted string"
    assert conf["bare"] == "hello_world"
    assert conf["flag"] is False


def test_hocon_key_object_shorthand_and_merge():
    conf = hocon.loads("a { x: 1 }\na { y: 2 }")
    assert conf["a"] == {"x": 1, "y": 2}


def test_hocon_overrides():
    conf = {"a": {"b": 1}, "c": 2}
    hocon.apply_overrides(conf, ["a.b=5", "c=[1,2]", "new.key=hi"])
    assert conf["a"]["b"] == 5
    assert conf["c"] == [1, 2]
    assert conf["new"]["key"] == "hi"


def test_hocon_errors():
    with pytest.raises(hocon.HoconError):
        hocon.loads("key: {unterminated")
    with pytest.raises(hocon.HoconError):
        hocon.apply_overrides({}, ["noequals"])


def test_registry_unknown_type():
    with pytest.raises(KeyError, match="unknown model type"):
        registry.build("model", {"type": "definitely_not_a_model"})
    with pytest.raises(ValueError, match="requires a 'type'"):
        registry.build("model", {"dim": 3})


def test_full_config_roundtrip(tmp_path):
    conf_text = textwrap.dedent(
        """
        arch: {
            type: vit
            image_size: 224
            window_size: 16
            depth: 12
            dim: 384
            n_head: 6
            dim_ff: 1536
        }
        training: {
            optimizer: { type: adamw, lr: 1e-3 }
            scheduler: { type: cycle, lr: 1e-3, warmup: 5 }
            base_lr: 1e-3
            weight_decay: 0.05
            wd_skip: vit
            epoch: 300
            dataloader: { batch_size: 1024 }
        }
        dataset_path: /tmp/data
        """
    )
    p = tmp_path / "test.conf"
    p.write_text(conf_text)
    conf = load_config(str(p), overrides=["training.epoch=10", "training.dataloader.batch_size=64"])
    assert isinstance(conf, ImageNetConfig)
    assert conf.arch.type == "vit"
    assert conf.training.epoch == 10
    assert conf.training.dataloader.batch_size == 64
    assert conf.training.optimizer.type == "adamw"
    # reference API parity: conf.dict() works (reference train.py:214)
    assert conf.dict()["training"]["epoch"] == 10


def test_reference_conf_files_parse():
    """Our shipped .conf files validate against the schema."""
    import glob
    import os

    root = os.path.join(os.path.dirname(__file__), "..", "configs")
    files = glob.glob(os.path.join(root, "*.conf"))
    assert files, "no .conf files shipped"
    for f in files:
        conf = load_config(f)
        assert conf.training.epoch > 0
