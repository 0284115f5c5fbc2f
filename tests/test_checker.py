"""Checker reporters: conf-built, rank-0 gated metric sinks."""

import glob
import json
import os

from vision_transformers_tpu.config import registry


def test_jsonl_reporter_appends(tmp_path):
    rep = registry.build(
        "reporter", {"type": "jsonl", "path": str(tmp_path / "m.jsonl")}).make()
    rep.report(step=1, loss=2.5, lr=0.1)
    rep.report(step=2, loss=2.0, lr=0.2)
    rows = [json.loads(l) for l in open(tmp_path / "m.jsonl")]
    assert rows[0] == {"step": 1, "loss": 2.5, "lr": 0.1}
    assert rows[1]["step"] == 2


def test_tensorboard_reporter_writes_events(tmp_path):
    rep = registry.build(
        "reporter", {"type": "tensorboard", "path": str(tmp_path / "tb")}).make()
    rep.report(step=0, loss=3.25, prec1=10.0, note="ignored-non-scalar")
    rep.report(step=1, loss=3.0)
    events = glob.glob(str(tmp_path / "tb" / "events.out.tfevents.*"))
    assert events, os.listdir(tmp_path / "tb")

    # the scalars actually round-trip through the event file
    from tensorboard.backend.event_processing.event_accumulator import (
        EventAccumulator)

    acc = EventAccumulator(str(tmp_path / "tb"))
    acc.Reload()
    losses = {e.step: e.value for e in acc.Scalars("loss")}
    assert losses == {0: 3.25, 1: 3.0}
    assert "note" not in acc.Tags()["scalars"]


def test_checker_conf_builds_tensorboard_reporter(tmp_path):
    checker = registry.build("checker", {
        "type": "checker",
        "storage": [{"type": "local", "path": str(tmp_path / "ck")}],
        "reporter": [{"type": "logger"},
                     {"type": "tensorboard", "path": str(tmp_path / "tb")}],
    }).make()
    checker.log(step=0, loss=1.0)
    assert glob.glob(str(tmp_path / "tb" / "events.out.tfevents.*"))
