#!/usr/bin/env python
"""Export weights trained here back to a reference-compatible torch .pt.

The inverse of convert.py: takes a checkpoint from this framework (a training
checkpoint written by train.py / train_dino.py, or a converted variables dir)
and writes a ``.pt`` in the reference's own layout (reference
train.py:208-217 / train_dino.py:173-181) so the weights load straight into
the reference's torch models (``load_state_dict(sd["model"], strict=False)``
— the reference recomputes its derived buffers at construction):

    python export.py --conf configs/swin-transformer-s.conf \
        --checkpoint experiment/epoch-090 --out swin-s.pt

Classification checkpoints export ``model`` (+ ``ema`` when trained with
EMA); DINO checkpoints export ``student`` + ``teacher``.
"""

import argparse
import os

# pure host-side weight shuffling — never touch an accelerator
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")


def _variables(params, stats=None):
    out = {"params": params}
    if stats:
        out["batch_stats"] = stats
    return out


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    parser.add_argument("--conf", required=True, help=".conf with the arch block")
    parser.add_argument("--checkpoint", required=True,
                        help="training checkpoint dir or converted variables dir")
    parser.add_argument("--out", required=True, help="output .pt path")
    parser.add_argument("overrides", nargs="*", help="conf key=value overrides")
    args = parser.parse_args()

    import numpy as np
    import torch

    from vision_transformers_tpu.config.schema import load_config
    from vision_transformers_tpu.train.checkpoint import restore_checkpoint
    from vision_transformers_tpu.utils.torch_export import export_state_dict

    conf = load_config(args.conf, args.overrides)
    restored = restore_checkpoint(args.checkpoint)

    def tensors(sd):
        return {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()}

    if "params" in restored:  # converted variables checkpoint
        out = {"model": tensors(export_state_dict(conf.arch, restored))}
    elif "state" in restored:
        state = restored["state"]
        if "student" in state:  # DINO training checkpoint
            out = {
                "student": tensors(export_state_dict(
                    conf.arch, _variables(state["student"]))),
                "teacher": tensors(export_state_dict(
                    conf.arch, _variables(state["teacher"]))),
                "conf": conf.dict(),
            }
        else:  # classification training checkpoint
            out = {
                "model": tensors(export_state_dict(
                    conf.arch, _variables(state["params"], state.get("batch_stats")))),
                "conf": conf.dict(),
            }
            if state.get("ema_params") is not None:
                out["ema"] = tensors(export_state_dict(
                    conf.arch,
                    _variables(state["ema_params"],
                               state.get("ema_batch_stats") or state.get("batch_stats"))))
    else:
        raise SystemExit(
            f"unrecognized checkpoint layout at {args.checkpoint}: {sorted(restored)}")

    torch.save(out, args.out)
    keys = [k for k in out if k != "conf"]
    n = sum(v.numel() for v in out[keys[0]].values())
    print(f"{conf.arch.type}: exported {', '.join(keys)} "
          f"({n / 1e6:.2f}M params each) -> {args.out}")


if __name__ == "__main__":
    main()
