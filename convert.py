#!/usr/bin/env python
"""Convert a reference torch checkpoint to this framework's weights.

The reference trainers save ``epoch-NNN.pt`` files holding torch state_dicts
(reference train.py:208-217: ``model``/``ema``; train_dino.py:173-181:
``student``/``teacher``).  This tool maps one of those state_dicts onto the
flax parameter tree of the conf's ``arch`` and writes a restorable orbax
variables checkpoint:

    python convert.py --conf configs/swin-transformer-s.conf \
        --checkpoint /ckpt/epoch-090.pt --key ema --out converted/swin-s

The result plugs into training and evaluation:

    python train.py --conf ... finetune=converted/swin-s
    python evaluate.py --conf ... --checkpoint converted/swin-s

(Both also accept the ``.pt`` directly — ``finetune=/ckpt/epoch-090.pt:ema``
— converting on the fly; this CLI exists to do the conversion once.)
"""

import argparse
import os

# conversion is pure host-side weight shuffling — never touch an accelerator
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    parser.add_argument("--conf", required=True, help=".conf with the arch block")
    parser.add_argument("--checkpoint", required=True, help="reference .pt file")
    parser.add_argument("--out", required=True, help="output checkpoint dir")
    parser.add_argument(
        "--key", default=None,
        help="state_dict to extract: model|ema (classification), "
             "student|teacher (DINO); auto-detected when omitted")
    parser.add_argument("overrides", nargs="*", help="conf key=value overrides")
    args = parser.parse_args()

    from vision_transformers_tpu.config.schema import load_config
    from vision_transformers_tpu.train.checkpoint import save_checkpoint
    from vision_transformers_tpu.utils.torch_convert import (
        convert_variables, load_torch_checkpoint)

    conf = load_config(args.conf, args.overrides)
    sd = load_torch_checkpoint(args.checkpoint, key=args.key)
    variables = convert_variables(conf.arch, sd)

    n_leaves = len(jax.tree.leaves(variables))
    n_params = sum(x.size for x in jax.tree.leaves(variables["params"]))
    path = save_checkpoint(args.out, jax.device_get(variables))
    print(f"{conf.arch.type}: {n_leaves} tensors, {n_params / 1e6:.2f}M params "
          f"-> {path}")


if __name__ == "__main__":
    main()
