#!/usr/bin/env python
"""Standalone validation: evaluate a checkpoint on the validation set.

The reference only validates inside its training loop (reference
train.py:165-198); this entry point evaluates any checkpoint — a training
checkpoint, a converted variables dir (convert.py), or a reference torch
``.pt`` directly — without touching the optimizer stack:

    # a training checkpoint written by train.py (EMA weights by default)
    python evaluate.py --conf configs/swin-transformer-s.conf \
        --checkpoint experiment/epoch-090

    # a converted / reference checkpoint
    python evaluate.py --conf ... --checkpoint converted/swin-s
    python evaluate.py --conf ... --checkpoint /ckpt/epoch-090.pt:ema

Prints one JSON line: {"loss": ..., "prec1": ..., "prec5": ..., "n": ...}.
"""

import argparse
import json
import os

import jax

if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import jax.numpy as jnp


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    parser.add_argument("--conf", required=True)
    parser.add_argument("--checkpoint", required=True)
    parser.add_argument("--no-ema", action="store_true",
                        help="evaluate raw params instead of EMA weights "
                             "(training checkpoints only)")
    parser.add_argument("overrides", nargs="*")
    args = parser.parse_args()

    if os.environ.get("JAX_COORDINATOR_ADDRESS"):
        jax.distributed.initialize()

    from vision_transformers_tpu.config.schema import load_config
    from vision_transformers_tpu.data.factory import stage_settings
    from vision_transformers_tpu.parallel import mesh as meshlib
    from vision_transformers_tpu.train import engine
    from vision_transformers_tpu.train.trainer import (_compute_dtype,
                                                       _make_stage_loaders)

    conf = load_config(args.conf, args.overrides)
    mesh = meshlib.make_mesh(conf.n_device, conf.mesh.model)
    from vision_transformers_tpu import ops as _ops
    from vision_transformers_tpu.utils.logging import get_logger, is_primary

    _ops.tp_kernel_guard(conf.mesh.model, get_logger())
    dtype = _compute_dtype(conf)
    settings = stage_settings(conf.training, 10**9)  # final-stage sizes

    with mesh:
        from vision_transformers_tpu.utils.torch_convert import load_eval_variables

        model = conf.arch.make(dtype=dtype)
        variables = load_eval_variables(args.checkpoint, conf.arch,
                                        use_ema=not args.no_ema)
        params = jax.tree.map(jnp.asarray, variables["params"])
        stats = variables.get("batch_stats")
        stats = jax.tree.map(jnp.asarray, stats) if stats else None
        state = engine.TrainState(
            step=jnp.zeros((), jnp.int32), params=params, opt_state=(),
            batch_stats=stats,
        )
        state = jax.device_put(state, meshlib.replicated(mesh))

        # valid_only: the train split need not exist on an eval host, and
        # auto-backend resolution keys on valid.rec, not train.rec
        _, valid_iter, _ = _make_stage_loaders(conf, settings, valid_only=True)
        eval_step = jax.jit(engine.make_eval_step(model, use_ema=False))

        dev_sums = None
        for batch_data in valid_iter():
            batch_data = meshlib.shard_batch(mesh, batch_data)
            out = eval_step(state, batch_data)
            dev_sums = out if dev_sums is None else \
                jax.tree.map(jnp.add, dev_sums, out)
        if dev_sums is None:
            raise SystemExit("validation set is empty")
        sums = {k: float(v) for k, v in dev_sums.items()}
        n = max(sums["n"], 1.0)
        result = {"loss": sums["loss"] / n, "prec1": sums["prec1"] / n,
                  "prec5": sums["prec5"] / n, "n": int(sums["n"])}
        if is_primary():
            print(json.dumps(result))


if __name__ == "__main__":
    main()
