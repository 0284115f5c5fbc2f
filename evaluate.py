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


def _load_variables(path: str, arch_cfg, use_ema: bool) -> dict:
    """Variables from a converted dir / torch .pt / training checkpoint."""
    from vision_transformers_tpu.train.checkpoint import restore_checkpoint
    from vision_transformers_tpu.utils.torch_convert import load_pretrained_variables

    base = path.rsplit(":", 1)[0] if ":" in path else path
    if os.path.isfile(base):  # torch .pt
        return load_pretrained_variables(path, arch_cfg)
    restored = restore_checkpoint(path)
    if "params" in restored:  # converted variables checkpoint
        return restored
    if "state" in restored:  # training checkpoint {"state": ..., "epoch": ...}
        state = restored["state"]
        params = state.get("ema_params") if use_ema else None
        stats = state.get("ema_batch_stats") if use_ema else None
        variables = {"params": params if params is not None else state["params"]}
        stats = stats if stats is not None else state.get("batch_stats")
        if stats:
            variables["batch_stats"] = stats
        return variables
    raise ValueError(f"unrecognized checkpoint layout at {path}: {sorted(restored)}")


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
        model = conf.arch.make(dtype=dtype)
        variables = _load_variables(args.checkpoint, conf.arch,
                                    use_ema=not args.no_ema)
        params = jax.tree.map(jnp.asarray, variables["params"])
        stats = variables.get("batch_stats")
        stats = jax.tree.map(jnp.asarray, stats) if stats else None
        state = engine.TrainState(
            step=jnp.zeros((), jnp.int32), params=params, opt_state=(),
            batch_stats=stats,
        )
        state = jax.device_put(state, meshlib.replicated(mesh))

        _, valid_iter, _ = _make_stage_loaders(conf, settings)
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
