#!/usr/bin/env python
"""Capture a jax.profiler trace of N train steps and print the HLO op-level
time breakdown (parsed with tensorboard_plugin_profile).

Usage: python scripts/profile_step.py {vit|swin} [batch_per_chip] [impl]
"""

import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    arch = sys.argv[1] if len(sys.argv) > 1 else "swin"
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    impl = sys.argv[3] if len(sys.argv) > 3 else "layer"

    from vision_transformers_tpu import ops
    from vision_transformers_tpu.config import registry
    from vision_transformers_tpu.parallel import mesh as meshlib
    from vision_transformers_tpu.train import engine
    from vision_transformers_tpu.train.optim import make_optimizer
    from vision_transformers_tpu.config.schema import Training
    from scripts.bench_impls import ARCHS, IMG_SIZE

    ops.set_attention_impl(None if impl == "auto" else impl)
    mesh = meshlib.make_mesh()
    model = registry.build("model", ARCHS[arch]).make(dtype=jnp.bfloat16)
    train_conf = Training(
        optimizer={"type": "adamw", "lr": 1e-3},
        scheduler={"type": "constant", "lr": 1e-3},
        base_lr=1e-3, weight_decay=0.05, wd_skip="vit", epoch=1,
        clip_grad_norm=5.0,
    )
    rng = jax.random.PRNGKey(0)
    size = IMG_SIZE.get(arch, 224)
    shape = (2, size, size, 3)
    with mesh:
        params_shape = jax.eval_shape(lambda: model.init(rng, jnp.zeros(shape)))["params"]
        tx = make_optimizer(train_conf, params_shape, lambda c: 1e-3)
        state = engine.create_train_state(rng, model, shape, tx)
        state = jax.device_put(state, meshlib.replicated(mesh))
        step = jax.jit(engine.make_train_step(model, tx), donate_argnums=(0,))
        host = {
            "image": np.random.default_rng(0).normal(
                size=(batch, size, size, 3)).astype(np.float32),
            "label1": np.zeros(batch, np.int32),
            "label2": np.zeros(batch, np.int32),
            "ratio": np.ones(batch, np.float32),
        }
        sharded = meshlib.shard_batch(mesh, host)
        state, m = step(state, sharded, rng)
        _ = float(m["loss"])

        outdir = f"/tmp/prof_{arch}_{impl}_{batch}"
        os.system(f"rm -rf {outdir}")
        with jax.profiler.trace(outdir):
            for _ in range(3):
                state, m = step(state, sharded, rng)
            _ = float(m["loss"])

    xplanes = glob.glob(outdir + "/**/*.xplane.pb", recursive=True)
    print("xplane:", xplanes)
    from tensorboard_plugin_profile.convert import raw_to_tool_data

    data, _ = raw_to_tool_data.xspace_to_tool_data(xplanes, "hlo_stats^",
                                                   params={})
    import json
    # hlo_stats returns JSON-ish; just dump to a file and print top rows
    out = outdir + "/hlo_stats.json"
    mode = "wb" if isinstance(data, bytes) else "w"
    with open(out, mode) as f:
        f.write(data)
    print("wrote", out)


if __name__ == "__main__":
    main()
