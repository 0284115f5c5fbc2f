#!/usr/bin/env python
"""Compile-time A/B for arch.scan_layers on the DINO multi-crop train step.

The round-4 finding: the DINO step at 224/chip failed a 10-minute compile
window — the unrolled 12-layer stack × 3 arms (teacher fwd, student global,
student packed-local) makes the XLA graph explode, and 300-epoch
progressive runs re-jit per stage.  scan_layers collapses the stack into
ONE scanned layer body (params carry a [depth] axis), shrinking the graph
~12×.

This measures trace+lower+compile wall time of the FULL DINO train step
(scan on/off) on whatever backend is active.  On the 1-core CPU host the
XLA-graph-size component dominates, so CPU numbers are a faithful proxy for
the graph-size win (the Mosaic kernel compiles are cached per shape and
identical between the two).

Usage: [JAX_PLATFORMS=cpu] python scripts/exp_scan_compile.py [batch] [depth]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def measure(batch, depth, scan):
    import bench_dino  # noqa: F401 — path side effects only
    from vision_transformers_tpu.config.schema import load_config
    from vision_transformers_tpu.parallel import mesh as meshlib
    from vision_transformers_tpu.config import registry
    from vision_transformers_tpu.train.dino import (DINOTrainState,
                                                    _last_layer_mask,
                                                    make_dino_train_step)
    from vision_transformers_tpu.config.schema import Training

    arch = registry.build(
        "model",
        {"type": "dino", "image_size": 224, "window_size": 16,
         "depth": depth, "dim": 384, "n_head": 6, "dim_ff": 1536,
         "dim_head_out": 65536, "drop_path": 0.1, "scan_layers": scan})
    dtype = jnp.bfloat16
    student_model = arch.make(dtype=dtype, drop_path=0.1)
    teacher_model = arch.make(dtype=dtype, drop_path=0.0)
    training = Training(
        optimizer={"type": "adamw", "lr": 1e-3},
        scheduler={"type": "constant", "lr": 1e-3},
        base_lr=1e-3, weight_decay=0.04, wd_skip="dino", epoch=1,
        clip_grad_norm=3.0,
    )
    mesh = meshlib.make_mesh()
    rng = jax.random.PRNGKey(0)
    with mesh:
        g = jnp.zeros((2, 224, 224, 3))
        l = jnp.zeros((2, 96, 96, 3))
        t0 = time.perf_counter()
        variables = student_model.init(rng, [g, g] + [l] * 8)
        init_s = time.perf_counter() - t0
        student = variables["params"]
        tx, dino_step = make_dino_train_step(
            training, student_model, teacher_model, student,
            lambda c: 1e-3, [0.04, 0.04], n_crop=10)
        state = DINOTrainState(
            step=jnp.zeros((), jnp.int32), student=student,
            teacher=jax.tree.map(jnp.copy, student),
            opt_state=tx.init(student),
            center=jnp.zeros((1, 65536), jnp.float32))
        state = jax.device_put(state, meshlib.replicated(mesh))
        gen = np.random.default_rng(0)
        crops = [jnp.asarray(gen.normal(size=(batch, 224, 224, 3)),
                             jnp.float32)] * 2 + \
                [jnp.asarray(gen.normal(size=(batch, 96, 96, 3)),
                             jnp.float32)] * 8
        crops = [meshlib.shard_batch(mesh, {"x": c})["x"] for c in crops]
        step = jax.jit(dino_step, donate_argnums=(0,))
        t0 = time.perf_counter()
        lowered = step.lower(state, crops, rng, jnp.float32(0.04),
                             jnp.float32(0.996), jnp.int32(0))
        trace_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        compiled = lowered.compile()
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        state, m = compiled(state, crops, rng, jnp.float32(0.04),
                            jnp.float32(0.996), jnp.int32(0))
        loss = float(m["loss"])
        run_s = time.perf_counter() - t0
    out = {"scan": scan, "batch": batch, "depth": depth,
           "init_s": round(init_s, 1), "trace_s": round(trace_s, 1),
           "compile_s": round(compile_s, 1), "first_step_s": round(run_s, 1),
           "loss": round(loss, 4)}
    print(json.dumps(out), flush=True)
    return out


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    depth = int(sys.argv[2]) if len(sys.argv) > 2 else 12
    for scan in (True, False):
        measure(batch, depth, scan)


if __name__ == "__main__":
    main()
