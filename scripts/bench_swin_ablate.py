#!/usr/bin/env python
"""Ablate the Swin-S train step to locate the time sink.

Variants (full fwd+bwd+AdamW step at a given batch):
  full     — einsum window attention (the shipped default)
  attn-id  — attention replaced by identity AFTER the qkv projection and
             window reshapes (keeps roll/partition/transpose costs)
  no-win   — qkv projection + out projection only, NO window reshapes/roll
             (isolates the relayout cost)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from vision_transformers_tpu.models import swin as swin_mod


def patch(variant):
    import math
    from flax import linen as nn
    from vision_transformers_tpu.models.layers import trunc_normal_init

    orig = swin_mod.WindowAttention.__call__
    if variant == "full":
        return orig

    def call(self, x, deterministic=True):
        b, h, w, dim = x.shape
        window = self.window_size
        hs, ws = h // window, w // window
        inner = self.n_head * self.dim_head
        roll = window // 2
        if self.shift:
            x = jnp.roll(x, (-roll, -roll), (1, 2))
        qkv = nn.Dense(inner * 3, dtype=self.dtype,
                       kernel_init=trunc_normal_init(0.02), name="weight")(x)
        if variant == "no-win":
            out = qkv[..., :inner]
        else:  # attn-id: keep the reshapes, skip the attention math
            q = qkv.reshape(b, hs, window, ws, window, 3, self.n_head, self.dim_head)
            q = q.transpose(0, 1, 3, 5, 6, 2, 4, 7).reshape(
                b, hs * ws, 3, self.n_head, window * window, self.dim_head)[:, :, 0]
            out = q.reshape(b, hs, ws, self.n_head, window, window, self.dim_head)
            out = out.transpose(0, 1, 4, 2, 5, 3, 6).reshape(b, h, w, inner)
        out = nn.Dense(dim, dtype=self.dtype,
                       kernel_init=trunc_normal_init(0.02), name="linear")(out)
        if self.shift:
            out = jnp.roll(out, (roll, roll), (1, 2))
        return out

    return call


def bench(variant, batch):
    from vision_transformers_tpu.config import registry
    from vision_transformers_tpu.parallel import mesh as meshlib
    from vision_transformers_tpu.train import engine
    from vision_transformers_tpu.train.optim import make_optimizer
    from vision_transformers_tpu.config.schema import Training

    swin_mod.WindowAttention.__call__ = patch(variant)
    try:
        mesh = meshlib.make_mesh()
        model = registry.build(
            "model",
            {"type": "swin_transformer", "image_size": 224, "n_class": 1000,
             "depths": [2, 2, 18, 2], "dims": [96, 192, 384, 768],
             "dim_head": 32, "n_heads": [3, 6, 12, 24],
             "dim_ffs": [384, 768, 1536, 3072], "window_size": 7},
        ).make(dtype=jnp.bfloat16)
        train_conf = Training(
            optimizer={"type": "adamw", "lr": 1e-3},
            scheduler={"type": "constant", "lr": 1e-3},
            base_lr=1e-3, weight_decay=0.05, wd_skip="vit", epoch=1,
            clip_grad_norm=5.0,
        )
        rng = jax.random.PRNGKey(0)
        shape = (2, 224, 224, 3)
        with mesh:
            params_shape = jax.eval_shape(
                lambda: model.init(rng, jnp.zeros(shape)))["params"]
            tx = make_optimizer(train_conf, params_shape, lambda c: 1e-3)
            state = engine.create_train_state(rng, model, shape, tx)
            state = jax.device_put(state, meshlib.replicated(mesh))
            step = jax.jit(engine.make_train_step(model, tx), donate_argnums=(0,))
            host = {
                "image": np.random.default_rng(0).normal(
                    size=(batch, 224, 224, 3)).astype(np.float32),
                "label1": np.zeros(batch, np.int32),
                "label2": np.zeros(batch, np.int32),
                "ratio": np.ones(batch, np.float32),
            }
            sharded = meshlib.shard_batch(mesh, host)
            state, m = step(state, sharded, rng)
            _ = float(m["loss"])

            trivial = jax.jit(lambda a: a + 1)
            z = trivial(jnp.zeros(())); _ = float(z)
            t0 = time.perf_counter(); _ = float(trivial(z))
            rt = time.perf_counter() - t0

            n_iter = 10
            best = float("inf")
            for _w in range(3):
                t0 = time.perf_counter()
                for _ in range(n_iter):
                    state, m = step(state, sharded, rng)
                _ = float(m["loss"])
                best = min(best, time.perf_counter() - t0 - rt)
            ms = best / n_iter * 1000
            print(f"{variant} batch={batch}: {ms:.1f} ms/step "
                  f"({batch / (best / n_iter):.1f} img/s)", flush=True)
            return round(ms, 1)
    finally:
        swin_mod.WindowAttention.__call__ = patch("full")


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    out = {v: bench(v, batch) for v in ("full", "attn-id", "no-win")}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
