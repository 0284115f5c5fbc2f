#!/usr/bin/env python
"""Single-request inference latency (serving story): jitted bf16 forward,
batch 1 / 8 / 32, p50 over 50 timed calls after warmup.

The training benches measure throughput; a serving deployment cares about
the latency floor of one jitted forward including host→device transfer of
the input and device→host of the logits.  NOTE: through the axon relay
every per-call sync pays the tunnel RTT, so ``wall_p50_ms`` is only
meaningful on a directly-attached host; ``device_ms`` (a chained no-fetch
loop) amortizes the relay away.  Usage:

  python scripts/bench_latency.py [vit|swin|effnetv2|halo]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    arch = sys.argv[1] if len(sys.argv) > 1 else "vit"
    from scripts.bench_impls import ARCHS, IMG_SIZE
    from vision_transformers_tpu.config import registry

    size = IMG_SIZE.get(arch, 224)
    model = registry.build("model", ARCHS[arch]).make(dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    # jit the init: eager flax init is hundreds of op dispatches, which on
    # a relayed device each pay a network round trip
    params = jax.jit(model.init)(rng, jnp.zeros((1, size, size, 3)))

    @jax.jit
    def forward(params, x):
        return model.apply(params, x)

    batches = tuple(int(x) for x in
                    os.environ.get("VTX_LAT_BATCHES", "1,8,32").split(","))
    out = {}
    for batch in batches:
        x_host = np.random.default_rng(0).normal(
            size=(batch, size, size, 3)).astype(np.float32)
        # warmup (compile + cache)
        for _ in range(3):
            _ = np.asarray(forward(params, jnp.asarray(x_host)))
        # wall p50 incl. one host→device→host round trip per call (on the
        # axon relay this is tunnel-RTT dominated; on a real host it is the
        # serving latency)
        times = []
        x_dev = jnp.asarray(x_host)
        for _ in range(15):
            t0 = time.perf_counter()
            _ = np.asarray(forward(params, x_dev))
            times.append(time.perf_counter() - t0)
        times.sort()
        wall_p50 = times[len(times) // 2] * 1000
        # device-only ms/call: chain N dependent forwards, one final fetch —
        # amortizes the relay round trip away
        n = 30
        t0 = time.perf_counter()
        y = x_dev
        acc = jnp.zeros((), jnp.float32)
        for _ in range(n):
            acc = acc + forward(params, y).astype(jnp.float32).sum()
        _ = float(acc)
        dev_ms = (time.perf_counter() - t0) / n * 1000
        out[batch] = {"wall_p50_ms": round(wall_p50, 2),
                      "device_ms": round(dev_ms, 2)}
        print(f"{arch} batch={batch}: wall p50 {wall_p50:.2f} ms, "
              f"device {dev_ms:.2f} ms/call", flush=True)
    print(json.dumps({"arch": arch, "latency": out}))


if __name__ == "__main__":
    main()
