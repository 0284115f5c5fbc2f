#!/usr/bin/env python
"""Decide the batched-weight-grad layer1 backward (PERF.md round 4 "stays
OPEN only through the batched-weight-grad variant"): inside one Pallas
program, is accumulating a weight grad as ONE collapsed [bc·N]-contraction
per grid step faster than bc per-row [N]-contractions?

The collapse requires reshaping VMEM scratch [bc, N, F] -> [bc*N, F] with
N = 197 (not sublane-aligned) — exactly the sublane-compaction pattern that
sank the round-2 "block-wide" forward variant.  Here the reshape happens
ONCE per grid step against FOUR weight-grad dots, so the tradeoff can go
the other way; this microbench measures it in isolation at the ViT-S
backward shapes (the regime where layer1 currently loses ~9% to layer).

Three kernels over a [B, N, F] "af"/"dh" stream and a [B, N, C] "dout"/"u2"
stream (simulating the FF backward's dw2 = af^T dout and dw1 = u2^T dh):

  perrow   — fori_loop j: dw += s[j]^T d[j]            (what layer1 ships)
  batched  — reshape both to [bc*N, *], one dot         (the open variant)
  batched8 — same but N pre-padded to 200 (8-aligned)   (reshape is free;
             isolates the compaction cost from the dot win)

Usage: python scripts/exp_wgrad_batch.py [N] [iters]
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _k_perrow(s_ref, d_ref, dw_ref, *, bc):
    @pl.when(pl.program_id(0) == 0)
    def _():
        dw_ref[...] = jnp.zeros_like(dw_ref[...])

    def body(j, _):
        dw_ref[...] += jax.lax.dot_general(
            s_ref[j], d_ref[j], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return _

    jax.lax.fori_loop(0, bc, body, 0)


def _k_batched(s_ref, d_ref, dw_ref, *, bc):
    @pl.when(pl.program_id(0) == 0)
    def _():
        dw_ref[...] = jnp.zeros_like(dw_ref[...])

    N, F = s_ref.shape[1], s_ref.shape[2]
    C = d_ref.shape[2]
    s2 = s_ref[...].reshape(bc * N, F)
    d2 = d_ref[...].reshape(bc * N, C)
    dw_ref[...] += jax.lax.dot_general(
        s2, d2, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def bench(kernel, B, bc, N, F, C, iters, dtype=jnp.bfloat16):
    s = jnp.asarray(np.random.default_rng(0).normal(size=(B, N, F)) * 0.1,
                    dtype)
    d = jnp.asarray(np.random.default_rng(1).normal(size=(B, N, C)) * 0.1,
                    dtype)
    call = pl.pallas_call(
        functools.partial(kernel, bc=bc),
        grid=(B // bc,),
        in_specs=[pl.BlockSpec((bc, N, F), lambda i: (i, 0, 0)),
                  pl.BlockSpec((bc, N, C), lambda i: (i, 0, 0))],
        out_specs=pl.BlockSpec((F, C), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((F, C), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
    )

    @jax.jit
    def run(s, d):
        return call(s, d)

    out = jax.block_until_ready(run(s, d))
    # correctness vs the full contraction
    ref = np.einsum("bnf,bnc->fc", np.asarray(s, np.float32),
                    np.asarray(d, np.float32))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=5e-2, atol=5e-1)

    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = run(s, d)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best * 1e3


def main():
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 197
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    B, C, F = 64, 384, 1536
    for bc in (4, 8, 16):
        row = {"bc": bc}
        for name, kern, n in [("perrow", _k_perrow, N),
                              ("batched", _k_batched, N),
                              ("batched8", _k_batched, ((N + 7) // 8) * 8)]:
            try:
                row[name] = round(bench(kern, B, bc, n, F, C, iters), 3)
            except Exception as e:  # noqa: BLE001 — report per-variant
                row[name] = f"ERR: {str(e)[:80]}"
        print(f"N={N} B={B} F={F} C={C} bc={bc}: {row}", flush=True)


if __name__ == "__main__":
    main()
