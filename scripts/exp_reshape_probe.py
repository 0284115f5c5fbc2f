#!/usr/bin/env python
"""Mosaic feasibility probe for the batched-weight-grad layer1 backward:
does a TPU Pallas kernel support collapsing [bc, N, C] → [bc·N, C] (N not a
multiple of 8) on a VMEM value, followed by a single [C, bc·N]×[bc·N, F]
weight-grad dot?  Also probes writing per-row results into a VMEM scratch
ref inside a fori_loop and reading the whole scratch after the loop.

Usage: python scripts/exp_reshape_probe.py [N] (default 197)
"""

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, w_ref, out_ref, dw_ref, s_ref, *, bc, N, C, F):
    b = pl.program_id(0)

    @pl.when(b == 0)
    def _init():
        dw_ref[...] = jnp.zeros_like(dw_ref[...])

    # per-row loop writing into VMEM scratch
    def body(j, _):
        s_ref[j] = x_ref[j] * 2.0
        return _

    jax.lax.fori_loop(0, bc, body, 0)

    # collapse [bc, N, C] -> [bc*N, C] on a VMEM value (the probe's subject)
    x2 = s_ref[...].reshape(bc * N, C)
    dw_ref[...] += jax.lax.dot_general(
        x2, x2[:, :F], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    out_ref[...] = (x2 + 1.0).reshape(bc, N, C)


def main():
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 197
    B, bc, C, F = 8, 4, 384, 128
    x = jnp.asarray(np.random.default_rng(0).normal(size=(B, N, C)),
                    jnp.bfloat16)
    w = jnp.zeros((C, F), jnp.bfloat16)

    out, dw = pl.pallas_call(
        functools.partial(_kernel, bc=bc, N=N, C=C, F=F),
        grid=(B // bc,),
        in_specs=[pl.BlockSpec((bc, N, C), lambda i: (i, 0, 0)),
                  pl.BlockSpec((C, F), lambda i: (0, 0))],
        out_specs=[pl.BlockSpec((bc, N, C), lambda i: (i, 0, 0)),
                   pl.BlockSpec((C, F), lambda i: (0, 0))],
        out_shape=[jax.ShapeDtypeStruct((B, N, C), x.dtype),
                   jax.ShapeDtypeStruct((C, F), jnp.float32)],
        scratch_shapes=[pltpu.VMEM((bc, N, C), x.dtype)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
    )(x, w)
    out, dw = jax.block_until_ready((out, dw))

    # reference
    x2 = np.asarray(x, np.float32) * 2.0
    ref_out = x2 + 1.0
    flat = x2.reshape(B, N, C)
    ref_dw = sum(
        flat[g * bc:(g + 1) * bc].reshape(bc * N, C).T @
        flat[g * bc:(g + 1) * bc].reshape(bc * N, C)[:, :F]
        for g in range(B // bc))
    np.testing.assert_allclose(np.asarray(out, np.float32), ref_out,
                               rtol=2e-2, atol=2e-2)
    np.testing.assert_allclose(np.asarray(dw), ref_dw, rtol=2e-2, atol=1.0)
    print(f"OK: collapse reshape + scratch loop compile and match (N={N})")


if __name__ == "__main__":
    main()
