"""Tensor-parallel parameter sharding rules.

The reference is data-parallel only (SURVEY §2.3) — DP is what parity
requires — but the mesh carries an optional ``model`` axis and these rules
make it real: Megatron-style column/row sharding for the transformer
matmuls, expressed purely as ``NamedSharding`` on the parameter pytree.  The
XLA partitioner derives the activation layouts and inserts the all-reduces
over ICI; the train step itself is unchanged.

Rules (path-matched on flax param names):
- qkv / FF-in kernels  → column-parallel: shard the OUTPUT dim over ``model``
- attention-out / FF-out kernels → row-parallel: shard the INPUT dim
- their biases: column-parallel biases shard dim 0; row-parallel replicate
- everything else (norms, embeddings, classifier) replicated

Any parameter whose sharded dim is not divisible by the axis size falls back
to replication — correctness first, coverage grows with model size.
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import MODEL_AXIS

__all__ = ["param_shardings", "shard_params"]

_COLUMN_KERNELS = ("qkv", "weight", "fc1", "linear_q", "linear_kv", "mlp_0")
_ROW_KERNELS = ("fc2", "linear")


def _path_str(path) -> str:
    return "/".join(str(getattr(k, "key", k)) for k in path).lower()


def param_shardings(params: Any, mesh: Mesh):
    """Pytree of NamedShardings implementing the TP rules above."""
    n_model = mesh.shape[MODEL_AXIS]
    replicated = NamedSharding(mesh, P())

    def rule(path, x):
        if n_model <= 1 or x.ndim == 0:
            return replicated
        name = _path_str(path)
        parts = name.split("/")
        leaf = parts[-1]
        module = parts[-2] if len(parts) > 1 else ""

        def col_ok(axis):
            return x.shape[axis] % n_model == 0

        if leaf == "kernel" and x.ndim == 2:
            if any(module.startswith(m) for m in _COLUMN_KERNELS) and col_ok(1):
                return NamedSharding(mesh, P(None, MODEL_AXIS))
            if any(module.startswith(m) for m in _ROW_KERNELS) and col_ok(0):
                return NamedSharding(mesh, P(MODEL_AXIS, None))
        if leaf == "bias" and x.ndim == 1:
            if any(module.startswith(m) for m in _COLUMN_KERNELS) and col_ok(0):
                return NamedSharding(mesh, P(MODEL_AXIS))
        return replicated

    return jax.tree_util.tree_map_with_path(rule, params)


def shard_params(params: Any, mesh: Mesh):
    """device_put the param tree with TP shardings."""
    return jax.tree.map(jax.device_put, params, param_shardings(params, mesh))
