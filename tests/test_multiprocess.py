"""True multi-process semantics tests (2 processes × 2 CPU devices each).

Validates the multi-host data path the VERDICT flagged: per-process local
batches (reference per-rank ``batch // world_size`` split, factory.py:264),
global-array assembly via ``jax.make_array_from_process_local_data`` in
``parallel.mesh.shard_batch``, and the race-free orbax checkpoint overwrite
(``force=True``).  Runs ``jax.distributed`` over localhost — the same code
path a real multi-host v5e pod uses, minus the DCN.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r'''
import os, sys
pid, port, ckpt_dir = int(sys.argv[1]), sys.argv[2], sys.argv[3]
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                           num_processes=2, process_id=pid)
import jax.numpy as jnp
import numpy as np
from vision_transformers_tpu.parallel import mesh as meshlib

assert jax.process_count() == 2, jax.process_count()
assert jax.device_count() == 4 and jax.local_device_count() == 2
mesh = meshlib.make_mesh()

gb = 8
lb = meshlib.local_batch_size(gb, mesh)
assert lb == 4, lb

# local rows carry their global identity: process p holds rows p*lb..(p+1)*lb
local = (np.arange(pid * lb, (pid + 1) * lb, dtype=np.float32)[:, None]
         * np.ones((1, 3), np.float32))
batch = {"x": local, "label": np.arange(pid * lb, (pid + 1) * lb, dtype=np.int32)}
with mesh:
    gbatch = meshlib.shard_batch(mesh, batch)
    assert gbatch["x"].shape == (gb, 3), gbatch["x"].shape
    # a sharded-jit reduction sees every global row exactly once
    total = jax.jit(lambda b: jnp.sum(b["x"]) + jnp.sum(b["label"]))(gbatch)
    expect = float(np.arange(gb).sum() * 3 + np.arange(gb).sum())
    assert float(total) == expect, (float(total), expect)

    # checkpoint overwrite under multiple processes (the old process-0 rmtree
    # raced here); save twice to exercise force=True, then restore
    from vision_transformers_tpu.train import checkpoint as ckpt
    ckpt.save_checkpoint(ckpt_dir, {"step": 1, "v": [1.0, 2.0]})
    ckpt.save_checkpoint(ckpt_dir, {"step": 2, "v": [3.0, 4.0]})
    restored = ckpt.restore_checkpoint(ckpt_dir)
    assert int(restored["step"]) == 2, restored

    # DINO center EMA across processes: the reference's hand-written
    # dist.all_reduce (loss.py:144-151) is subsumed by the sharded-jit
    # global mean — each process contributes DISTINCT teacher rows and both
    # must see the center of the FULL global batch
    from vision_transformers_tpu.train import loss as L
    out_dim = 6
    t_local = (np.arange(pid * lb, (pid + 1) * lb, dtype=np.float32)[:, None]
               * np.arange(1, out_dim + 1, dtype=np.float32)[None, :])
    t_global = (np.arange(gb, dtype=np.float32)[:, None]
                * np.arange(1, out_dim + 1, dtype=np.float32)[None, :])
    t_sharded = meshlib.shard_batch(mesh, {"t": t_local})["t"]
    center = jax.jit(lambda c, t: L.update_center(c, t, momentum=0.9))(
        jnp.zeros((1, out_dim), jnp.float32), t_sharded)
    expect_center = 0.1 * t_global.mean(0, keepdims=True)
    np.testing.assert_allclose(np.asarray(center), expect_center, rtol=1e-6)

# preemption flag propagation: only process 1 receives the "signal".
# (a) blocking epoch-boundary collective: global view True on BOTH
# (b) lagging in-step poller: False while clean, then True on BOTH exactly
#     one poll after the flag is globally visible — the aligned-decision
#     property the collective checkpoint save depends on
from vision_transformers_tpu.utils import preempt
assert preempt.requested_global() is False
poll = preempt.make_global_poller()
assert poll() is False          # no pending result yet
assert poll() is False          # reads poll 1's all-clear
if pid == 1:
    preempt._EVENT.set()
assert preempt.requested_global() is True, "peer flag not visible"
assert poll() is False, "poller must lag: decision not yet aligned"
assert poll() is True, "lagging poller never saw the peer flag"

print(f"WORKER_OK {pid}")
'''


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_mesh_shard_batch_and_checkpoint(tmp_path):
    port = _free_port()
    env = dict(os.environ)
    env.update({
        "JAX_PLATFORMS": "cpu",
        "XLA_FLAGS": "--xla_force_host_platform_device_count=2",
        "PYTHONPATH": REPO + os.pathsep + env.get("PYTHONPATH", ""),
        # isolate from the test session's compilation cache settings
        "JAX_COMPILATION_CACHE_DIR": str(tmp_path / "jaxcache"),
    })
    ckpt_dir = str(tmp_path / "ckpt")
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", WORKER, str(i), str(port), ckpt_dir],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for i in (0, 1)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=240)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("multi-process workers timed out:\n" + "\n".join(outs))
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out}"
        assert f"WORKER_OK {i}" in out, out
