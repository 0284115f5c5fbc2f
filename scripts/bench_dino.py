#!/usr/bin/env python
"""DINO DeiT-S/16 full distillation step throughput (images/sec/chip).

2×224² global + 8×96² local crops per image; the step includes teacher fwd,
student fwd on all crops, DINO loss + center EMA, AdamW + clip, teacher EMA
(reference train_dino.py:218-286).  The no-arg default batch is 192/chip —
the measured throughput peak of the round-4 batch sweep (869.8 img/s/chip at
192; 853 at 128, 790.9 at 256).  NOTE: 192/chip is a v5e-sized working set
(≈6× the activation memory and compile time of the early-round default);
on smaller-HBM devices or CPU smoke runs pass an explicit small batch —
``python scripts/bench_dino.py 32`` remains the safe small-device value.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def measure(batch, extra_overrides=()):
    """Full DINO distillation-step throughput at ``batch``/chip; returns the
    result dict (also used by the repo-root bench.py for its ``extra``)."""
    from vision_transformers_tpu.config.schema import load_config

    conf = load_config(
        os.path.join(os.path.dirname(__file__), "..", "configs",
                     "dino_deit-s-16.conf"),
        overrides=[
            "training.epoch=1", f"training.dataloader.batch_size={batch}",
            "data_backend=synthetic", "dataset_path=/none",
            "checker.storage=[]",
            *extra_overrides,  # extra key=value overrides for ablations
        ])
    # time the jitted step directly (same pattern as train_dino)
    from vision_transformers_tpu.parallel import mesh as meshlib
    from vision_transformers_tpu.train import dino as D

    # monkeypatch-free: reuse train_dino's internals by running one epoch of
    # the real driver with a step counter around the loop would include host
    # time; instead time the step via the driver's own jit by constructing
    # the same shapes here.
    task, training = conf.task, conf.training
    import vision_transformers_tpu.train.loss as L
    from vision_transformers_tpu.train.optim import make_optimizer
    from vision_transformers_tpu.train.schedule import cosine_schedule, make_schedule
    from vision_transformers_tpu.data.dino import make_dino_device_augment

    mesh = meshlib.make_mesh()
    dtype = jnp.bfloat16
    student_model = conf.arch.make(dtype=dtype, drop_path=task.student_drop_path)
    teacher_model = conf.arch.make(dtype=dtype, drop_path=0.0)
    n_crop = task.n_local_crop + 2
    rng = jax.random.PRNGKey(0)

    with mesh:
        g = jnp.zeros((2, task.global_crop_size, task.global_crop_size, 3))
        l = jnp.zeros((2, task.local_crop_size, task.local_crop_size, 3))
        variables = student_model.init(rng, [g, g] + [l] * task.n_local_crop)
        student = variables["params"]
        teacher = jax.tree.map(jnp.copy, student)
        lr_schedule = make_schedule(training, 100)
        wd_table = jnp.asarray(cosine_schedule(
            training.weight_decay, task.weight_decay_end, 100), jnp.float32)
        tx = make_optimizer(training, student, lr_schedule,
                            weight_decay=lambda c: wd_table[jnp.minimum(c, 99)])
        from vision_transformers_tpu.train.dino import DINOTrainState, _last_layer_mask
        state = DINOTrainState(
            step=jnp.zeros((), jnp.int32), student=student, teacher=teacher,
            opt_state=tx.init(student),
            center=jnp.zeros((1, conf.arch.dim_head_out), jnp.float32))
        state = jax.device_put(state, meshlib.replicated(mesh))
        last_mask = _last_layer_mask(student)

        def train_step(state, crops, rng, teacher_temp, momentum, freeze):
            rng = jax.random.fold_in(rng, state.step)
            teacher_out = teacher_model.apply(
                {"params": state.teacher}, [crops[0], crops[1]],
                deterministic=True).astype(jnp.float32)

            def loss_fn(params):
                student_out = student_model.apply(
                    {"params": params}, list(crops), deterministic=False,
                    rngs={"dropout": rng})
                return L.dino_loss(student_out, teacher_out, state.center,
                                   teacher_temp, n_crop)

            loss, grads = jax.value_and_grad(loss_fn)(state.student)
            grads = jax.tree.map(
                lambda g_, m: g_ * jnp.where(m & (freeze > 0), 0.0, 1.0),
                grads, last_mask)
            updates, opt_state = tx.update(grads, state.opt_state, state.student)
            import optax
            new_student = optax.apply_updates(state.student, updates)
            new_teacher = jax.tree.map(
                lambda t, s: t * momentum + s.astype(t.dtype) * (1 - momentum),
                state.teacher, new_student)
            new_center = L.update_center(state.center, teacher_out, momentum=0.9)
            return state.replace(step=state.step + 1, student=new_student,
                                 teacher=new_teacher, opt_state=opt_state,
                                 center=new_center), loss

        step_jit = jax.jit(train_step, donate_argnums=(0,))
        augment = make_dino_device_augment(task.n_local_crop)

        rng_np = np.random.default_rng(0)
        g_u8 = rng_np.integers(0, 256, (2, batch, 224, 224, 3), dtype=np.uint8)
        l_u8 = rng_np.integers(0, 256, (task.n_local_crop, batch, 96, 96, 3),
                               dtype=np.uint8)
        crops = augment(jax.random.PRNGKey(1), jnp.asarray(g_u8), jnp.asarray(l_u8))
        crops = [meshlib.shard_batch(mesh, c) for c in crops]

        args = (jnp.float32(0.04), jnp.float32(0.996), jnp.float32(1.0))
        state, loss = step_jit(state, crops, rng, *args)
        _ = float(loss)

        trivial = jax.jit(lambda a: a + 1)
        z = trivial(jnp.zeros(())); _ = float(z)
        t0 = time.perf_counter(); _ = float(trivial(z))
        rt = time.perf_counter() - t0

        n_iter = 20
        best = float("inf")
        for _w in range(3):
            t0 = time.perf_counter()
            for _ in range(n_iter):
                state, loss = step_jit(state, crops, rng, *args)
            _ = float(loss)
            best = min(best, time.perf_counter() - t0 - rt)
        ips = batch * n_iter / best
        result = {"dino_batch_per_chip": batch,
                  "ms_per_step": round(best / n_iter * 1000, 2),
                  "img_per_sec_per_chip": round(ips, 1)}

        if os.environ.get("VTX_PROFILE"):
            outdir = os.environ["VTX_PROFILE"]
            os.system(f"rm -rf {outdir}")
            with jax.profiler.trace(outdir):
                for _ in range(3):
                    state, loss = step_jit(state, crops, rng, *args)
                _ = float(loss)
            print("profile written to", outdir)
    return result


def main():
    # default = the measured throughput peak (PERF.md round 4); pass an
    # explicit batch (e.g. 32) for small devices / smoke runs
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 192
    print(json.dumps(measure(batch, sys.argv[2:])))


if __name__ == "__main__":
    main()
