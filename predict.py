#!/usr/bin/env python
"""Classify images from files — the serving-style entry point.

Runs the exact validation preprocessing (Resize(size+32, bicubic) +
CenterCrop, reference factory.py:217-224; native C++ decode path when built)
and one jitted forward, from any checkpoint evaluate.py accepts:

    python predict.py --conf configs/swin-transformer-s.conf \
        --checkpoint experiment/epoch-090 cat.jpg dog.jpg [--topk 5] \
        [--labels imagenet_classes.txt]

Prints one JSON line per image: {"file": ..., "topk": [{"class": i,
"prob": p, "label": name?}, ...]}.
"""

import argparse
import json
import os

import jax

if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import jax.numpy as jnp
import numpy as np


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    parser.add_argument("--conf", required=True)
    parser.add_argument("--checkpoint", required=True,
                        help="training dir, converted dir, or reference .pt[:key]")
    parser.add_argument("--topk", type=int, default=5)
    parser.add_argument("--labels", default=None,
                        help="text file with one class name per line")
    parser.add_argument("--size", type=int, default=0,
                        help="eval resolution (default: conf training.valid_size)")
    parser.add_argument("--no-ema", action="store_true")
    parser.add_argument("images", nargs="+",
                        help="image files to classify; key=value conf overrides "
                             "may be mixed in")
    args, extras = parser.parse_known_args()
    # argparse folds trailing key=value overrides into the positional list
    overrides = [a for a in args.images if "=" in a] + \
                [o for o in extras if "=" in o]
    images = [a for a in args.images if "=" not in a]
    if not images:
        parser.error("no image files given")

    from vision_transformers_tpu.config.schema import load_config
    from vision_transformers_tpu.data import ops
    from vision_transformers_tpu.data.pipeline import decode_valid
    from vision_transformers_tpu.utils.torch_convert import load_eval_variables

    conf = load_config(args.conf, overrides)
    size = args.size or conf.training.valid_size

    model = conf.arch.make()  # f32 weights; inference stays full precision
    variables = load_eval_variables(args.checkpoint, conf.arch,
                                    use_ema=not args.no_ema)
    variables = jax.tree.map(jnp.asarray, variables)

    labels = None
    if args.labels:
        with open(args.labels) as f:
            labels = [line.strip() for line in f]

    batch = np.stack([
        decode_valid(open(p, "rb").read(), size) for p in images
    ])

    from vision_transformers_tpu import ops as kernel_ops

    @jax.jit
    def forward(x):
        # inference-only → layer1 kernel dispatch (PERF.md round 4)
        with kernel_ops.forward_only():
            logits = model.apply(variables,
                                 ops.normalize(x.astype(jnp.float32)))
        return jax.nn.softmax(logits, axis=-1)

    probs = np.asarray(forward(jnp.asarray(batch)))
    top = np.argsort(-probs, axis=-1)[:, :args.topk]
    for path, idx, p in zip(images, top, probs):
        entry = {"file": path, "topk": [
            {"class": int(i), "prob": round(float(p[i]), 5),
             **({"label": labels[i]} if labels and i < len(labels) else {})}
            for i in idx
        ]}
        print(json.dumps(entry))


if __name__ == "__main__":
    main()
