#!/usr/bin/env python
"""Full-length production-lr convergence-band run (see
tests/test_convergence_band.py for the method and the criterion).

Runs N seeds of the Swin AdamW-cycle and EfficientNetV2 RMSpropTF-exp_epoch
recipes at full production lr for --steps steps in BOTH frameworks (torch
reference vs this framework, identical init + corpus per seed) on CPU, and
prints the per-checkpoint band table as JSON for PERF.md.

Usage: python scripts/convergence_band.py [--steps 500] [--seeds 3]
       [--recipes swin,effnetv2]
"""

import argparse
import json
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=500)
    ap.add_argument("--seeds", type=int, default=3)
    ap.add_argument("--window", type=int, default=50)
    ap.add_argument("--recipes", default="swin,effnetv2")
    args = ap.parse_args()

    import test_convergence_band as cb

    out = {}
    for recipe in args.recipes.split(","):
        result = cb.run_recipe(recipe, args.steps,
                               seeds=tuple(range(args.seeds)))
        t_band = cb.band_stats(result["torch"], args.steps, args.window)
        j_band = cb.band_stats(result["ours"], args.steps, args.window)
        rows = []
        for c in t_band:
            gap = abs(t_band[c].mean() - j_band[c].mean())
            spread = max(t_band[c].std(ddof=1), j_band[c].std(ddof=1))
            rows.append({
                "step": c,
                "torch_mean": round(float(t_band[c].mean()), 4),
                "torch_std": round(float(t_band[c].std(ddof=1)), 4),
                "ours_mean": round(float(j_band[c].mean()), 4),
                "ours_std": round(float(j_band[c].std(ddof=1)), 4),
                "gap": round(float(gap), 4),
                "gap_over_spread": round(float(gap / max(spread, 1e-9)), 2),
            })
            print(f"{recipe} step {c}: torch {rows[-1]['torch_mean']}"
                  f"±{rows[-1]['torch_std']} ours {rows[-1]['ours_mean']}"
                  f"±{rows[-1]['ours_std']} gap {rows[-1]['gap']}",
                  flush=True)
        out[recipe] = {
            "steps": args.steps, "seeds": args.seeds,
            "window": args.window, "checkpoints": rows,
            "curves_torch": [[round(float(x), 4) for x in cv]
                             for cv in result["torch"]],
            "curves_ours": [[round(float(x), 4) for x in cv]
                            for cv in result["ours"]],
        }
    print(json.dumps({k: {kk: vv for kk, vv in v.items()
                          if not kk.startswith("curves")}
                      for k, v in out.items()}))
    with open("/tmp/convergence_band.json", "w") as f:
        json.dump(out, f)


if __name__ == "__main__":
    main()
