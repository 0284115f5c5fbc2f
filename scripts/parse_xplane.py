#!/usr/bin/env python
"""Parse a raw ``vm.xplane.pb`` profiler trace into a per-HLO-op time
breakdown — no tensorboard_plugin_profile needed (its generated protos
crash against the installed protobuf; the raw XSpace parse below only
needs ``tensorflow.tsl``, which ships with jax's profiling deps).

Usage:
  python scripts/parse_xplane.py TRACE_DIR [STEPS] [TOP_N]

TRACE_DIR is what ``VTX_PROFILE=dir`` / ``scripts/profile_step.py`` wrote;
STEPS is how many train steps the trace captured (3 for both, the
default) — totals are divided by it.

Classification notes (learned the hard way, PERF.md round 3):
- the instruction OPCODE is the token before '(' AFTER the '=' — matching
  'custom-call' anywhere in the text also hits fusions whose OPERANDS are
  custom-call results and wildly overcounts kernels
- tuple-output ops (Pallas vjp kernels, multi-output fusions) print as
  '%name = (ty, ty, ...) opcode(...)' and need their own pattern
"""

import collections
import glob
import re
import sys


def main():
    path = sys.argv[1]
    steps = float(sys.argv[2]) if len(sys.argv) > 2 else 3.0
    top_n = int(sys.argv[3]) if len(sys.argv) > 3 else 25

    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    xp = glob.glob(path + "/**/*.xplane.pb", recursive=True)
    if not xp:
        raise SystemExit(f"no *.xplane.pb under {path}")
    xs = xplane_pb2.XSpace()
    with open(xp[0], "rb") as f:
        xs.ParseFromString(f.read())

    # single-output: '%n = ty{layout} opcode(...)'; tuple-output: the type
    # list itself nests parens (layouts like T(8,128)), so find the LAST
    # ') opcode(' instead of trying to balance them
    opcode_re = re.compile(r"=\s*\S+\s+([a-z][a-z0-9\-]*)\(")
    tuple_re = re.compile(r"\)[}\s]*\s([a-z][a-z0-9\-]*)\(")

    for plane in xs.planes:
        if "TPU" not in plane.name:
            continue
        names = {k: v.name for k, v in plane.event_metadata.items()}
        total = collections.Counter()
        count = collections.Counter()
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                n = names.get(ev.metadata_id, "?")
                total[n] += ev.duration_ps / 1e9  # ms
                count[n] += 1
        if not total:
            continue
        print(f"== {plane.name}: {sum(total.values()) / steps:.1f} ms/step "
              f"over 'XLA Ops'")
        cls = collections.Counter()
        for n, ms in total.items():
            if " = (" in n:
                matches = tuple_re.findall(n.split(" = ", 1)[1])
                op = (matches[0] + "(multi-out)") if matches else "?"
            else:
                m = opcode_re.search(n)
                op = m.group(1) if m else "?"
            if n.startswith("%attn") and "custom-call" in op:
                op = "custom-call(pallas)"
            cls[op] += ms
        for k, v in cls.most_common(14):
            print(f"  {k:<22} {v / steps:8.2f} ms/step")
        print(f"-- top {top_n} individual ops --")
        for n, ms in total.most_common(top_n):
            print(f"  {ms / steps:7.3f} ms x{count[n] // int(steps):<4} "
                  f"{n[:110]}")


if __name__ == "__main__":
    main()
