#!/usr/bin/env python
"""Host-decode thread scaling: measure, don't extrapolate (round-3 verdict
item 5).

The C++ data plane (native/vtx_data.cpp) claims to scale with host cores.
This container has ONE core, so aggregate throughput is physically capped —
but two things ARE measurable here and decide whether the path scales on a
real multi-core host:

1. **Aggregate throughput vs thread count.**  With a healthy lock-free path,
   N CPU-bound decode threads on 1 core time-slice fairly: aggregate img/s
   stays ~flat as threads rise and per-call latency grows ~linearly (calls
   overlap).  A global lock with convoying, or allocator serialization,
   shows up as aggregate DEGRADATION at higher thread counts.

2. **GIL release during the C call.**  A pure-Python spinner thread runs
   alongside N decode threads.  If the decode held the GIL, the spinner
   could only run between calls and its rate would collapse far below its
   fair share 1/(N+1); if ctypes releases the GIL (it should — the copy of
   the payload is the only GIL-held window), the OS scheduler gives the
   spinner ≈ its fair share of the core.  GIL-released decode threads are
   exactly what lets one Python process feed all cores of a real host.

Usage: python scripts/bench_host_scaling.py [--images 256] [--threads 1,2,4,8]

Reference stack being replaced: torch DataLoader worker processes
(reference factory.py:263-278).
"""

import argparse
import io
import os
import statistics
import sys
import threading
import time
from concurrent.futures import ThreadPoolExecutor

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vision_transformers_tpu.data import native  # noqa: E402


def build_payloads(n: int) -> list:
    """Synthetic JPEGs with realistic dims/quality (same recipe as
    bench_e2e_real.py's corpus)."""
    from PIL import Image

    rng = np.random.default_rng(0)
    payloads = []
    for _ in range(n):
        h = int(rng.integers(320, 520))
        w = int(rng.integers(320, 520))
        base = rng.integers(0, 255, (h // 8, w // 8, 3), np.uint8)
        arr = np.asarray(Image.fromarray(base).resize((w, h), Image.BILINEAR))
        buf = io.BytesIO()
        Image.fromarray(arr).save(buf, format="JPEG", quality=87)
        payloads.append(buf.getvalue())
    return payloads


def decode_one(payload, rng):
    dims = native.jpeg_dims(payload)
    w, h = dims
    cw = int(rng.integers(w // 2, w + 1))
    ch = int(rng.integers(h // 2, h + 1))
    x = int(rng.integers(0, w - cw + 1))
    y = int(rng.integers(0, h - ch + 1))
    t0 = time.perf_counter()
    out = native.decode_crop_resize(payload, (x, y, cw, ch), (224, 224))
    assert out is not None
    return time.perf_counter() - t0


def bench_threads(payloads, n_threads: int, rounds: int):
    lat = []
    lock = threading.Lock()
    work = payloads * rounds

    def worker(chunk, seed):
        rng = np.random.default_rng(seed)
        times = [decode_one(p, rng) for p in chunk]
        with lock:
            lat.extend(times)

    chunks = [work[i::n_threads] for i in range(n_threads)]
    t0 = time.perf_counter()
    with ThreadPoolExecutor(n_threads) as ex:
        list(ex.map(worker, chunks, range(n_threads)))
    wall = time.perf_counter() - t0
    return {
        "threads": n_threads,
        "aggregate_img_s": len(work) / wall,
        "mean_latency_ms": statistics.mean(lat) * 1e3,
        "p95_latency_ms": statistics.quantiles(lat, n=20)[-1] * 1e3,
    }


def gil_probe(payloads, n_decoders: int, seconds: float = 4.0):
    """Spinner rate alongside N decode threads vs alone.  Fair share on one
    core is 1/(n+1); a GIL-holding decode would starve the spinner far below
    that."""
    stop = threading.Event()
    count = [0]

    def spinner():
        c = 0
        while not stop.is_set():
            c += 1
        count[0] = c

    def decoder(seed):
        rng = np.random.default_rng(seed)
        i = 0
        while not stop.is_set():
            decode_one(payloads[i % len(payloads)], rng)
            i += 1

    # alone
    stop.clear()
    th = threading.Thread(target=spinner)
    th.start()
    time.sleep(seconds)
    stop.set()
    th.join()
    alone = count[0] / seconds

    # alongside decoders
    stop.clear()
    th = threading.Thread(target=spinner)
    dec = [threading.Thread(target=decoder, args=(s,))
           for s in range(n_decoders)]
    th.start()
    for d in dec:
        d.start()
    time.sleep(seconds)
    stop.set()
    th.join()
    for d in dec:
        d.join()
    with_dec = count[0] / seconds
    return {
        "decoders": n_decoders,
        "spinner_rate_alone": alone,
        "spinner_rate_with_decoders": with_dec,
        "observed_share": with_dec / alone,
        "fair_share": 1.0 / (n_decoders + 1),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", type=int, default=128)
    ap.add_argument("--threads", default="1,2,4,8")
    ap.add_argument("--rounds", type=int, default=2)
    args = ap.parse_args()
    assert native.available(), "native data plane unavailable"

    payloads = build_payloads(args.images)
    print(f"{len(payloads)} payloads, "
          f"{sum(map(len, payloads)) / 1e6:.1f} MB total", flush=True)

    for n in [int(x) for x in args.threads.split(",")]:
        r = bench_threads(payloads, n, args.rounds)
        print(f"threads={r['threads']}: {r['aggregate_img_s']:.1f} img/s "
              f"aggregate, latency mean {r['mean_latency_ms']:.1f} ms "
              f"p95 {r['p95_latency_ms']:.1f} ms", flush=True)

    for n in (1, 4):
        g = gil_probe(payloads, n)
        print(f"gil probe: {n} decoder(s): spinner share "
              f"{g['observed_share']:.2f} (fair {g['fair_share']:.2f}; "
              f"alone {g['spinner_rate_alone']:.2e}/s)", flush=True)


if __name__ == "__main__":
    main()
