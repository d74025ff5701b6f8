"""Plot GFLOP/s across a size sweep — the p2comparison.py analogue.

The reference ships matplotlib comparison scripts over bench logs
(tools/p2comparison.py and friends); this one runs the sweep itself on the
live device and renders GFLOP/s by size class (pow2 / 2^a*3^b / primes).

Usage: PYTHONPATH=.:/root/.axon_site python tools/plot_bench.py [out.png]
"""
from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def timed(fn, args, iters=8, reps=3):
    import jax

    @jax.jit
    def many(x):
        return jax.lax.fori_loop(0, iters, lambda i, x: fn(x), x)[0].sum()

    float(many(args))
    best = None
    for _ in range(reps):
        t0 = time.perf_counter()
        float(many(args))
        t = (time.perf_counter() - t0) / iters
        best = t if best is None else min(best, t)
    return best


def main():
    import jax

    from rustfft_tpu import FftPlanner

    out_path = sys.argv[1] if len(sys.argv) > 1 else "bench_sweep.png"
    classes = {
        "pow2": [1 << k for k in range(10, 21, 2)],
        "2^a*3^b": [1152, 3888, 10368, 31104, 93312],
        "prime": [1009, 7919, 65537],
    }
    planner = FftPlanner()
    rng = np.random.default_rng(0)
    results = {}
    for label, sizes in classes.items():
        xs, ys = [], []
        for n in sizes:
            batch = max(1, (1 << 26) // n)
            re = jax.device_put(
                (rng.standard_normal((batch, n)) * 1e-30).astype(np.float32)
            )
            im = jax.device_put(
                (rng.standard_normal((batch, n)) * 1e-30).astype(np.float32)
            )
            t = timed(planner.plan_fft_forward(n).raw_fn, (re, im))
            gf = 5.0 * batch * n * math.log2(n) / t / 1e9
            print(f"{label:8} n={n:>8}: {gf:8.1f} GF/s")
            xs.append(n)
            ys.append(gf)
        results[label] = (xs, ys)

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(8, 5))
    for label, (xs, ys) in results.items():
        ax.plot(xs, ys, marker="o", label=label)
    ax.set_xscale("log", base=2)
    ax.set_xlabel("FFT size n")
    ax.set_ylabel("GFLOP/s (5 N log2 N)")
    ax.set_title(f"rustfft_tpu batched c64 throughput — {jax.devices()[0].device_kind}")
    ax.grid(True, alpha=0.3)
    ax.legend()
    fig.tight_layout()
    fig.savefig(out_path, dpi=120)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
