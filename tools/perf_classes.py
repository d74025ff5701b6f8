"""Size-class perf sweep: every class the reference benches
(benches/bench_rustfft.rs:43-105) gets a measured TPU number + its route.

Classes: sub-512 band (XLA path, below pallas_min_n), pow5, pow7,
prime-powers of 3, the reference's largest benched prime 746497, plus a
few controls from the headline sweep for cross-run anchoring.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/perf_classes.py
"""
from __future__ import annotations

import math
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from perf_lanepack import time_fn  # noqa: E402

SIZES = [
    # sub-512 band (XLA dense-DFT / recipe path)
    (64, "pow2 sub-512"),
    (128, "pow2 sub-512"),
    (256, "pow2 sub-512"),
    (512, "pow2 small"),
    # powers of 5 / 7 (bench_rustfft.rs:57-66)
    (3125, "5^5"),
    (15625, "5^6"),
    (2401, "7^4"),
    (16807, "7^5"),
    # prime powers of 3
    (729, "3^6"),
    (2187, "3^7"),
    (59049, "3^10"),
    # primes incl. the reference's largest benched prime
    (746497, "prime (Rader inner 2^10*3^6)"),
    # anchors
    (1024, "anchor"),
    (65536, "anchor"),
]


def main():
    import jax

    from rustfft_tpu import FftPlanner, executor
    from rustfft_tpu.config import enable_persistent_compilation_cache

    enable_persistent_compilation_cache()
    rng = np.random.default_rng(0)
    planner = FftPlanner()

    print(f"{'n':>8} {'class':<28} {'route':<12} {'ms/fft':>9} {'GF/s':>8}",
          flush=True)
    for n, label in SIZES:
        batch = max(4, min(1 << 16, (1 << 26) // n))
        re = jax.device_put(
            (rng.standard_normal((batch, n)) * 1e-30).astype(np.float32)
        )
        im = jax.device_put(
            (rng.standard_normal((batch, n)) * 1e-30).astype(np.float32)
        )
        plan = planner.plan_fft_forward(n)
        route = executor.pallas_route(n, np.complex64) or "xla"
        # tiny sizes finish under the dispatch-overhead floor at 8 iters;
        # scale the chain length so each measurement is >= ~2ms of work
        iters = max(8, min(512, (1 << 24) // (batch * n // 16)))
        try:
            t = time_fn(plan.raw_fn, re, im, iters=iters)
        except Exception as e:  # noqa: BLE001
            print(f"{n:>8} {label:<28} {route:<12} FAILED {e}"[:140], flush=True)
            continue
        gf = 5.0 * batch * n * math.log2(n) / t / 1e9
        print(
            f"{n:>8} {label:<28} {route:<12} {t*1e3:9.3f} {gf:8.1f}",
            flush=True,
        )


if __name__ == "__main__":
    main()
