"""Measure planner-path choices: pallas_min_n and Bluestein inner size."""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def timed(fn, args, iters=8, reps=2):
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
    import math

    from rustfft_tpu import FftDirection, FftPlanner, config, recipes
    from rustfft_tpu.plan import FftPlan
    from rustfft_tpu import executor

    rng = np.random.default_rng(0)

    def measure(n, min_n, label, plan=None):
        config.pallas_min_n = min_n
        executor._CACHE.clear()
        if plan is None:
            planner = FftPlanner()
            planner.recipe_cache.clear()
            plan = planner.plan_fft_forward(n)
        batch = max(1, (1 << 25) // n)
        re = jax.device_put((rng.standard_normal((batch, n)) * 1e-30).astype(np.float32))
        im = jax.device_put((rng.standard_normal((batch, n)) * 1e-30).astype(np.float32))
        t = timed(plan.raw_fn, (re, im))
        gf = 5.0 * batch * n * math.log2(n) / t / 1e9
        print(f"n={n:>6} min_n={min_n:>5} {label:24}: {t*1e3:8.3f} ms {gf:8.1f} GF/s")
        return t

    for n in (2048, 3888, 1234, 1009):
        measure(n, 10**9, "xla")
        measure(n, 2048, "pallas>=2048")

    # Bluestein inner-size choice for 1234: 3072 (3*2^10) vs 4096 (pow2)
    config.pallas_min_n = 2048
    executor._CACHE.clear()
    planner = FftPlanner()
    inner4096 = planner.design_fft_for_len(4096)
    recipe = recipes.Bluesteins(1234, inner4096)
    plan = FftPlan(recipe, FftDirection.FORWARD, np.complex64)
    measure(1234, 2048, "bluestein inner=4096", plan=plan)


if __name__ == "__main__":
    main()
