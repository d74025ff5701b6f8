"""Perf experiment: lanepack (batch-in-lanes) kernel vs fused kernel vs XLA.

Run on the TPU host:
    PYTHONPATH=/root/repo:/root/.axon_site python tools/perf_lanepack.py [n ...]

Within-run comparison only (the chip is time-shared; CLAUDE.md).
"""
from __future__ import annotations

import math
import sys
import time

import numpy as np


def time_fn(fn, re, im, iters=8, rounds=3):
    """Per-call time for fn via two-point differential timing.

    The tunneled runtime carries a ~25 ms dispatch+readback RTT per call and
    no reliable sync, so short chains are RTT-noise dominated (round-4 bench:
    1009 measured 780% of roofline on one run, NaN on the next).  The chain
    length is a RUNTIME scalar (dynamic fori_loop trip count — one compile
    for every k); timing two lengths k1 < k2 and taking
    (t(k2)-t(k1))/(k2-k1) cancels the RTT exactly.  `iters` is kept as a
    starting hint for dk.  Returns NaN only if the differential lands under
    the physical HBM floor (one read + one write of the f32 pair at
    1.1 TB/s) after escalating dk — bogus rows stay visible.
    """
    import jax
    import jax.numpy as jnp

    floor_s = 16.0 * re.size / 1.1e12

    @jax.jit
    def many(x, k):
        x = jax.lax.fori_loop(0, k, lambda i, x: fn(x), x)
        return x[0].sum() + x[1].sum()

    def run(x, k):
        return float(many(x, jnp.asarray(k, jnp.int32)))

    x = (re, im)
    k1 = 4
    run(x, k1)  # compile + warm
    t0 = time.perf_counter()
    run(x, k1)
    per_hint = (time.perf_counter() - t0) / k1  # overestimate (includes RTT)
    target_s, max_k = 0.25, 4096
    dk = max(8, iters)
    t_per = float("nan")
    for _ in range(4):
        while dk < max_k and per_hint * dk < target_s:
            dk *= 2
        t1s, t2s = [], []
        for _ in range(rounds):
            t0 = time.perf_counter()
            run(x, k1)
            t1s.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            run(x, k1 + dk)
            t2s.append(time.perf_counter() - t0)
        t_per = (min(t2s) - min(t1s)) / dk
        per_hint = max(t_per, 1e-7)
        if t_per >= floor_s and t_per * dk >= 0.25 * target_s:
            return max(t_per, 1e-9)
        if dk >= max_k:
            break
        dk = min(max_k, dk * 4)
    if t_per < floor_s:
        return float("nan")
    return max(t_per, 1e-9)


def main():
    import jax

    from rustfft_tpu import FftDirection, FftPlanner
    from rustfft_tpu.config import config
    from rustfft_tpu.ops.pallas import fused, lanepack

    sizes = [int(a) for a in sys.argv[1:]] or [1024, 2048, 3888, 4096, 7776]
    rng = np.random.default_rng(0)
    d = FftDirection.FORWARD

    for n in sizes:
        batch = max(128, 1 << (((1 << 26) // n).bit_length() - 1))  # ~64M points, pow2 batch
        re = jax.device_put((rng.standard_normal((batch, n)) * 1e-30).astype(np.float32))
        im = jax.device_put((rng.standard_normal((batch, n)) * 1e-30).astype(np.float32))
        gf = 5.0 * batch * n * math.log2(n) / 1e9

        def row(name, thunk):
            try:
                t = thunk()
            except Exception as e:  # noqa: BLE001
                print(f"n={n:>6} {name:<28} FAILED {type(e).__name__}: {e}"[:140],
                      flush=True)
                return
            print(f"n={n:>6} {name:<28} {t*1e3:8.3f} ms  {gf/t:8.1f} GF/s",
                  flush=True)

        # lanepack at group 1, 2 (the experiment) first
        if lanepack.lanepack_supported(n, np.complex64):
            for g in (1, 2):
                row(f"lane g={g}", lambda g=g: time_fn(
                    lanepack.make_lanepack_fn(n, d, np.complex64, group=g), re, im))
            for radices in ({1024: [(32, 32), (128, 8), (64, 16), (256, 4)],
                             2048: [(128, 16), (256, 8), (64, 32)],
                             3888: [(48, 81), (243, 16), (162, 24), (16, 243)],
                             512: [(64, 8), (128, 4), (32, 16)],
                             4096: [(64, 64), (128, 32), (256, 16)]}.get(n) or []):
                row(f"lane r={radices}", lambda radices=radices: time_fn(
                    lanepack.make_lanepack_fn(n, d, np.complex64, radices=radices),
                    re, im))

        # XLA planner path
        config.use_pallas = "off"
        plan = FftPlanner().plan_fft_forward(n)
        row("xla", lambda: time_fn(plan.raw_fn, re, im))
        config.use_pallas = "auto"

        # fused two-stage: skip misaligned splits (q % 128), which are known
        # to wedge/500 the remote Mosaic compile (CLAUDE.md)
        split = fused._choose_pq(n)
        if split and split[1] % 128 == 0:
            row(f"fused {split}", lambda: time_fn(
                fused.make_fused_two_stage_fn(n, d, np.complex64), re, im))
        print()


if __name__ == "__main__":
    main()
