"""Perf experiment: lanepack-conv (misaligned inner) vs aligned conv routes.

For each awkward size, compare the current planner route against Rader with
its natural inner m = p-1 (lanepack core) and Bluestein with the smallest
2^a*3^b inner (lanepack core where misaligned).

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/perf_conv2.py
Within-run comparison only (time-shared chip, CLAUDE.md).
"""
from __future__ import annotations

import math
import sys

import numpy as np

sys.path.insert(0, "/root/repo/tools")
from perf_lanepack import time_fn  # noqa: E402


def main():
    import jax

    from rustfft_tpu import FftDirection, FftPlanner, recipes
    from rustfft_tpu import executor
    from rustfft_tpu.ops.pallas import conv, lanepack

    rng = np.random.default_rng(0)
    d = FftDirection.FORWARD
    c64 = np.complex64
    print(f"device={jax.devices()[0]}", flush=True)

    cases = []
    # n=1009 (prime): plan (Bluestein 2048 aligned) vs Rader m=1008 lanepack
    cases.append((1009, [
        ("plan", lambda: FftPlanner().plan_fft_forward(1009).raw_fn),
        ("rader m=1008 lane", lambda: conv.make_raders_fn(1009, d, c64)),
        ("bluestein m=2048", lambda: conv.make_bluestein_fn(1009, 2048, d, c64)),
        ("bluestein m=2187 lane", lambda: conv.make_bluestein_fn(1009, 2187, d, c64)),
    ]))
    # n=1234 = 2*617: plan (whole Bluestein 3072) vs composite with Rader 617
    def build_1234_mr():
        from rustfft_tpu.planner import FftPlannerTpu
        pl_ = FftPlannerTpu()
        r616 = pl_.design_fft_for_len(616)
        rec = recipes.MixedRadix(recipes.Dft(2), recipes.Raders(r616))
        return executor.build(rec, d, c64)
    cases.append((1234, [
        ("plan", lambda: FftPlanner().plan_fft_forward(1234).raw_fn),
        ("mr 2 x rader617", build_1234_mr),
        ("bluestein m=2592 lane", lambda: conv.make_bluestein_fn(1234, 2592, d, c64)),
        ("bluestein m=3072", lambda: conv.make_bluestein_fn(1234, 3072, d, c64)),
    ]))
    # n=7919 (prime): plan (Bluestein 16384) vs Rader m=7918 lanepack
    cases.append((7919, [
        ("plan", lambda: FftPlanner().plan_fft_forward(7919).raw_fn),
        ("rader m=7918 lane", lambda: conv.make_raders_fn(7919, d, c64)),
    ]))

    for n, variants in cases:
        batch = max(512, 1 << (((1 << 25) // n).bit_length() - 1))
        re = jax.device_put((rng.standard_normal((batch, n)) * 1e-30).astype(np.float32))
        im = jax.device_put((rng.standard_normal((batch, n)) * 1e-30).astype(np.float32))
        gf = 5.0 * batch * n * math.log2(n) / 1e9
        for name, mk in variants:
            try:
                fn = mk()
                t = time_fn(fn, re, im)
            except Exception as e:  # noqa: BLE001
                print(f"n={n:>6} {name:<24} FAILED {type(e).__name__}: {e}"[:160], flush=True)
                continue
            print(f"n={n:>6} {name:<24} {t*1e3:8.3f} ms  {gf/t:8.1f} GF/s", flush=True)
        print(flush=True)


if __name__ == "__main__":
    main()
