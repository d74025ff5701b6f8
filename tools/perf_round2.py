"""Consolidated round-2 perf experiment — ONE process so nothing races the
time-shared chip.  Compares, within a single run:

  band A (512..4096):   lanepack (default radices, g=1/2) vs XLA vs fused
  band B (16k..262k):   3-stage fused vs 2-stage fused (vs large at 128k+)
  in-place:             aliased square-split fused at 16k/64k

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/perf_round2.py
"""
from __future__ import annotations

import math
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from perf_lanepack import time_fn  # noqa: E402


def main():
    import jax

    from rustfft_tpu import FftDirection, FftPlanner
    from rustfft_tpu.config import config
    from rustfft_tpu.ops.pallas import fused, lanepack, large

    d = FftDirection.FORWARD
    rng = np.random.default_rng(0)

    def data(n, batch):
        re = jax.device_put((rng.standard_normal((batch, n)) * 1e-30).astype(np.float32))
        im = jax.device_put((rng.standard_normal((batch, n)) * 1e-30).astype(np.float32))
        return re, im

    def row(n, batch, name, thunk):
        gf = 5.0 * batch * n * math.log2(n) / 1e9
        try:
            t = thunk()
        except Exception as e:  # noqa: BLE001
            print(f"n={n:>7} {name:<34} FAILED {type(e).__name__}: {e}"[:150], flush=True)
            return None
        print(f"n={n:>7} {name:<34} {t*1e3:8.3f} ms  {gf/t:8.1f} GF/s", flush=True)
        return gf / t

    # ---- band A ----
    for n in (512, 1024, 2048, 3888, 4096):
        batch = max(128, 1 << (((1 << 26) // n).bit_length() - 1))
        re, im = data(n, batch)
        r = lanepack.choose_radices(n)
        row(n, batch, f"lane {r}", lambda: time_fn(
            lanepack.make_lanepack_fn(n, d, np.complex64), re, im))
        if n == 3888:
            for rr, g in (((243, 16), 2), ((486, 8), 1), ((324, 12), 1)):
                row(n, batch, f"lane {rr} g={g}", lambda rr=rr, g=g: time_fn(
                    lanepack.make_lanepack_fn(n, d, np.complex64, radices=rr, group=g),
                    re, im))
        config.use_pallas = "off"
        plan = FftPlanner().plan_fft_forward(n)
        row(n, batch, "xla", lambda: time_fn(plan.raw_fn, re, im))
        config.use_pallas = "auto"
        split = fused._choose_pq(n)
        if split and split[1] % 128 == 0:
            row(n, batch, f"fused {split}", lambda: time_fn(
                fused.make_fused_two_stage_fn(n, d, np.complex64), re, im))
        print(flush=True)

    # ---- band B ----
    for n in (16384, 65536, 131072, 262144):
        batch = max(8, (1 << 26) // n)
        re, im = data(n, batch)
        row(n, batch, f"2stage {fused._choose_pq(n)}", lambda: time_fn(
            fused.make_fused_two_stage_fn(n, d, np.complex64), re, im))
        if fused.three_stage_supported(n, np.complex64):
            row(n, batch, f"3stage {fused.choose_pqq_fused(n)}", lambda: time_fn(
                fused.make_fused_three_stage_fn(n, d, np.complex64), re, im))
        if n >= 131072 and large.large_supported(n, np.complex64):
            row(n, batch, f"large {large.choose_pqq(n)}", lambda: time_fn(
                large.make_large_fft_fn(n, d, np.complex64), re, im))
        p, q = fused._choose_pq(n)
        if p == q:
            row(n, batch, "2stage in_place", lambda: time_fn(
                fused.make_fused_two_stage_fn(n, d, np.complex64, in_place=True),
                re, im))
        print(flush=True)


if __name__ == "__main__":
    main()
