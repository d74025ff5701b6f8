"""Perf experiment: 1k..8k band — mirrored two-stage splits (p=128, small q)
with the in-kernel transpose (2 HBM passes) vs the current routes (lanepack
or (small p, q=128) + XLA transpose = 3 passes).

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/perf_midband.py
"""
from __future__ import annotations

import math
import sys

import numpy as np

sys.path.insert(0, "/root/repo/tools")
from perf_lanepack import time_fn  # noqa: E402


def main():
    import jax

    from rustfft_tpu import FftDirection, FftPlanner
    from rustfft_tpu.ops.pallas import fused, lanepack

    rng = np.random.default_rng(0)
    d = FftDirection.FORWARD
    c64 = np.complex64
    print(f"device={jax.devices()[0]}", flush=True)

    cases = {
        4096: [("fused (128,32)", lambda: fused.make_fused_two_stage_fn(4096, d, c64, split=(128, 32))),
               ("fused (256,16)", lambda: fused.make_fused_two_stage_fn(4096, d, c64, split=(256, 16))),
               ("lanepack", lambda: lanepack.make_lanepack_fn(4096, d, c64))],
        2048: [("fused (128,16)", lambda: fused.make_fused_two_stage_fn(2048, d, c64, split=(128, 16)))],
        8192: [("fused (128,64)", lambda: fused.make_fused_two_stage_fn(8192, d, c64, split=(128, 64))),
               ("fused (256,32)", lambda: fused.make_fused_two_stage_fn(8192, d, c64, split=(256, 32)))],
    }
    for n, variants in cases.items():
        batch = (1 << 26) // n
        re = jax.device_put((rng.standard_normal((batch, n)) * 1e-30).astype(np.float32))
        im = jax.device_put((rng.standard_normal((batch, n)) * 1e-30).astype(np.float32))
        gf = 5.0 * batch * n * math.log2(n) / 1e9

        plan = FftPlanner().plan_fft_forward(n)
        variants = [("plan (current)", lambda p=plan: p.raw_fn)] + variants
        for name, mk in variants:
            try:
                fn = mk()
                t = time_fn(fn, re, im)
            except Exception as e:  # noqa: BLE001
                print(f"n={n:>6} {name:<22} FAILED {type(e).__name__}: {e}"[:140], flush=True)
                continue
            print(f"n={n:>6} {name:<22} {t*1e3:8.3f} ms  {gf/t:8.1f} GF/s", flush=True)
        print(flush=True)


if __name__ == "__main__":
    main()
