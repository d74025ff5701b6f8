"""Perf experiment: radix-r fused kernel with 64x64 MXU stages (K=128) for
the 4k..16k band, vs the current two-stage routes (K=256 but 2x the flops).

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/perf_radix64.py
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
    from rustfft_tpu.ops.pallas import fused

    rng = np.random.default_rng(0)
    d = FftDirection.FORWARD
    c64 = np.complex64
    print(f"device={jax.devices()[0]}", flush=True)

    cases = {
        16384: [(4, 64, 64)],
        8192: [(2, 64, 64)],
        32768: [(8, 64, 64)],
        4096: [(4, 32, 32)],
    }
    for n, splits in cases.items():
        batch = (1 << 26) // n
        re = jax.device_put((rng.standard_normal((batch, n)) * 1e-30).astype(np.float32))
        im = jax.device_put((rng.standard_normal((batch, n)) * 1e-30).astype(np.float32))
        gf = 5.0 * batch * n * math.log2(n) / 1e9

        plan = FftPlanner().plan_fft_forward(n)
        variants = [("plan (current)", lambda p=plan: p.raw_fn)] + [
            (f"radix {s}", lambda s=s: fused.make_fused_radix_fn(n, d, c64, split=s))
            for s in splits
        ]
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
