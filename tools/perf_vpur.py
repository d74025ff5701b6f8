"""Perf experiment: radix-r fused (MXU 128x128 + VPU radix chain) vs the
current champions per band (2-stage fused, large pipeline).

Run on the TPU host:
    PYTHONPATH=/root/repo:/root/.axon_site python tools/perf_vpur.py [n ...]
"""
from __future__ import annotations

import math
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from perf_lanepack import time_fn


def main():
    import jax

    from rustfft_tpu import FftDirection
    from rustfft_tpu.ops.pallas import fused, large

    sizes = [int(a) for a in sys.argv[1:]] or [32768, 65536, 131072, 262144, 524288]
    rng = np.random.default_rng(0)
    d = FftDirection.FORWARD

    for n in sizes:
        batch = max(8, (1 << 26) // n)
        re = jax.device_put((rng.standard_normal((batch, n)) * 1e-30).astype(np.float32))
        im = jax.device_put((rng.standard_normal((batch, n)) * 1e-30).astype(np.float32))
        gf = 5.0 * batch * n * math.log2(n) / 1e9

        rows = []
        if fused.radix_supported(n, np.complex64):
            sp = fused.choose_rpq(n)
            try:
                fn = fused.make_fused_radix_fn(n, d, np.complex64)
                rows.append((f"vpur {sp}", time_fn(fn, re, im)))
            except Exception as e:  # noqa: BLE001
                rows.append((f"vpur {sp} FAILED {type(e).__name__}: {e}"[:110], float("inf")))
        if fused.fused_supported(n, np.complex64):
            fn = fused.make_fused_two_stage_fn(n, d, np.complex64)
            rows.append((f"2stage {fused._choose_pq(n)}", time_fn(fn, re, im)))
        if large.large_supported(n, np.complex64):
            fn = large.make_large_fft_fn(n, d, np.complex64)
            rows.append((f"large {large.choose_pqq(n)}", time_fn(fn, re, im)))

        for name, t in rows:
            print(f"n={n:>7} {name:<36} {t*1e3:8.3f} ms  {gf/t:8.1f} GF/s", flush=True)
        print()


if __name__ == "__main__":
    main()
