"""Lanepack group-size ladder (g = 128-transform groups per grid step).

Round-4 cat sweep (tools/perf_cat.py, hardware) showed a monotone g trend
at the small sizes — 512: g1 505 / g2 523 / g4 576, 1024: g1 567 / g2 589 /
g4 632 GF/s — but g4 LOST at 2048 (541 vs 604) and those rows predate the
floor-guarded timer.  This re-measures the ladder (g up to 8) per size in
one run to set the `group` default in make_lanepack_fn.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/perf_lpgroup.py [n ...]
"""
from __future__ import annotations

import math
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from perf_lanepack import time_fn  # noqa: E402

DEFAULT = [512, 1024, 2048, 3888, 4096]


def main():
    import jax

    from rustfft_tpu import FftDirection
    from rustfft_tpu.config import enable_persistent_compilation_cache
    from rustfft_tpu.ops.pallas import lanepack

    enable_persistent_compilation_cache()
    print("device =", jax.devices()[0].device_kind, flush=True)
    rng = np.random.default_rng(0)
    d = FftDirection.FORWARD

    sizes = [int(a) for a in sys.argv[1:]] or DEFAULT
    for n in sizes:
        batch = max(1024, min(1 << 17, (1 << 26) // n))
        re = jax.device_put(
            (rng.standard_normal((batch, n)) * 1e-30).astype(np.float32)
        )
        im = jax.device_put(
            (rng.standard_normal((batch, n)) * 1e-30).astype(np.float32)
        )
        gf = lambda t: 5.0 * batch * n * math.log2(n) / t / 1e9  # noqa: E731
        print(f"n={n} batch={batch} radices={lanepack.choose_radices(n)}",
              flush=True)
        for g in (1, 2, 4, 8):
            if g * 128 > batch:
                continue
            try:
                fn = lanepack.make_lanepack_fn(
                    n, d, np.complex64, group=g
                )
                t = time_fn(fn, re, im)
                print(f"  g={g}: {t*1e3:8.3f} ms  {gf(t):7.1f} GF/s",
                      flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"  g={g}: FAILED {str(e)[:240]}", flush=True)


if __name__ == "__main__":
    main()
