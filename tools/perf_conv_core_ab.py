"""A/B the conv cores at m = 32768 for the PRIME Bluestein path.

Round-5 moved config.conv_radix_min_m 65536 -> 32768 off bconv hole-band
measurements (tools/perf_blue_misaligned.py); this pins the same crossover
for the prime path the threshold also governs: n = 16381 (prime, smallest
aligned 2^a*3^b inner = 32768).

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/perf_conv_core_ab.py
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
    from rustfft_tpu.config import config, enable_persistent_compilation_cache
    from rustfft_tpu.ops.pallas import conv

    enable_persistent_compilation_cache()
    print("device =", jax.devices()[0].device_kind, flush=True)
    rng = np.random.default_rng(0)
    d = FftDirection.FORWARD

    n, m = 16381, 32768
    batch = (1 << 25) // n
    re = jax.device_put(
        (rng.standard_normal((batch, n)) * 1e-30).astype(np.float32)
    )
    im = jax.device_put(
        (rng.standard_normal((batch, n)) * 1e-30).astype(np.float32)
    )
    gf = lambda t: 5.0 * batch * n * math.log2(n) / t / 1e9  # noqa: E731
    print(f"n={n} (prime) m={m} batch={batch}", flush=True)

    for label, min_m in (("radix core", 32768), ("dense core", 65536)):
        old = config.conv_radix_min_m
        try:
            config.conv_radix_min_m = min_m
            fn = conv.make_bluestein_fn(n, m, d, np.complex64)
            t = time_fn(fn, re, im)
            print(f"  {label}: {t*1e3:8.3f} ms  {gf(t):7.1f} GF/s",
                  flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"  {label}: FAILED {str(e)[:200]}", flush=True)
        finally:
            config.conv_radix_min_m = old


if __name__ == "__main__":
    main()
