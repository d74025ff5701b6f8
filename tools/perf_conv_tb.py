"""Conv-kernel batch-tile retest on a clean run (r3 pending item).

Round-3's post-trim probe measured +8.7% at 1009 from doubling the conv
batch tile, but the chip was 2.4x degraded (noise band).  Retest on a
healthy run: dense conv kernel tb sweep at the small-prime sizes, plus the
radix conv core tb sweep at 65537's inner.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/perf_conv_tb.py
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

    from rustfft_tpu import FftDirection, FftPlanner, recipes
    from rustfft_tpu.config import config, enable_persistent_compilation_cache
    from rustfft_tpu.ops.pallas import conv

    enable_persistent_compilation_cache()
    print("device =", jax.devices()[0].device_kind, flush=True)
    rng = np.random.default_rng(0)
    d = FftDirection.FORWARD

    for n in (1009, 1234, 7919):
        batch = max(8, min(1 << 14, (1 << 25) // n))
        re = jax.device_put(
            (rng.standard_normal((batch, n)) * 1e-30).astype(np.float32)
        )
        im = jax.device_put(
            (rng.standard_normal((batch, n)) * 1e-30).astype(np.float32)
        )
        gf = lambda t: 5.0 * batch * n * math.log2(n) / t / 1e9  # noqa: E731
        plan = FftPlanner().plan_fft_forward(n)
        r = plan.recipe
        m = r.inner.length if hasattr(r, "inner") else None
        print(f"n={n} batch={batch} recipe={type(r).__name__} m={m}", flush=True)
        if not isinstance(r, recipes.Bluesteins):
            continue
        for tb in (None, 32, 64, 128, 256):
            try:
                fn = conv.make_bluestein_fn(n, m, d, np.complex64,
                                            batch_tile=tb)
                t = time_fn(fn, re, im)
                print(f"  tb={str(tb):<5}: {t*1e3:8.3f} ms  {gf(t):7.1f} GF/s",
                      flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"  tb={str(tb):<5}: FAILED {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
