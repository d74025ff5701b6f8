"""A/B the large two-kernel pipeline's 3D vs 2D HBM block descriptions.

Round-2 measured 2D block specs DMA ~25% faster than equivalent 3D blocks
(in isolated copy probes); round-5's flat-view wins (ctwgx, conv_radix)
renew the question for the large tier, whose band is DMA-co-bound.  Same
bytes, same grids, same kernels modulo the leading block dim.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/perf_large2d.py [n ...]
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

    from rustfft_tpu import FftDirection
    from rustfft_tpu.config import enable_persistent_compilation_cache
    from rustfft_tpu.ops.pallas import large

    enable_persistent_compilation_cache()
    print("device =", jax.devices()[0].device_kind, flush=True)
    rng = np.random.default_rng(0)
    d = FftDirection.FORWARD

    from rustfft_tpu.ops.pallas import large2f

    sizes = [int(a) for a in sys.argv[1:]] or [1 << 20, 1 << 21]
    for n in sizes:
        batch = max(2, (1 << 25) // n)
        re = jax.device_put(
            (rng.standard_normal((batch, n)) * 1e-30).astype(np.float32)
        )
        im = jax.device_put(
            (rng.standard_normal((batch, n)) * 1e-30).astype(np.float32)
        )
        gf = lambda t: 5.0 * batch * n * math.log2(n) / t / 1e9  # noqa: E731
        use_2f = large2f.large2f_supported(n, np.complex64)
        split = large2f.choose_split2f(n) if use_2f else large.choose_pqq(n)
        print(f"n={n} batch={batch} 2f={use_2f} split={split}", flush=True)
        for label, b2 in (("3d", False), ("2d", True)):
            try:
                if use_2f:
                    fn = large2f.make_large2f_fft_fn(
                        n, d, np.complex64, blocks2d=b2
                    )
                else:
                    fn = large.make_large_fft_fn(n, d, np.complex64, blocks2d=b2)
                t = time_fn(fn, re, im)
                print(f"  blocks {label}: {t*1e3:8.3f} ms  {gf(t):7.1f} GF/s",
                      flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"  blocks {label}: FAILED {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
