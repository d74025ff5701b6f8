"""large2f pass-1 block width (qt3) sweep + bconv kernel-B variant A/B.

The large2f band (2^22..2^25) achieves ~300 GB/s effective vs the 660
stream rate; pass 1's (1, p1, p2, qt3) blocks are p1*p2 runs of 4*qt3
bytes (2 KB at the default qt3=512).  Wider qt3 doubles the run length at
the cost of VMEM (the ~10-copy chain working set) — probe qt3=1024 under
a 112M scoped request.  Also A/Bs the bconv kernel-B fftq variant
("swap" vs "wlhs": wlhs has no moveaxis relayouts, and B_conv is
compute-bound unlike kernel B).

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/perf_large2f_qt3.py
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
    from rustfft_tpu.config import config, enable_persistent_compilation_cache
    from rustfft_tpu.ops.pallas import convlarge, large2f

    enable_persistent_compilation_cache()
    print("device =", jax.devices()[0].device_kind, flush=True)
    rng = np.random.default_rng(0)
    d = FftDirection.FORWARD

    for n in (1 << 22, 1 << 23):
        batch = max(1, (1 << 25) // n)
        re = jax.device_put(
            (rng.standard_normal((batch, n)) * 1e-30).astype(np.float32)
        )
        im = jax.device_put(
            (rng.standard_normal((batch, n)) * 1e-30).astype(np.float32)
        )
        gf = lambda t: 5.0 * batch * n * math.log2(n) / t / 1e9  # noqa: E731
        print(f"n={n} batch={batch} split={large2f.choose_split2f(n)}",
              flush=True)
        for label, qt3, vmem in (
            ("qt3= 512 ", None, None),
            ("qt3=1024 ", 1024, 112 * 2**20),
            ("qt3=2048 ", 2048, 128 * 2**20),
        ):
            old = config.pallas_vmem_limit
            try:
                if vmem:
                    config.pallas_vmem_limit = vmem
                fn = large2f.make_large2f_fft_fn(n, d, np.complex64, qt3=qt3)
                t = time_fn(fn, re, im)
                print(f"  {label}: {t*1e3:8.3f} ms  {gf(t):7.1f} GF/s",
                      flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"  {label}: FAILED {str(e)[:200]}", flush=True)
            finally:
                config.pallas_vmem_limit = old

    n = 746497
    m = 1572864
    batch = 44
    re = jax.device_put(
        (rng.standard_normal((batch, n)) * 1e-30).astype(np.float32)
    )
    im = jax.device_put(
        (rng.standard_normal((batch, n)) * 1e-30).astype(np.float32)
    )
    gf = lambda t: 5.0 * batch * n * math.log2(n) / t / 1e9  # noqa: E731
    print(f"n={n} m={m} batch={batch}", flush=True)
    for variant in ("swap", "wlhs"):
        try:
            fn = convlarge.make_bluestein_large_fn(
                n, m, d, np.complex64, variant=variant
            )
            t = time_fn(fn, re, im)
            print(f"  bconv {variant}: {t*1e3:8.3f} ms  {gf(t):7.1f} GF/s",
                  flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"  bconv {variant}: FAILED {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
