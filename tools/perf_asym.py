"""Asymmetric two-stage splits vs the radix kernel in the one-pass band.

The DMA lane ladder (tools/perf_dma3.py) measured block streaming at
~535 GB/s with 512-lane blocks vs ~222-320 GB/s at the 128/256-lane
shapes the square two-stage splits use.  The radix kernel already rides
r*q = 512 input lanes; this sweep asks whether an asymmetric two-stage
split (p, q) with q = 512 lanes on input — (128, 512): stage A K=256,
stage B K=1024, out lanes p=128 — can beat both the square split and
the radix kernel at 65536..262144.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/perf_asym.py [n ...]
"""
from __future__ import annotations

import math
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from perf_lanepack import time_fn  # noqa: E402

SPLITS = {
    65536: [(128, 512), (512, 128), (256, 256)],
    131072: [(256, 512), (512, 256)],
    262144: [(512, 512), (256, 1024), (1024, 256)],
}


def main():
    import jax

    from rustfft_tpu import FftDirection
    from rustfft_tpu.config import config, enable_persistent_compilation_cache
    from rustfft_tpu.ops.pallas import fused

    enable_persistent_compilation_cache()
    print("device =", jax.devices()[0].device_kind, flush=True)
    rng = np.random.default_rng(0)
    d = FftDirection.FORWARD

    sizes = [int(a) for a in sys.argv[1:]] or sorted(SPLITS)
    for n in sizes:
        batch = max(8, (1 << 26) // n)
        re = jax.device_put(
            (rng.standard_normal((batch, n)) * 1e-30).astype(np.float32)
        )
        im = jax.device_put(
            (rng.standard_normal((batch, n)) * 1e-30).astype(np.float32)
        )
        gf = lambda t: 5.0 * batch * n * math.log2(n) / t / 1e9  # noqa: E731
        print(f"n={n} batch={batch}", flush=True)

        # accuracy pin for the first asymmetric split on hardware
        p0, q0 = SPLITS[n][0]
        try:
            fn = fused.make_fused_two_stage_fn(n, d, np.complex64, split=(p0, q0))
            xs = (rng.standard_normal((2, n)) + 1j * rng.standard_normal((2, n))).astype(np.complex64)
            o_r, o_i = fn((xs.real.astype(np.float32), xs.imag.astype(np.float32)))
            out = np.asarray(o_r) + 1j * np.asarray(o_i)
            ref = np.fft.fft(xs.astype(np.complex128), axis=-1)
            rel = np.mean(np.abs(out - ref)) / np.mean(np.abs(ref))
            print(f"  two-stage {p0}x{q0} rel err = {rel:.3e}", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"  two-stage {p0}x{q0} accuracy FAILED {str(e)[:200]}",
                  flush=True)

        for p, q in SPLITS[n]:
            try:
                fn = fused.make_fused_two_stage_fn(
                    n, d, np.complex64, split=(p, q)
                )
                t = time_fn(fn, re, im)
                print(f"  two-stage ({p:>4},{q:>4}): {t*1e3:8.3f} ms "
                      f"{gf(t):8.1f} GF/s", flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"  two-stage ({p:>4},{q:>4}): FAILED {str(e)[:200]}",
                      flush=True)

        if fused.radix_supported(n, np.complex64):
            try:
                fn = fused.make_fused_radix_fn(n, d, np.complex64)
                t = time_fn(fn, re, im)
                r, p, q = fused.choose_rpq(n)
                print(f"  radix r={r:<2} (incumbent): {t*1e3:8.3f} ms "
                      f"{gf(t):8.1f} GF/s", flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"  radix FAILED {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
