"""Bisect the Mosaic compile failure of the flat Benes out-perm store.

The flat (tb, m) out-perm write (conv_radix._kernel, round 5) groups the
permuted (W, Z) rows into G-row lane-concats + slice stores; at G=16 the
remote compiler returns HTTP 500 at m=65536.  This probe AOT-compiles the
out-perm pass alone for a ladder of G values and reports compile ok/fail
and (if ok) the differential-timer rate.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/perf_outperm_bisect.py [gsz ...]
"""
from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from perf_lanepack import time_fn  # noqa: E402


def main():
    import jax

    from rustfft_tpu.common import FftDirection
    from rustfft_tpu.config import enable_persistent_compilation_cache
    from rustfft_tpu.ops.raders import raders_tables
    from rustfft_tpu.ops.pallas import conv_radix

    enable_persistent_compilation_cache()
    print("device =", jax.devices()[0].device_kind, flush=True)
    rng = np.random.default_rng(0)
    d = FftDirection.FORWARD

    p = 65537
    m = p - 1
    batch = 511
    re = jax.device_put(
        (rng.standard_normal((batch, m)) * 1e-30).astype(np.float32)
    )
    im = jax.device_put(
        (rng.standard_normal((batch, m)) * 1e-30).astype(np.float32)
    )
    perm_in, inv_gather, b_fft = raders_tables(p, d)
    gszs = [int(a) for a in sys.argv[1:]] or [4, 1, 8]
    for gsz in gszs:
        conv_radix._OUTPERM_GSZ = gsz
        try:
            fn = conv_radix.make_radix_conv_fn(
                m, d, np.complex64, h=b_fft, in_perm=perm_in - 1,
                out_perm=inv_gather, conj_out=True,
            )
            t = time_fn(fn, re, im)
            print(f"  gsz={gsz:3d}: {t*1e3:8.3f} ms", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"  gsz={gsz:3d}: FAILED {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
