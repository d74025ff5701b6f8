"""Round-5 A/B: narrow-layout radix kernel (ctwgn) vs shipping ctwg.

The round-5 DMA probes (tools/perf_narrow.py) found the radix kernel's
(batch*p, r*q) HBM view copies at ~220 GB/s while the SAME bytes described
as (batch*p*r, 128) copy at ~326, and aliased narrow copies reach the
full ~655 GB/s stream rate.  _fused_kernel_ctwgn re-describes the kernel
I/O in the narrow class.  This tool measures, same-run:

  per n in {32768, 65536, 131072, 262144}:
    ctwg (baseline) / ctwgn / ctwgn in_place, plus a tb sweep at 65536.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/perf_ctwgn.py [n...]
"""
from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from perf_lanepack import time_fn  # noqa: E402

BATCH_ELEMS = 512 * 65536  # keep total data constant across n


def main():
    import jax

    from rustfft_tpu.common import FftDirection
    from rustfft_tpu.config import enable_persistent_compilation_cache
    from rustfft_tpu.ops.pallas import fused

    enable_persistent_compilation_cache()
    print("device =", jax.devices()[0].device_kind, flush=True)
    rng = np.random.default_rng(0)

    sizes = [int(a) for a in sys.argv[1:]] or [65536, 32768, 131072, 262144]

    def row(label, fn, re, im, flops, nbytes):
        try:
            t = time_fn(fn, re, im)
            print(f"  {label:<34} {t*1e3:8.3f} ms  {flops/t/1e9:7.1f} GF/s"
                  f"  {nbytes/t/1e9:7.1f} GB/s-eq", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"  {label:<34} FAILED {str(e)[:140]}", flush=True)

    scale = 1e-30
    for n in sizes:
        b = max(8, BATCH_ELEMS // n)
        flops = 5.0 * n * np.log2(n) * b
        nbytes = 2 * 2 * 4 * n * b
        re = jax.device_put(
            (rng.standard_normal((b, n)) * scale).astype(np.float32))
        im = jax.device_put(
            (rng.standard_normal((b, n)) * scale).astype(np.float32))
        print(f"n = {n} (batch {b})", flush=True)
        for variant, in_place in (("ctwg", False), ("ctwgx", False),
                                  ("ctwgx", True)):
            fn = fused.make_fused_radix_fn(
                n, FftDirection.FORWARD, np.complex64,
                variant=variant, in_place=in_place)
            tag = f"{variant}{'+alias' if in_place else ''}"
            row(tag, fn, re, im, flops, nbytes)
        if n == 65536:
            fn = fused.make_fused_radix_fn(
                n, FftDirection.FORWARD, np.complex64,
                variant="ctwgx", batch_tile=16, in_place=True)
            row("ctwgx tb=16+alias", fn, re, im, flops, nbytes)


if __name__ == "__main__":
    main()
