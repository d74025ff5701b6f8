"""Flat-view lanepack A/B: block (g*128, n) blocks vs flat (tb, 65536) rows.

Round-5 motivation: the shipped small-band rows sit at the block-aspect DMA
floor — 1024 at 619 GF/s is ~198 GB/s effective, the ~218 GB/s tiled-copy
class, while the ctwgx flat-view kernels measure 386-656 GB/s-eq (CLAUDE.md
round-5 DMA rule).  The flat lanepack variant packs 65536/n whole transforms
per row (free host-side reshape of the contiguous batch) and does the slot
relayout in VMEM; this tool measures block vs flat vs flat+aliased per size.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/perf_lpx.py [n ...]
"""
from __future__ import annotations

import math
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from perf_lanepack import time_fn  # noqa: E402

DEFAULT = [512, 1024, 2048, 4096]


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
        print(
            f"n={n} batch={batch} radices={lanepack.choose_radices(n)} "
            f"pack={lanepack.flat_pack(n)}",
            flush=True,
        )
        rows = [
            ("block        ", dict(variant="block")),
            ("flat         ", dict(variant="flat")),
            ("flat + alias ", dict(variant="flat", in_place=True)),
        ]
        for label, kw in rows:
            try:
                fn = lanepack.make_lanepack_fn(n, d, np.complex64, **kw)
                t = time_fn(fn, re, im)
                print(f"  {label}: {t*1e3:8.3f} ms  {gf(t):7.1f} GF/s",
                      flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"  {label}: FAILED {str(e)[:240]}", flush=True)


if __name__ == "__main__":
    main()
