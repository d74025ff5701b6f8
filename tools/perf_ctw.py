"""A/B of radix-kernel variants: default vs ctw vs ctwg (Gauss dots).

Within-run comparison only.  Run:
    PYTHONPATH=/root/repo:/root/.axon_site python tools/perf_ctw.py [n ...]
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
    from rustfft_tpu.ops.pallas import fused

    enable_persistent_compilation_cache()
    print("device =", jax.devices()[0].device_kind, flush=True)
    rng = np.random.default_rng(0)
    d = FftDirection.FORWARD

    sizes = [int(a) for a in sys.argv[1:]] or [32768, 65536, 131072, 262144]
    for n in sizes:
        batch = max(8, min(1 << 17, (1 << 26) // n))
        re = jax.device_put(
            (rng.standard_normal((batch, n)) * 1e-30).astype(np.float32)
        )
        im = jax.device_put(
            (rng.standard_normal((batch, n)) * 1e-30).astype(np.float32)
        )
        gf = lambda t: 5.0 * batch * n * math.log2(n) / t / 1e9  # noqa: E731
        print(f"n={n} batch={batch} rpq={fused.choose_rpq(n)} "
              f"pq={fused._choose_pq(n)}", flush=True)
        rows = []
        if fused.radix_supported(n, np.complex64):
            rows += [
                ("radix default x3s", "bf16x3s", "default", "radix"),
                ("radix ctw x3s", "bf16x3s", "ctw", "radix"),
                ("radix ctwg x3s", "bf16x3s", "ctwg", "radix"),
                ("radix ctwg x3", "bf16x3", "ctwg", "radix"),
            ]
        if fused.fused_supported(n, np.complex64):
            rows += [
                ("2stage default x3s", "bf16x3s", None, "two"),
                ("2stage gauss x3s", "bf16x3s", "gauss", "two"),
                ("2stage gauss x3", "bf16x3", "gauss", "two"),
            ]
        for label, prec, variant, fam in rows:
            try:
                if fam == "radix":
                    fn = fused.make_fused_radix_fn(
                        n, d, np.complex64, precision=prec, variant=variant
                    )
                else:
                    fn = fused.make_fused_two_stage_fn(
                        n, d, np.complex64, precision=prec, variant=variant
                    )
                t = time_fn(fn, re, im)
                print(f"  {label:<19}: {t*1e3:8.3f} ms  {gf(t):7.1f} GF/s",
                      flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"  {label:<19}: FAILED {str(e)[:300]}", flush=True)


if __name__ == "__main__":
    main()
