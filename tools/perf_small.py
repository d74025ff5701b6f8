"""Per-size throughput rows for the 2..1024 band (BASELINE scenario 2).

The reference benches every size 2..1024 per backend
(benches/bench_check_scalar_2to1024.rs:56-70).  Compiling 1023 sizes on the
tunneled chip (~20-40s of remote AOT per Pallas shape; XLA chains a few s)
is impractical in one session, so the sweep covers a stratified set that
hits every routing class in the band:

  * every n in 2..32 (butterfly/Dft leaves)
  * pow2 to 1024, 3*2^k, 2^a*3^b, pow3/pow5/pow7 points
  * primes across the band (Rader/Bluestein/dense candidates)
  * the routing boundaries: pallas_min_n (512), lanepack entries

Per size, same-run: the ROUTED path (plan.raw_fn at current config), the
forced-XLA path, and the dense MXU kernel where supported — the three rows
that justify pallas_min_n / dense_max_n / dense_fallback_max_n.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/perf_small.py [n ...]
"""
from __future__ import annotations

import math
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from perf_lanepack import time_fn  # noqa: E402

SIZES = sorted(
    set(range(2, 33))
    | {48, 64, 96, 128, 192, 256, 384, 512, 768, 1024}  # 2^a*3^b ladder
    | {27, 81, 243, 729}            # pow3
    | {25, 125, 625}                # pow5
    | {49, 343}                     # pow7
    | {36, 100, 144, 360, 720, 1000}  # highly composite
    | {37, 67, 127, 251, 509, 521, 1009, 1021}  # primes
)


def main():
    import jax

    from rustfft_tpu import FftPlanner
    from rustfft_tpu.common import FftDirection
    from rustfft_tpu.config import config, enable_persistent_compilation_cache
    from rustfft_tpu import executor
    from rustfft_tpu.ops.pallas import dense

    enable_persistent_compilation_cache()
    print("device =", jax.devices()[0].device_kind, flush=True)
    rng = np.random.default_rng(0)
    d = FftDirection.FORWARD

    sizes = [int(a) for a in sys.argv[1:]] or SIZES
    print(f"{'n':>6} {'route':<12} {'routed':>9} {'xla':>9} {'dense':>9}  GF/s",
          flush=True)
    for n in sizes:
        batch = max(64, min(1 << 17, (1 << 25) // n))
        re = jax.device_put(
            (rng.standard_normal((batch, n)) * 1e-30).astype(np.float32)
        )
        im = jax.device_put(
            (rng.standard_normal((batch, n)) * 1e-30).astype(np.float32)
        )
        gf = lambda t: 5.0 * batch * n * max(1.0, math.log2(n)) / t / 1e9  # noqa: E731
        iters = max(8, min(512, (1 << 23) // max(1, batch * n // 16)))

        cols = {}
        plan = FftPlanner().plan_fft_forward(n)
        route = executor.pallas_route(n, np.complex64) or "xla"
        try:
            cols["routed"] = gf(time_fn(plan.raw_fn, re, im, iters=iters))
        except Exception as e:  # noqa: BLE001
            print(f"{n:>6} routed FAILED {str(e)[:200]}", flush=True)
        if route != "xla":
            config.use_pallas = "off"
            try:
                plan_x = FftPlanner().plan_fft_forward(n)
                cols["xla"] = gf(time_fn(plan_x.raw_fn, re, im, iters=iters))
            except Exception as e:  # noqa: BLE001
                print(f"{n:>6} xla FAILED {str(e)[:200]}", flush=True)
            finally:
                config.use_pallas = "auto"
        else:
            cols["xla"] = cols.get("routed", float("nan"))
        if dense.dense_supported(n, np.complex64):
            try:
                fn = dense.make_dense_fft_fn(n, d, np.complex64)
                cols["dense"] = gf(time_fn(fn, re, im, iters=iters))
            except Exception as e:  # noqa: BLE001
                print(f"{n:>6} dense FAILED {str(e)[:200]}", flush=True)

        def fmt(k):
            return f"{cols[k]:9.1f}" if k in cols else "        -"

        print(f"{n:>6} {route:<12} {fmt('routed')} {fmt('xla')} {fmt('dense')}",
              flush=True)


if __name__ == "__main__":
    main()
