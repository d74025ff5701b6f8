"""Fused 3-kernel Bluestein convolution (convlarge.py) vs the glued route.

Targets the huge-prime class: n = 746497 (the reference's largest benched
prime, bench_rustfft.rs:43-105) with inner m = 1572864 = 3*2^19 on the
large two-kernel tier.  Compares, same-run:
  * fused   — convlarge.make_bluestein_large_fn (A, B_conv, A2)
  * glued   — op_bluestein around large.make_large_fft_fn (2 full FFTs +
              XLA chirp/H passes, ~16 traversals of m)
plus an accuracy spot check of the fused route on hardware.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/perf_bconv.py [n ...]
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
    from rustfft_tpu.ops import bluestein as op_bluestein
    from rustfft_tpu.ops.pallas import convlarge, large
    from rustfft_tpu.planner import FftPlannerTpu

    enable_persistent_compilation_cache()
    print("device =", jax.devices()[0].device_kind, flush=True)
    rng = np.random.default_rng(0)

    sizes = [int(a) for a in sys.argv[1:]] or [746497]
    direction = FftDirection.FORWARD
    for n in sizes:
        planner = FftPlannerTpu()
        m = planner._routed_bluestein_inner(n)
        assert m is not None, f"no routed inner for {n}"
        print(f"n={n}  inner m={m}  split={large.choose_pqq(m)}", flush=True)

        # accuracy spot check (fused route, hardware numerics)
        fn_fused = convlarge.make_bluestein_large_fn(
            n, m, direction, np.complex64
        )
        x = (rng.standard_normal((2, n)) + 1j * rng.standard_normal((2, n))).astype(np.complex64)
        try:
            o_r, o_i = fn_fused((x.real.astype(np.float32), x.imag.astype(np.float32)))
            out = np.asarray(o_r) + 1j * np.asarray(o_i)
            ref = np.fft.fft(x.astype(np.complex128), axis=-1)
            rel = np.mean(np.abs(out - ref)) / np.mean(np.abs(ref))
            print(f"  fused rel err = {rel:.3e}", flush=True)
        except Exception as e:  # noqa: BLE001 — keep the glued baseline alive
            print(f"  fused accuracy check FAILED {str(e)[:300]}", flush=True)

        batch = max(4, min(1 << 16, (1 << 26) // n))
        re = jax.device_put((rng.standard_normal((batch, n)) * 1e-30).astype(np.float32))
        im = jax.device_put((rng.standard_normal((batch, n)) * 1e-30).astype(np.float32))
        gf = lambda t: 5.0 * batch * n * math.log2(n) / t / 1e9  # noqa: E731

        inner_fn = large.make_large_fft_fn(m, direction, np.complex64)
        fn_glued = op_bluestein.make_bluestein_fn(
            n, m, inner_fn, direction, np.complex64
        )
        for label, fn in (("fused conv3", fn_fused), ("glued large", fn_glued)):
            try:
                t = time_fn(fn, re, im, iters=8)
            except Exception as e:  # noqa: BLE001
                print(f"  {label:<12} FAILED {str(e)[:300]}", flush=True)
                continue
            print(f"  {label:<12} {t*1e3:9.3f} ms  {gf(t):8.1f} GF/s", flush=True)


if __name__ == "__main__":
    main()
