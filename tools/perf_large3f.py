"""Factored-twiddle 3-kernel pipeline (large3f) on hardware.

Primary target: 2^26 — the envelope hole past large2f's VMEM edge (VERDICT
r3 item 6).  XLA six-step is the incumbent there.  Also A/Bs the factored
tables against plain large3 at 2^23/2^24 (same traversals; the factored
form reads Q*P1 + P2*P1 table entries per call instead of M*P1 — at 2^24
that's ~134MB of table traffic saved, ~6% of signal traffic).

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/perf_large3f.py [n ...]
Flip: config.large3f_min_n per the crossovers (2^26 default-on already).
"""
from __future__ import annotations

import math
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from perf_lanepack import time_fn  # noqa: E402

DEFAULT = [1 << 23, 1 << 24, 1 << 25, 1 << 26]


def main():
    import jax

    from rustfft_tpu import FftDirection, FftPlanner
    from rustfft_tpu.config import config, enable_persistent_compilation_cache
    from rustfft_tpu.ops.pallas import large2f, large3

    enable_persistent_compilation_cache()
    print("device =", jax.devices()[0].device_kind, flush=True)
    rng = np.random.default_rng(0)
    d = FftDirection.FORWARD

    sizes = [int(a) for a in sys.argv[1:]] or DEFAULT
    for n in sizes:
        batch = max(1, (1 << 27) // n)
        re = jax.device_put(
            (rng.standard_normal((batch, n)) * 1e-30).astype(np.float32)
        )
        im = jax.device_put(
            (rng.standard_normal((batch, n)) * 1e-30).astype(np.float32)
        )
        gf = lambda t: 5.0 * batch * n * math.log2(n) / t / 1e9  # noqa: E731
        print(f"n={n} batch={batch}", flush=True)

        runs = []
        if large3.large3f_supported(n, np.complex64):
            sp = large3.choose_split3f(n)
            runs.append((f"large3f {sp}", lambda sp=sp: large3.make_large3_fft_fn(
                n, d, np.complex64, split=sp, factored=True)))
            # P1=128/P2=128 alternative at 2^26 (deeper VPU chain, half the
            # pass-1 MXU flops) if it exists
            alt = None
            for p1 in (128,):
                if n % (p1 * 4096) == 0:
                    p2 = n // (p1 * 4096)
                    if 2 <= p2 <= 128 and (p2 & (p2 - 1)) == 0 and p2 != sp[1]:
                        alt = (p1, p2, 64, 64, 4096)
            if alt:
                runs.append((f"large3f {alt}", lambda alt=alt: large3.make_large3_fft_fn(
                    n, d, np.complex64, split=alt, factored=True)))
        if large3.large3_supported(n, np.complex64):
            runs.append(("large3 (plain)", lambda: large3.make_large3_fft_fn(
                n, d, np.complex64)))
        if large2f.large2f_supported(n, np.complex64):
            runs.append(("large2f", lambda: large2f.make_large2f_fft_fn(
                n, d, np.complex64)))
        elif n == (1 << 26):
            # bypass the gate: the 2^25 VMEM-edge measurement was at bf16x3;
            # the cat tier's bf16 intermediates shrink the pass-1 working
            # set — maybe (256, 64) compiles at 2^26 now (4 traversals vs
            # large3f's 6 would win big if it does)
            sp2 = (256, 64, 64, 64, 4096)
            runs.append(("large2f x3s (gate bypass)",
                         lambda sp2=sp2: large2f.make_large2f_fft_fn(
                             n, d, np.complex64, split=sp2,
                             precision="bf16x3s")))
        def make_xla(n=n):
            config.use_pallas = "off"
            try:
                return FftPlanner().plan_fft_forward(n).raw_fn
            finally:
                config.use_pallas = "auto"
        runs.append(("xla six-step", make_xla))

        # accuracy spot check of the factored route (first run only)
        if large3.large3f_supported(n, np.complex64) and n <= (1 << 24):
            try:
                xs = (rng.standard_normal((1, n)) + 1j * rng.standard_normal((1, n))).astype(np.complex64)
                fn = runs[0][1]()
                o_r, o_i = fn((xs.real.astype(np.float32), xs.imag.astype(np.float32)))
                out = np.asarray(o_r) + 1j * np.asarray(o_i)
                ref = np.fft.fft(xs.astype(np.complex128), axis=-1)
                rel = np.mean(np.abs(out - ref)) / np.mean(np.abs(ref))
                print(f"  large3f rel err = {rel:.3e}", flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"  large3f accuracy FAILED {str(e)[:300]}", flush=True)

        for label, make in runs:
            try:
                fn = make()
                t = time_fn(fn, re, im, iters=4)
                print(f"  {label:<28}: {t*1e3:9.3f} ms  {gf(t):7.1f} GF/s", flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"  {label:<28}: FAILED {str(e)[:300]}", flush=True)


if __name__ == "__main__":
    main()
