"""VERDICT r4 item 4: Bluestein onto the radix conv tier for the
lane-misaligned 8k-60k band (19683 = 3^9, 59049 = 3^10, 15625 = 5^6).

These composites currently route to XLA (largepad loses below 65536, q<8
splits fail Mosaic — the README won't-fix hole).  The structured attempt:
a whole-n fused Bluestein whose inner m = r*16384 rides the radix conv
core (conv_radix, 4 flat traversals of m) — the same trick that won at
746497.  Pad ratios m/n: 15625 -> 32768 (2.10), 19683 -> 65536 (3.33),
59049 -> 131072 (2.22).

Rows per n (same run, differential timer):
  xla      the shipped planner route (XLA six-step / factored)
  bconv    fused Bluestein on the conv tier at the smallest m = r*16384
           (conv_radix_min_m temporarily lowered to admit m = 32768)
  bconv2   next m up (pad-ratio sensitivity), where in envelope

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/perf_blue_misaligned.py [n ...]
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

    from rustfft_tpu import FftDirection, FftPlanner
    from rustfft_tpu.config import config, enable_persistent_compilation_cache
    from rustfft_tpu.ops.pallas import conv

    enable_persistent_compilation_cache()
    print("device =", jax.devices()[0].device_kind, flush=True)
    rng = np.random.default_rng(0)
    d = FftDirection.FORWARD

    sizes = [int(a) for a in sys.argv[1:]] or [15625, 19683, 59049]
    for n in sizes:
        batch = max(8, min(4096, (1 << 25) // n))
        re = jax.device_put(
            (rng.standard_normal((batch, n)) * 1e-30).astype(np.float32)
        )
        im = jax.device_put(
            (rng.standard_normal((batch, n)) * 1e-30).astype(np.float32)
        )
        gf = lambda t: 5.0 * batch * n * math.log2(n) / t / 1e9  # noqa: E731
        print(f"n={n} batch={batch}", flush=True)

        # true XLA baseline: disable the round-5 hole-band routing so the
        # planner takes the factored (XLA six-step) route
        old_mis = config.bconv_misaligned
        try:
            config.bconv_misaligned = False
            plan = FftPlanner().plan_fft_forward(n)
            t = time_fn(plan.raw_fn, re, im)
            print(f"  xla route     : {t*1e3:8.3f} ms  {gf(t):7.1f} GF/s",
                  flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"  xla route     : FAILED {str(e)[:200]}", flush=True)
        finally:
            config.bconv_misaligned = old_mis

        min_inner = 2 * n - 1
        # candidates: the planner's smallest aligned 2^a*3^b inner (dense
        # conv core) + the smallest radix-structured r*16384 inner (radix
        # conv core) — A/B both cores where the size admits both
        from rustfft_tpu.planner import FftPlannerTpu

        planner_m = FftPlannerTpu(np.complex64)._aligned_conv_inner(n)
        radix_ms = [r * 16384 for r in (2, 4, 8, 16) if r * 16384 >= min_inner]
        rows = []
        if planner_m is not None:
            rows.append((planner_m, "dense"))
        for m in radix_ms[:1]:
            if (m, "dense") not in rows:
                rows.append((m, "dense"))
            rows.append((m, "radix"))
        old_min = config.conv_radix_min_m
        for m, core in rows:
            try:
                config.conv_radix_min_m = min(old_min, m) if core == "radix" \
                    else max(old_min, m + 1)
                fn = conv.make_bluestein_fn(n, m, d, np.complex64)
                t = time_fn(fn, re, im)
                print(f"  bconv m={m:6d} {core:5s}: {t*1e3:8.3f} ms"
                      f"  {gf(t):7.1f} GF/s  (pad {m/n:.2f}x)", flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"  bconv m={m:6d} {core:5s}: FAILED {str(e)[:200]}",
                      flush=True)
            finally:
                config.conv_radix_min_m = old_min


if __name__ == "__main__":
    main()
