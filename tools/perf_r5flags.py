"""Same-run A/B of the round-5 staged Rader-core flags at 65537.

Two opt-in switches were staged at the end of the round-5 builder run and
never hardware-measured:

  conv_radix_gauss  Gauss 3-dot stage GEMMs in the radix conv core (the
                    same 25%-less-MXU-work switch that won +2-17% in the
                    standalone two_stage/radix kernels, commit 1543b83).
  rader_in_shift    pass 1 reads the RAW (batch, p) signal and lane-rolls
                    in-VMEM, replacing the XLA x[1:] slice traversal and
                    keeping both passes' chain arrays (batch, p) so the
                    flat views alias.

This measures the full planner route end-to-end for the four flag
combinations in one run (the chip is time-shared; only same-run numbers
compare).  Each combination gets a fresh FftPlanner — the executor memo
keys on both fields (executor.py) so no stale binary can leak across rows.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/perf_r5flags.py [p ...]
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

    from rustfft_tpu import FftPlanner
    from rustfft_tpu.config import config, enable_persistent_compilation_cache

    enable_persistent_compilation_cache()
    print("device =", jax.devices()[0].device_kind, flush=True)
    rng = np.random.default_rng(0)

    primes = [int(a) for a in sys.argv[1:]] or [65537]
    for p in primes:
        batch = max(8, min(4096, (1 << 25) // p))
        re = jax.device_put(
            (rng.standard_normal((batch, p)) * 1e-30).astype(np.float32)
        )
        im = jax.device_put(
            (rng.standard_normal((batch, p)) * 1e-30).astype(np.float32)
        )
        gf = lambda t: 5.0 * batch * p * math.log2(p) / t / 1e9  # noqa: E731
        print(f"p={p} batch={batch}", flush=True)

        combos = [
            ("baseline        ", False, False),
            ("gauss           ", True, False),
            ("in_shift        ", False, True),
            ("gauss + in_shift", True, True),
        ]
        for label, g, s in combos:
            config.conv_radix_gauss = g
            config.rader_in_shift = s
            try:
                plan = FftPlanner().plan_fft_forward(p)
                t = time_fn(plan.raw_fn, re, im)
                print(f"  {label}: {t*1e3:8.3f} ms  {gf(t):7.1f} GF/s",
                      flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"  {label}: FAILED {str(e)[:300]}", flush=True)
            finally:
                config.conv_radix_gauss = False
                config.rader_in_shift = False


if __name__ == "__main__":
    main()
