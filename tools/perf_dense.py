"""Dense whole-DFT matmul tier (ops/pallas/dense.py) vs incumbent routes.

Sweeps the small-n band (sub-512: XLA chains today), the lanepack band
boundary (512/1024), and the small-prime band (1009/1234: Bluestein conv
kernel today).  For each n, same-run:
  * dense gauss / dense block (batch-tile sweep)
  * the incumbent: whatever plan.process routes to with dense disabled

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/perf_dense.py [n ...]
"""
from __future__ import annotations

import math
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from perf_lanepack import time_fn  # noqa: E402

DEFAULT_SIZES = [32, 64, 128, 256, 500, 512, 729, 1009, 1024, 1234, 1536, 2003]


def main():
    import jax

    from rustfft_tpu import FftDirection, FftPlanner
    from rustfft_tpu.config import config, enable_persistent_compilation_cache
    from rustfft_tpu.ops.pallas import dense

    enable_persistent_compilation_cache()
    print("device =", jax.devices()[0].device_kind, flush=True)
    rng = np.random.default_rng(0)
    direction = FftDirection.FORWARD

    sizes = [int(a) for a in sys.argv[1:]] or DEFAULT_SIZES
    for n in sizes:
        batch = max(8, min(1 << 17, (1 << 26) // n))
        re = jax.device_put(
            (rng.standard_normal((batch, n)) * 1e-30).astype(np.float32)
        )
        im = jax.device_put(
            (rng.standard_normal((batch, n)) * 1e-30).astype(np.float32)
        )
        gf = lambda t: 5.0 * batch * n * math.log2(n) / t / 1e9  # noqa: E731
        print(f"n={n} batch={batch}", flush=True)

        # accuracy spot check on hardware (gauss, default precision)
        xs = (rng.standard_normal((2, n)) + 1j * rng.standard_normal((2, n))).astype(np.complex64)
        try:
            fn = dense.make_dense_fft_fn(n, direction, np.complex64)
            o_r, o_i = fn((xs.real.astype(np.float32), xs.imag.astype(np.float32)))
            out = np.asarray(o_r) + 1j * np.asarray(o_i)
            ref = np.fft.fft(xs.astype(np.complex128), axis=-1)
            rel = np.mean(np.abs(out - ref)) / np.mean(np.abs(ref))
            print(f"  gauss rel err = {rel:.3e}", flush=True)
        except Exception as e:  # noqa: BLE001 — keep the variant sweep alive
            print(f"  gauss accuracy check FAILED {str(e)[:300]}", flush=True)

        runs = [("gauss", 64, None, None, False),
                ("gauss", 128, None, None, False),
                ("block", 64, None, None, False),
                ("block", 128, None, None, False),
                ("gauss", 128, None, "bf16x2", False),
                # cat tiers: with one concatenated dot per tile, block
                # (K=6np, 1 instr) beats gauss (3 instrs, 9 np-units) on
                # paper — measure both
                ("block", 128, None, "bf16x3s", False),
                ("gauss", 128, None, "bf16x3s", False),
                ("block", 128, None, "bf16x2s", False)]
        if n <= 256:  # wider packed rows: 2 vregs of lanes
            runs.append(("gauss", 128, 2 * dense._pack_group(n), None, False))
        if (max(1, 128 // n) * n) % 128:  # misaligned rows: aligned fallback
            runs.append(("gauss", 128, None, None, True))
            runs.append(("block", 128, None, None, True))
        for variant, bt, pack, prec, aligned in runs:
            label = f"dense {variant:<5} bt={bt:<3}" + (
                f" g={pack}" if pack else ""
            ) + (f" {prec}" if prec else "") + (" aligned" if aligned else "")
            try:
                fn = dense.make_dense_fft_fn(
                    n, direction, np.complex64,
                    variant=variant, batch_tile=bt, pack=pack, precision=prec,
                    aligned=aligned,
                )
                t = time_fn(fn, re, im, iters=8)
            except Exception as e:  # noqa: BLE001
                print(f"  {label} FAILED {str(e)[:200]}", flush=True)
                continue
            print(f"  {label} {t*1e3:9.3f} ms {gf(t):8.1f} GF/s", flush=True)

        # incumbent route (dense knobs default off)
        plan = FftPlanner().plan_fft_forward(n)
        try:
            t = time_fn(plan.raw_fn, re, im, iters=8)
            print(f"  incumbent          {t*1e3:9.3f} ms {gf(t):8.1f} GF/s",
                  flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"  incumbent FAILED {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
