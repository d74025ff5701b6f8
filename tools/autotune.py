"""Re-derive the planner's measured constants on the current device.

The reference's per-ISA planners encode hundreds of benchmark-derived
decisions (avx_planner.rs:257-617), produced offline by harnesses like
benches/compare_3n2m_strategies.rs.  This is the TPU analogue: it measures
the XLA path against each Pallas routing option per size class on the live
chip and prints the recommended `rustfft_tpu.config` constants.

Run on the target hardware:  PYTHONPATH=.:/root/.axon_site python tools/autotune.py
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def timed(fn, args, iters=8, reps=3):
    import jax

    @jax.jit
    def many(x):
        return jax.lax.fori_loop(0, iters, lambda i, x: fn(x), x)[0].sum()

    float(many(args))
    best = None
    for _ in range(reps):
        t0 = time.perf_counter()
        float(many(args))
        t = (time.perf_counter() - t0) / iters
        best = t if best is None else min(best, t)
    return best


def main():
    import jax

    from rustfft_tpu import FftDirection, FftPlanner, config
    from rustfft_tpu.ops.pallas import fused, large

    rng = np.random.default_rng(0)
    dev = jax.devices()[0]
    print(f"# device: {dev.device_kind}")

    results = {}
    for n in (1024, 2048, 4096, 8192, 16384, 65536, 262144, 1 << 20):
        batch = max(1, (1 << 26) // n)
        re = jax.device_put((rng.standard_normal((batch, n)) * 1e-30).astype(np.float32))
        im = jax.device_put((rng.standard_normal((batch, n)) * 1e-30).astype(np.float32))

        config.use_pallas = "off"
        plan = FftPlanner().plan_fft_forward(n)
        row = {"xla": timed(plan.raw_fn, (re, im))}

        if fused.fused_supported(n, np.complex64):
            for variant in ("transpose_in_kernel", "transpose_outside"):
                try:
                    fn = fused.make_fused_two_stage_fn(
                        n, FftDirection.FORWARD, np.complex64, variant=variant
                    )
                    row[f"fused/{variant}"] = timed(fn, (re, im))
                except Exception:
                    row[f"fused/{variant}"] = None
        elif large.large_supported(n, np.complex64):
            try:
                fn = large.make_large_fft_fn(n, FftDirection.FORWARD, np.complex64)
                row["large"] = timed(fn, (re, im))
            except Exception:
                row["large"] = None

        results[n] = row
        detail = "  ".join(
            f"{k}={v*1e3:.2f}ms" if v else f"{k}=FAIL" for k, v in row.items()
        )
        print(f"n={n:>8}: {detail}")

    # recommendation: smallest n where any pallas option beats xla
    min_n = None
    for n, row in sorted(results.items()):
        pallas_best = min(
            (v for k, v in row.items() if k != "xla" and v), default=None
        )
        if pallas_best is not None and pallas_best < row["xla"]:
            min_n = n
            break
    print(f"\n# recommended config.pallas_min_n = {min_n}")


if __name__ == "__main__":
    main()
