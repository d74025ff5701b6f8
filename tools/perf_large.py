"""Time the two-kernel large-N pipeline on TPU; diagnose small-n failures."""
from __future__ import annotations

import math
import sys
import time

import numpy as np


def timed(fn, args, iters=8):
    import jax

    @jax.jit
    def many(x):
        # chain without any per-iteration scaling (a scale would add a full
        # elementwise HBM pass); callers pass tiny inputs so the unnormalized
        # growth (~n^(iters/2)) stays finite in f32.
        def body(i, x):
            return fn(x)

        x = jax.lax.fori_loop(0, iters, body, x)
        return x[0].sum() + x[1].sum()

    float(many(args))
    t0 = time.perf_counter()
    float(many(args))
    return max((time.perf_counter() - t0) / iters, 1e-9)


def main():
    import jax

    from rustfft_tpu import FftDirection
    from rustfft_tpu.ops.pallas import fused, large
    from rustfft_tpu.utils.testing import mean_element_error, oracle_dft

    rng = np.random.default_rng(0)

    # 1. n=1024 fused failure: full error
    if "--diag1024" in sys.argv:
        try:
            ffn = fused.make_fused_two_stage_fn(
                1024, FftDirection.FORWARD, np.complex64, batch_tile=128
            )
            re = rng.standard_normal((256, 1024)).astype(np.float32)
            out = ffn((re, re))
            jax.block_until_ready(out)
            print("1024 tb=128 OK")
        except Exception as e:
            print("1024 FAIL:", str(e)[:2000])
        return

    for n in [262144, 1 << 20]:
        batch = max(1, (1 << 26) // n)
        re = jax.device_put((rng.standard_normal((batch, n)) * 1e-30).astype(np.float32))
        im = jax.device_put((rng.standard_normal((batch, n)) * 1e-30).astype(np.float32))
        gf = lambda t: 5.0 * batch * n * math.log2(n) / t / 1e9
        gbs = lambda t: 2 * 8 * batch * n / t / 1e9
        for variant in ("swap",):
            try:
                fn = large.make_large_fft_fn(
                    n, FftDirection.FORWARD, np.complex64, variant=variant
                )
                t = timed(fn, (re, im))
                sig = (
                    rng.standard_normal((1, n)) + 1j * rng.standard_normal((1, n))
                ).astype(np.complex64)
                o_r, o_i = fn((sig.real, sig.imag))
                err = mean_element_error(
                    np.asarray(o_r) + 1j * np.asarray(o_i),
                    oracle_dft(sig, FftDirection.FORWARD),
                )
                print(
                    f"n={n:>8} b={batch:>4} large/{variant:4}: {t*1e3:8.3f} ms "
                    f"{gf(t):8.1f} GF/s {gbs(t):6.1f} GB/s | err {err:.2e}"
                )
            except Exception as e:
                msg = " ".join(str(e).split("\n"))[:300]
                print(f"n={n:>8} large/{variant:4}: FAIL {msg}")


if __name__ == "__main__":
    main()
