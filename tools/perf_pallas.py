"""Sweep fused-kernel variants vs the XLA path on the live TPU.

Usage: python tools/perf_pallas.py [n ...]
"""
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

    @jax.jit
    def nothing(x):
        return x[0][0, 0] + x[1][0, 0]

    float(many(args))
    float(nothing(args))
    t0 = time.perf_counter()
    float(nothing(args))
    t_over = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(many(args))
    t_total = time.perf_counter() - t0
    return max((t_total - t_over) / iters, 1e-9)


def main():
    import jax
    import jax.numpy as jnp

    from rustfft_tpu import FftDirection, FftPlanner, config
    from rustfft_tpu.ops.pallas import fused
    from rustfft_tpu.utils.testing import mean_element_error, oracle_dft

    sizes = [int(a) for a in sys.argv[1:]] or [1024, 4096, 16384, 65536]
    print(f"device={jax.devices()[0]}", file=sys.stderr)
    P = jax.lax.Precision

    # pure-stream ceiling: elementwise scale at the largest shape
    n0, b0 = 65536, 1024
    rng = np.random.default_rng(0)
    re0 = jax.device_put(rng.standard_normal((b0, n0)).astype(np.float32))
    im0 = jax.device_put(rng.standard_normal((b0, n0)).astype(np.float32))
    t = timed(lambda x: (x[0] * np.float32(1.001), x[1] * np.float32(1.001)), (re0, im0))
    print(f"stream ceiling (x*c): {t*1e3:8.3f} ms  {2*8*b0*n0/t/1e9:6.1f} GB/s")

    for n in sizes:
        batch = max(1, (1 << 26) // n)
        re = jax.device_put((rng.standard_normal((batch, n)) * 1e-30).astype(np.float32))
        im = jax.device_put((rng.standard_normal((batch, n)) * 1e-30).astype(np.float32))
        gf = lambda t: 5.0 * batch * n * math.log2(n) / t / 1e9
        gbs = lambda t: 2 * 8 * batch * n / t / 1e9  # read+write c64 bytes

        config.use_pallas = "off"
        plan = FftPlanner().plan_fft_forward(n)
        t = timed(plan.raw_fn, (re, im))
        print(f"n={n:>7} b={batch:>6} xla                     : {t*1e3:8.3f} ms {gf(t):8.1f} GF/s {gbs(t):6.1f} GB/s")

        if not fused.fused_supported(n, np.complex64):
            print(f"n={n:>7}: fused unsupported")
            continue
        sig = (
            rng.standard_normal((2, n)) + 1j * rng.standard_normal((2, n))
        ).astype(np.complex64)
        exp = oracle_dft(sig, FftDirection.FORWARD)
        combos = [
            ("transpose_in_kernel", "bf16x3", None),
            ("transpose_outside", "bf16x3", None),
            ("twodot", "bf16x3", None),
        ]
        for variant, prec, tb in combos:
            pname = prec if isinstance(prec, str) else ("f32x6" if prec == P.HIGHEST else "bf16")
            tag = f"{variant[10:]:11}/{pname:6}/tb={tb or 'auto'}"
            try:
                ffn = fused.make_fused_two_stage_fn(
                    n, FftDirection.FORWARD, np.complex64,
                    precision=prec, variant=variant, batch_tile=tb,
                )
                t = timed(ffn, (re, im))
                o_r, o_i = ffn((sig.real, sig.imag))
                err = mean_element_error(
                    np.asarray(o_r) + 1j * np.asarray(o_i), exp
                )
            except Exception as e:
                msg = " ".join(str(e).split("\n"))[:160]
                print(f"n={n:>7} {tag}: FAIL {msg}")
                continue
            print(
                f"n={n:>7} {tag}: {t*1e3:8.3f} ms "
                f"{gf(t):8.1f} GF/s {gbs(t):6.1f} GB/s | err {err:.2e}"
            )


if __name__ == "__main__":
    main()
