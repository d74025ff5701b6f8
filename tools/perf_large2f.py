"""Compare the fused 2-kernel pipeline (large2f) vs large3/large2 on TPU.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/perf_large2f.py
         [--sizes 22,23,24] [--splits]
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
    from rustfft_tpu.ops.pallas import large, large2f, large3
    from rustfft_tpu.utils.testing import mean_element_error, oracle_dft

    rng = np.random.default_rng(0)
    logs = [22, 23, 24]
    for a in sys.argv[1:]:
        if a.startswith("--sizes"):
            logs = [int(s) for s in a.split("=", 1)[1].split(",")]

    for lg in logs:
        n = 1 << lg
        batch = max(1, (1 << 27) // n)
        re = jax.device_put(
            (rng.standard_normal((batch, n)) * 1e-30).astype(np.float32)
        )
        im = jax.device_put(
            (rng.standard_normal((batch, n)) * 1e-30).astype(np.float32)
        )
        gf = lambda t: 5.0 * batch * n * math.log2(n) / t / 1e9

        candidates = []
        sp2f = large2f.choose_split2f(n)
        if sp2f is not None:
            candidates.append(("large2f/auto", lambda: large2f.make_large2f_fft_fn(
                n, FftDirection.FORWARD, np.complex64)))
            # alternate P1 if both divide
            p1a, p2a, q1a, q2a, qa = sp2f
            alt_p1 = 256 if p1a == 128 else 128
            if n % (alt_p1 * qa) == 0:
                p2_alt = n // (alt_p1 * qa)
                if 8 <= p2_alt <= 64 and (p2_alt & (p2_alt - 1)) == 0:
                    sp_alt = (alt_p1, p2_alt, q1a, q2a, qa)
                    candidates.append((f"large2f/P1={alt_p1}", lambda sp=sp_alt: (
                        large2f.make_large2f_fft_fn(
                            n, FftDirection.FORWARD, np.complex64, split=sp))))
        if large3.large3_supported(n, np.complex64):
            candidates.append(("large3/auto", lambda: large3.make_large3_fft_fn(
                n, FftDirection.FORWARD, np.complex64)))
        if large.large_supported(n, np.complex64):
            candidates.append(("large2/auto", lambda: large.make_large_fft_fn(
                n, FftDirection.FORWARD, np.complex64)))

        for name, mk in candidates:
            try:
                fn = mk()
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
                    f"n=2^{lg} b={batch:>3} {name:16}: {t*1e3:8.3f} ms "
                    f"{gf(t):8.1f} GF/s | err {err:.2e}",
                    flush=True,
                )
            except Exception as e:
                msg = " ".join(str(e).split("\n"))[:240]
                print(f"n=2^{lg} {name:16}: FAIL {msg}", flush=True)


if __name__ == "__main__":
    main()
